"""protobuf_compat: the gated google.protobuf shim for the TWS state API.

The shim is what lets ``transformWithStateInPandas`` run on interpreters
without a protobuf install (its state workers import pyspark's generated
StateMessage_pb2). These tests pin the three behaviors that matter:
resolution order (real install > shim > False), shim isolation (ONLY the
protobuf subtree is exposed, never the vendored tree's siblings), and the
end state actually loading pyspark's generated module.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

from espkinesis_spark import protobuf_compat


def test_ensure_is_idempotent_and_resolves_here():
    # In any environment this runs, the call must not raise; in THIS one a
    # runtime exists (real install or the vendored gcloud copy), so True.
    assert protobuf_compat.ensure_protobuf_runtime() is True
    # second call short-circuits (find_spec now succeeds or _shim_dir set)
    assert protobuf_compat.ensure_protobuf_runtime() is True
    assert importlib.util.find_spec("google.protobuf") is not None


def test_returns_false_when_no_vendored_copy(monkeypatch, tmp_path):
    monkeypatch.setattr(protobuf_compat, "_shim_dir", None)
    monkeypatch.setattr(protobuf_compat, "_failed", False)
    monkeypatch.setattr(protobuf_compat, "_VENDOR_ROOTS", ())
    monkeypatch.setenv("ESPK_PROTOBUF_PATH", str(tmp_path / "nowhere"))
    monkeypatch.setattr(
        protobuf_compat.importlib.util, "find_spec", lambda name: None
    )
    assert protobuf_compat.ensure_protobuf_runtime() is False
    # the failure is cached — no second scan, still False
    assert protobuf_compat._failed is True
    assert protobuf_compat.ensure_protobuf_runtime() is False


def test_failed_verification_rolls_back_path_edits(monkeypatch, tmp_path):
    # vendored root exists, but the post-install find_spec probe fails:
    # the dead shim must NOT linger on sys.path/PYTHONPATH, and the
    # failure must be cached (no shim-dir accumulation on retries)
    root = tmp_path / "vendor"
    (root / "google" / "protobuf").mkdir(parents=True)
    (root / "google" / "protobuf" / "__init__.py").write_text("")
    monkeypatch.setattr(protobuf_compat, "_shim_dir", None)
    monkeypatch.setattr(protobuf_compat, "_failed", False)
    monkeypatch.setattr(protobuf_compat, "_VENDOR_ROOTS", ())
    monkeypatch.setenv("ESPK_PROTOBUF_PATH", str(root))
    monkeypatch.setattr(
        protobuf_compat.importlib.util, "find_spec", lambda name: None
    )
    prior_path = list(sys.path)
    prior_env = os.environ.get("PYTHONPATH")
    assert protobuf_compat.ensure_protobuf_runtime() is False
    assert sys.path == prior_path
    assert os.environ.get("PYTHONPATH") == prior_env
    assert protobuf_compat._failed is True


def test_shim_is_namespace_portion_not_plain_package(monkeypatch, tmp_path):
    # a plain google/__init__.py in the shim would stop PEP-420 namespace
    # merging and break every other installed google.* distribution; the
    # shim must coexist with a sibling namespace portion (like google-auth)
    import subprocess

    root = tmp_path / "vendor"
    (root / "google" / "protobuf").mkdir(parents=True)
    (root / "google" / "protobuf" / "__init__.py").write_text("MARK = 7\n")
    site = tmp_path / "site"
    (site / "google" / "auth").mkdir(parents=True)
    (site / "google" / "auth" / "__init__.py").write_text("WHO = 'auth'\n")
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(site)!r})\n"
        "import importlib.util\n"
        "from espkinesis_spark import protobuf_compat as pc\n"
        "real = importlib.util.find_spec\n"
        "calls = [0]\n"
        "def fake(name):\n"
        "    calls[0] += 1\n"
        "    return None if calls[0] == 1 else real(name)\n"
        "pc.importlib.util.find_spec = fake\n"
        "assert pc.ensure_protobuf_runtime() is True\n"
        "import google.protobuf, google.auth\n"
        "assert google.protobuf.MARK == 7 and google.auth.WHO == 'auth'\n"
        "import os\n"
        "assert not os.path.exists(os.path.join(pc._shim_dir, 'google', '__init__.py'))\n"
        "print('NAMESPACE OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        env={
            **{k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
            "PYTHONPATH": "/root/repo",
            "ESPK_PROTOBUF_PATH": str(root),
        },
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "NAMESPACE OK" in proc.stdout


def test_shim_built_from_override_root(monkeypatch, tmp_path):
    # fake vendored root: <root>/google/protobuf/__init__.py plus a sibling
    # package that must NOT become importable through the shim
    root = tmp_path / "vendor"
    (root / "google" / "protobuf").mkdir(parents=True)
    (root / "google" / "protobuf" / "__init__.py").write_text("MARK = 42\n")
    (root / "google" / "sibling").mkdir()
    (root / "google" / "sibling" / "__init__.py").write_text("")

    monkeypatch.setattr(protobuf_compat, "_shim_dir", None)
    monkeypatch.setattr(protobuf_compat, "_failed", False)
    monkeypatch.setattr(protobuf_compat, "_VENDOR_ROOTS", ())
    monkeypatch.setenv("ESPK_PROTOBUF_PATH", str(root))

    calls = {"n": 0}
    real_find_spec = importlib.util.find_spec

    def fake_find_spec(name):
        # pretend protobuf is absent on the FIRST probe only, so the
        # function builds the shim, then verify through the real resolver
        calls["n"] += 1
        if calls["n"] == 1:
            return None
        return real_find_spec(name)

    monkeypatch.setattr(
        protobuf_compat.importlib.util, "find_spec", fake_find_spec
    )
    prior_path = list(sys.path)
    prior_env = os.environ.get("PYTHONPATH")
    try:
        assert protobuf_compat.ensure_protobuf_runtime() is True
        shim = protobuf_compat._shim_dir
        assert shim is not None and sys.path[0] == shim
        assert os.environ["PYTHONPATH"].split(os.pathsep)[0] == shim
        # isolation: protobuf resolves inside the shim, the sibling doesn't
        assert os.path.isfile(os.path.join(shim, "google", "protobuf", "__init__.py"))
        assert not os.path.exists(os.path.join(shim, "google", "sibling"))
    finally:
        monkeypatch.setattr(protobuf_compat, "_shim_dir", None)
        sys.path[:] = prior_path
        if prior_env is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prior_env


def test_state_message_pb2_loads_in_clean_interpreter():
    # end-to-end in a fresh interpreter: the shim (or a real install) must
    # make pyspark's generated state protocol importable and usable — the
    # exact import the TWS driver worker performs at PRE_INIT
    code = (
        "from espkinesis_spark.protobuf_compat import ensure_protobuf_runtime\n"
        "assert ensure_protobuf_runtime() is True\n"
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as sm\n"
        "req = sm.StateRequest()\n"
        "assert req.SerializeToString() == b''\n"
        "print('PB2 OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PB2 OK" in proc.stdout
