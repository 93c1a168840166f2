"""Make ``google.protobuf`` importable for transformWithStateInPandas.

Spark 4's ``transformWithStateInPandas`` state API talks to the JVM over a
protobuf protocol: every state-API worker imports
``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the
``google.protobuf`` runtime. Interpreters without a protobuf install crash
the "TransformWithStateInPySpark driver worker" at PRE_INIT with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'`` —
an error Spark surfaces only as "driver worker exited unexpectedly
(crashed)", which is easy to misread as an environment/socket block (this
repo did exactly that until r16).

Some hosts without a pip-installed protobuf still carry a vendored
pure-python copy inside the (public, BSD-licensed) Google Cloud SDK's App
Engine platform tree. When ``google.protobuf`` is missing and such a copy
exists, this module exposes ONLY the ``google/protobuf`` subtree through an
isolated shim directory on ``sys.path`` + ``PYTHONPATH`` (never the whole
vendored tree — it also carries ``google.appengine``/``google.auth``
packages that must not shadow real installs). The shim's ``google`` dir is
a PEP-420 namespace PORTION (no ``__init__.py``): a plain package there
would stop namespace merging and break every other installed ``google.*``
distribution (google-auth, google-cloud-*) for the whole process tree.

Version skew: pyspark's generated ``StateMessage_pb2`` pins a gencode
version (6.33.0 for Spark 4.1) and the vendored runtime may trail by a
minor (6.32.0 here). Protobuf's cross-version guarantee rejects
runtime < gencode by default; the project's own escape hatch
(``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``, see
google/protobuf/runtime_version.py) is set alongside the shim — the
StateMessage schema uses no 6.33-only features (probed: import, construct,
serialize round-trip all pass on 6.32).

Everything is gated: a real protobuf install short-circuits to a no-op,
and absence of any vendored copy returns False (callers fall back to
``applyInPandasWithState``; the TWS test self-skips).

MUST run before the JVM launches (the state-API workers are separate
python processes that inherit the JVM's environment, which inherits ours),
so ``session.get_spark`` calls it before building the session.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import tempfile

# Candidate roots whose <root>/google/protobuf is a pure-python protobuf
# runtime. ESPK_PROTOBUF_PATH overrides (points at the same <root> shape).
_VENDOR_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/lib64/google-cloud-sdk/platform/google_appengine",
)

_shim_dir: str | None = None
_failed = False  # a failed attempt is permanent for this process


def ensure_protobuf_runtime() -> bool:
    """Return True when ``google.protobuf`` is importable (possibly via the
    shim this call just installed); False when no runtime can be found.
    Idempotent (a failed attempt is cached, never retried with another
    shim dir); a failed attempt rolls its path edits back. Never raises."""
    global _shim_dir, _failed
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except Exception:
        pass
    if _shim_dir is not None:
        return True
    if _failed:
        return False

    roots = []
    override = os.environ.get("ESPK_PROTOBUF_PATH")
    if override:
        roots.append(override)
    roots.extend(_VENDOR_ROOTS)
    src = next(
        (
            os.path.join(r, "google", "protobuf")
            for r in roots
            if os.path.isfile(os.path.join(r, "google", "protobuf", "__init__.py"))
        ),
        None,
    )
    if src is None:
        _failed = True
        return False

    try:
        shim = tempfile.mkdtemp(prefix="espk_protobuf_shim_")
        pkg = os.path.join(shim, "google")
        os.mkdir(pkg)
        # namespace PORTION (no __init__.py) holding only the symlink
        os.symlink(src, os.path.join(pkg, "protobuf"))
    except OSError:
        _failed = True
        return False

    sys.path.insert(0, shim)
    prior = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = shim + ((os.pathsep + prior) if prior else "")
    # protobuf's official escape hatch for gencode>runtime minor skew
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")

    ok = False
    try:
        ok = importlib.util.find_spec("google.protobuf") is not None
    except Exception:
        ok = False
    if not ok:
        # roll back: a dead shim must not linger at sys.path[0] / PYTHONPATH
        try:
            sys.path.remove(shim)
        except ValueError:
            pass
        if prior is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prior
        _failed = True
        return False
    _shim_dir = shim
    return True
