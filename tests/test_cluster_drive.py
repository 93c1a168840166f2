"""A registry subset on a REAL multi-process standalone cluster.

local[*] cannot catch cluster-only failure classes — closures that won't
serialize, task code reading driver-process state, pandas-UDF modules
missing from the executor PYTHONPATH, plans that only work because
shuffle bytes never cross a process boundary. tools/cluster_drive.py
spins up a loopback master + worker sized for TWO executor JVMs and
value-matches entries against DuckDB; this test drives a subset chosen
to cover one entry per execution class the engine uses:

  dq21                flagship multi-table agg/join (pure codegen)
  dq22                deep multi-join with broadcast dims
  ex_neardup_minhash  pandas-UDF shingle/minhash + banded self-join
  ex_ann_topk         vectorized similarity kernel + top-k
  ex_sketch_quantile  two-scan sketch (driver-collected summary)
  ex_asof_features    cogrouped applyInPandas as-of kernel
  st_window_counts    streaming windowed agg (executor state store)
  st_override_asof    applyInPandasWithState stateful processor

The drive itself asserts >=2 distinct executor JVMs served tasks, so a
silently-degraded single-executor run fails rather than vacuously
passing. Runs in a subprocess: the suite's local[4] session and the
cluster session cannot share one driver process. Self-skips only when
the standalone daemons cannot start in this environment.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.conftest import SF_DIR

_SUBSET = ",".join(
    [
        "dq21",
        "dq22",
        "ex_neardup_minhash",
        "ex_ann_topk",
        "ex_sketch_quantile",
        "ex_asof_features",
        "st_window_counts",
        "st_override_asof",
    ]
)


def test_registry_subset_on_multiexecutor_cluster():
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    if not os.path.isfile(os.path.join(spark_home, "bin", "spark-class")):
        pytest.skip(f"no standalone launcher at {spark_home}/bin/spark-class")
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/cluster_drive.py", SF_DIR, _SUBSET],
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    out = proc.stdout + proc.stderr
    if proc.returncode != 0 and (
        ("timed out" in out and "waiting for" in out)  # daemon never came up
        or "FileNotFoundError" in out  # launcher vanished under us
    ):
        pytest.skip(f"standalone daemons cannot start here: {out[-300:]}")
    assert proc.returncode == 0, out[-3000:]
    assert "8/8 green on 2-executor standalone cluster" in out, out[-2000:]
