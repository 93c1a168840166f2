"""Canonical (sequential) largest-triangle-three-buckets downsampling.

``ex_downsample`` implements the fixed-anchor LTTB variant, whose bucket
selections are independent so the argmax distributes as a single
bucket-keyed aggregation. CANONICAL LTTB (Steinarsson 2013) chains the
selections — each bucket's left anchor is the PREVIOUS bucket's selected
point — so one series cannot be parallelized across buckets. The
scale-correct Spark shape is therefore per-SERIES parallelism: a fleet
downsamples millions of independent series, each series' chain runs
sequentially inside one ``applyInPandas`` group (the production shape —
a single series that doesn't fit one task is the rare case, and the
fixed-anchor variant covers it).

Engine-exact float discipline (stronger than the 6-dp rounding the
fixed-anchor entry uses): every geometric input is derived from exact
integers —

- x is per-series-relative integer microseconds (min subtraction is
  exact); point coordinates are ``x_rel / 1e6`` — one IEEE division,
  bit-identical in numpy and SQL;
- y is canonicalized to integer millis via the sign-aware half-away
  formula ``floor(y*1000 + 0.5)`` (written out identically in BOTH
  engines — never a bare ``round()``, whose half-even/half-away
  semantics differ across engines);
- bucket anchor means are ``CAST(sum(int) AS DOUBLE)/count/scale`` —
  the sums are exact integers in both engines, so the means are
  bit-identical REGARDLESS of aggregation order (a plain float ``avg``
  is order-dependent in its last ulp, which a 6-dp round cannot always
  absorb at epoch-second magnitudes);
- the triangle-area expression is written with the same operation order
  in the kernel and the oracle, so the doubles compared by the argmax
  are bit-identical and ties break on exact integers ``(x, id)``.

The DuckDB oracle replays the chain step-by-step (the unrolled-
trajectory pattern used for kmeans/pagerank/BPE); see
``oracles.lttb_seq_sql``. Oracle precondition: every series has
``n > buckets`` points (true for every test corpus; the kernel itself
handles short series by emitting them whole).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from espkinesis_spark.functions import common as C


def _lttb_kernel(buckets: int):
    import numpy as np
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["x_us", "event_id"], kind="mergesort")
        s = pdf["s"].iloc[0]
        x_abs = pdf["x_us"].to_numpy("int64")
        ids = pdf["event_id"].to_numpy("int64")
        yv = pdf["y"].to_numpy("float64")
        n = len(pdf)
        x_rel = x_abs - x_abs[0]
        # sign-aware half-away millis — the exact expression the oracle uses
        y_mil = np.where(
            yv >= 0, np.floor(yv * 1000.0 + 0.5), -np.floor(-yv * 1000.0 + 0.5)
        ).astype("int64")
        px = x_rel / 1e6
        py = y_mil / 1e3
        out = {"s": [], "step": [], "event_id": [], "x_us": [], "y": []}

        def emit(step: int, i: int) -> None:
            out["s"].append(s)
            out["step"].append(step)
            out["event_id"].append(int(ids[i]))
            out["x_us"].append(int(x_abs[i]))
            out["y"].append(float(py[i]))

        if n <= buckets:  # short series: emit whole (oracle never hits this)
            for i in range(n):
                emit(i, i)
            return pd.DataFrame(out)

        ib = buckets - 2
        m = n - 2
        b = (np.arange(m) * ib) // m  # interior ranks 0..m-1 -> buckets
        # exact integer bucket sums -> order-independent double anchors
        mx = np.empty(ib)
        my = np.empty(ib)
        cnt = np.empty(ib, dtype="int64")
        for k in range(ib):
            mask = b == k
            cnt[k] = int(mask.sum())
            mx[k] = float(int(x_rel[1:-1][mask].sum())) / cnt[k] / 1e6
            my[k] = float(int(y_mil[1:-1][mask].sum())) / cnt[k] / 1e3

        emit(0, 0)
        ax, ay = px[0], py[0]
        for k in range(ib):
            idx = np.nonzero(b == k)[0] + 1  # absolute indices
            if k < ib - 1:
                nx, ny = mx[k + 1], my[k + 1]
            else:
                nx, ny = px[n - 1], py[n - 1]
            pxc, pyc = px[idx], py[idx]
            area = np.abs((ax - nx) * (pyc - ay) - (ax - pxc) * (ny - ay)) * 0.5
            w = int(idx[int(np.argmax(area))])  # first max = (x, id) tiebreak
            emit(k + 1, w)
            ax, ay = px[w], py[w]
        emit(ib + 1, n - 1)
        return pd.DataFrame(out)

    return kernel


def lttb_sequential(
    df: DataFrame,
    series_col: str,
    ts_col: str = "ts",
    y_col: str = "value",
    id_col: str = "event_id",
    buckets: int = C.LTTB_SEQ_BUCKETS,
) -> DataFrame:
    """Canonical chained-anchor LTTB, one chain per ``series_col`` group
    (string series key). Output: ``series, step, event_id, x_us, y`` —
    ``step`` 0 and ``buckets-1`` pin the series endpoints. Deterministic
    and engine-exact (module docstring); plan: one series-keyed exchange
    into Arrow-batched groups, nothing else."""
    pts = df.select(
        F.col(series_col).cast("string").alias("s"),
        F.col(id_col).cast("long").alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("x_us"),
        F.col(y_col).cast("double").alias("y"),
    )
    out = pts.groupBy("s").applyInPandas(
        _lttb_kernel(buckets),
        "s string, step int, event_id long, x_us long, y double",
    )
    return out.select(
        F.col("s").alias("series"), "step", "event_id", "x_us", "y"
    )
