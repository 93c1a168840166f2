"""Deterministic sampling for training-data pipelines.

Random sampling is a correctness hazard in a data pipeline: re-runs must
select the SAME rows (reproducible experiments, resumable jobs, stable
oracle comparisons). Everything here derives the keep/route decision from
md5 of a stable key — a pure projection, zero shuffle, identical in the
DuckDB oracle, and exactly as cheap at 100 TB as at 100 MB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100, on_null: str = "error") -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form.

    First 15 hex digits -> 60-bit int (fits a BIGINT exactly, same as the
    MinHash hashing) -> mod. DuckDB mirror:
    ``CAST(concat('0x', substring(md5(k), 1, 15)) AS BIGINT) % buckets``.

    A null key hashes to null, which would silently drop the row from
    every downstream split/sample filter. ``on_null='error'`` (default)
    fails the job on the first null key instead (executor-side, zero extra
    pass); ``on_null='null'`` keeps the propagating-null behavior for
    callers that filter nulls deliberately.
    """
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        % buckets
    )
    if on_null == "null":
        return bucket
    return F.coalesce(
        bucket,
        F.raise_error(
            F.lit("hash_bucket: null key (pass on_null='null' to propagate nulls)")
        ),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, int],
    default_pct: int,
    key_col: str,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket is
    below the stratum's percentage (``rates`` maps stratum value -> pct,
    others get ``default_pct``).

    The training-data use case is rebalancing: downsample the dominant
    language/source while keeping the tail whole. The filter is a pure
    row-local projection — no shuffle, no state, fully pushdown-friendly.
    A null sampling key raises (see ``hash_bucket``) rather than silently
    dropping the row from every stratum.
    """
    pct = F.lit(default_pct)
    for value, p in sorted(rates.items()):
        pct = F.when(F.col(stratum_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(hash_bucket(F.col(key_col)) < pct)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Route every row into a named split (train/val/test) by hash bucket.

    ``splits`` maps name -> percentage (must sum to 100); buckets are
    assigned to splits in sorted-name order so the mapping is stable across
    runs and engines. A pure projection: the split decision never shuffles,
    and downstream writes can ``partitionBy(split_col)``. A null routing
    key raises (see ``hash_bucket``) instead of yielding a null split that
    vanishes from every partition.
    """
    splits = splits or {"test": 1, "train": 98, "val": 1}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = hash_bucket(F.col(key_col))
    expr = None
    lo = 0
    for name in sorted(splits):
        hi = lo + splits[name]
        cond = bucket < hi if expr is None else (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(split_col, expr)
