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


def domain_mix(
    docs: DataFrame,
    domain_col: str = "source",
    alpha: float = 0.5,
    sample_frac: float = 0.5,
    key_col: str = "doc_id",
    bucket_res: int = 10_000,
) -> DataFrame:
    """Temperature-scaled domain-mixture sampling report (the Pile /
    LLaMA-style data mixing): domain weight w_d ∝ n_d^alpha (alpha < 1
    upweights tail domains), per-domain quota = w_d · N · sample_frac,
    realized as a DETERMINISTIC md5-bucket acceptance with rate
    min(1, quota / n_d). Returns one row per domain: n_docs, mix_weight,
    accept_buckets (of ``bucket_res``), n_sampled.

    Scale shape: one map-side-combined groupBy for the domain counts
    (domain-cardinality rows), a broadcast of the tiny rate table back
    onto the corpus scan (pure map acceptance — no shuffle of the
    corpus), and one groupBy for the realized counts. Weights and rates
    are rounded to 9 dp before use so the float path is engine-portable
    (same discipline as kmeans' rounded trajectory); alpha=0.5 uses
    sqrt(), which is correctly rounded in IEEE754 on every engine.
    """
    n_pow = (
        F.sqrt(F.col("n_docs").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    )
    per = docs.groupBy(domain_col).agg(F.count("*").cast("long").alias("n_docs"))
    tot = per.agg(
        F.sum(n_pow).alias("z"), F.sum("n_docs").cast("long").alias("n_total")
    )
    rates = (
        per.crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            "n_docs",
            F.round(n_pow / F.col("z"), 9).alias("p"),
            "n_total",
        )
        .select(
            domain_col,
            "n_docs",
            "p",
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("p") * F.col("n_total") * F.lit(sample_frac))
                    / F.col("n_docs"),
                ),
                9,
            ).alias("rate"),
        )
        # domain-cardinality rows; materializing once means the corpus is
        # scanned exactly twice (count pass + acceptance pass), not once
        # per downstream reference to the rate table
        .localCheckpoint(eager=True)
    )
    accepted = docs.join(
        F.broadcast(rates.select(domain_col, "rate")), domain_col
    ).filter(
        hash_bucket(F.col(key_col), bucket_res)
        < F.floor(F.col("rate") * bucket_res)
    )
    sampled = accepted.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_sampled")
    )
    return (
        rates.join(F.broadcast(sampled), domain_col, "left")
        .select(
            domain_col,
            "n_docs",
            F.round("p", 6).alias("mix_weight"),
            F.floor(F.col("rate") * bucket_res).cast("long").alias("accept_buckets"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )
