"""Batch IO: schema-enforced sources and partitioned/bucketed sinks.

The reference has no file formats at all (SURVEY §2.1 — its only sinks are
the radio, the UART, and SBUS), so this module is the engine's own storage
surface, designed for the 100 TB posture:

  * every read takes an explicit schema — no inference in the engine
    (inference is a dev convenience only, SURVEY §1.3);
  * writes partition by low-cardinality columns so downstream reads
    partition-prune, and never coalesce to one file;
  * bucketed saves co-locate join keys so repeated fact-fact joins skip the
    shuffle entirely (`spark.table(..)` joins on the bucket key produce no
    Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    **options: str,
) -> DataFrame:
    """Schema-enforced batch read (parquet/json/csv).

    CSV defaults to header=true so round-trips are self-describing; malformed
    rows surface as nulls (PERMISSIVE) for the dead-letter filter pattern
    (SURVEY §2.2 F1-F3) rather than failing the scan.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Partitioned batch write (parquet/json/csv).

    ``partition_by`` columns become directory partitions — readers filtering
    on them prune at planning time (no file even opened). Partition columns
    should be low-cardinality; high-cardinality keys create a small-file
    explosion at scale.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table: pre-shuffles once at write time so every later
    equi-join/aggregation on the bucket key is exchange-free.

    This is the batch answer to "reuse a partitioning across stages": two
    tables bucketed the same way sort-merge-join with zero shuffles.
    ``path`` makes it an external table (data at an explicit location
    instead of the session warehouse); overwrite drops any prior catalog
    entry first so the location can change between runs.
    """
    if mode == "overwrite":
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def compact_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    target_files: int,
    fmt: str = "parquet",
) -> int:
    """Compact a small-file-fragmented table to ``target_files`` files.

    Long-running ingest (streaming sinks, per-batch appends) fragments a
    table into thousands of tiny files; at scale the NameNode/listing cost
    and per-file open overhead dominate reads. Compaction is a single
    repartition-rewrite: read (schema-enforced), ``repartition(n)`` —
    a round-robin shuffle that yields uniformly-sized files, deliberately
    NOT ``coalesce`` which can skew file sizes and starve write
    parallelism — then an atomic overwrite via a staging directory plus
    rename, so concurrent readers never observe a half-written table.
    Returns the file count after compaction.
    """
    import os
    import shutil

    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    staging = path.rstrip("/") + "__compact_staging"
    read_table(spark, path, schema, fmt).repartition(target_files).write.mode(
        "overwrite"
    ).format(fmt).save(staging)
    backup = path.rstrip("/") + "__compact_old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return sum(
        1
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
    )


def table_stats(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Writer/layout stats per partition directory: file count, bytes, and
    (for parquet) exact row counts from footer metadata — no data scan.

    The operational companion to ``compact_table``: a partition whose
    bytes-per-file sits far below the FS block size is a compaction
    candidate, and skewed partition byte totals flag a bad partition key
    before anyone pays for the full read. Listing walks the driver-local
    filesystem here; on a real deployment the same loop runs over the
    object-store listing API or the table format's manifest — the output
    contract (one row per partition) is what the engine standardizes.
    """
    import os

    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    rows = []
    for dirpath, _dirnames, filenames in os.walk(path):
        data_files = [f for f in filenames if not f.startswith(("_", "."))]
        if not data_files:
            continue
        rel = os.path.relpath(dirpath, path)
        n_bytes = sum(os.path.getsize(os.path.join(dirpath, f)) for f in data_files)
        n_rows = None
        if fmt == "parquet":
            import pyarrow.parquet as pq

            n_rows = sum(
                pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
                for f in data_files
            )
        rows.append(
            ("" if rel == "." else rel, len(data_files), n_bytes, n_rows)
        )
    return spark.createDataFrame(
        rows, "partition string, n_files long, n_bytes long, n_rows long"
    )
