"""Driver-checkable streaming queries.

Each job replays a file source with ``trigger(availableNow=True)`` into a
memory sink and returns the drained result as a batch DataFrame. The three
jobs are the streaming forms of batch queries with DuckDB oracles, so the
driver's correctness gate checks streaming semantics too:

  * latest_per_user_stream  == DQ-07 (last-value-per-key, A2/A3)
  * window_counts_stream    == hourly tumbling counts (A4/T3 analog)
  * override_asof_stream    == DQ-09 (stateful as-of, A5) via
    applyInPandasWithState
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from espkinesis_spark.streaming import state as st
from espkinesis_spark.tables import SCHEMAS, table_path

# on-disk schema: ts is TIMESTAMP(NANOS) -> long (see tables.load_table)
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in SCHEMAS["events"].fields
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FileStreamSource requires a *directory*; expose the single parquet
    # file through a symlink dir (testdata itself is read-only).
    src_file = os.path.abspath(table_path(sf_dir, "events"))
    stream_dir = os.path.join(
        tempfile.gettempdir(), "espk_stream", src_file.strip("/").replace("/", "_")
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src_file, link)
    raw = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(stream_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _drain_to_memory(df: DataFrame, name: str, mode: str) -> DataFrame:
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def latest_per_user_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A2/A3: last event per user via max_by aggregation
    (complete mode). Ties on ts break by event_id, matching DQ-07."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy("user_id").agg(
        F.expr("max_by(struct(event_type, value), struct(ts, event_id))").alias("m")
    )
    out = agg.select("user_id", F.col("m.event_type").alias("event_type"), F.col("m.value").alias("value"))
    return _drain_to_memory(out, "st_latest_user_sink", "complete")


def window_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A4/T3: tumbling 1h snapshot counts per event type."""
    src = _events_stream(spark, sf_dir)
    agg = src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count("*").alias("n")
    )
    out = agg.select(F.col("win.start").alias("w"), "event_type", "n")
    return _drain_to_memory(out, "st_window_counts_sink", "complete")


def override_asof_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A5: per-key as-of state via applyInPandasWithState."""
    src = _events_stream(spark, sf_dir)
    out = st.asof_override(src)
    return _drain_to_memory(out, "st_override_asof_sink", "append")
