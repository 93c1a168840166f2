"""Streaming sink constructors (SURVEY §2.6 K1-K4).

The reference's sinks are the ESP-NOW radio (fire-and-forget frames keyed
by MAC), the SBUS UART, the serial JSON response line, and the dead-letter
error docs. Spark analogs, each returning a started StreamingQuery:

* ``keyed_foreach_batch_sink`` — K1: per-micro-batch delivery of keyed
  frames to an external system via ``foreachBatch`` (production swaps the
  callback body for a Kinesis/Kafka producer; the partitioning and pacing
  are the engine's concern, the callback only ships bytes).
* ``parquet_sink`` — durable append sink with checkpointing (exactly-once
  file output; the batch analog of "what the radio saw").
* ``dead_letter_sink`` — K4: rejected rows as structured JSON error docs.
* ``console_json_sink`` — K3: response/status documents as JSON lines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from espkinesis_spark.streaming.pipeline import error_documents


def keyed_foreach_batch_sink(
    df: DataFrame,
    deliver: Callable[[DataFrame, int], None],
    key_col: str = "target_id",
    trigger: str | None = "500 milliseconds",
    checkpoint: str | None = None,
    available_now: bool = False,
    query_name: str = "espk_radio_sink",
) -> StreamingQuery:
    """K1 — paced fan-out delivery. ``deliver(batch_df, batch_id)`` receives
    each micro-batch repartitioned by the routing key so one task owns one
    key's traffic (the per-MAC send path); the 500 ms default trigger is the
    reference's 2 Hz radio cadence (ref: src/transmitter/main.cpp:23-25).
    """

    def run(batch: DataFrame, batch_id: int) -> None:
        deliver(batch.repartition(F.col(key_col)), batch_id)

    writer = df.writeStream.foreachBatch(run).queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger:
        writer = writer.trigger(processingTime=trigger)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = False,
    query_name: str = "espk_parquet_sink",
) -> StreamingQuery:
    """Durable append sink: checkpointed, exactly-once parquet files."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dead_letter_sink(
    rejected: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
    query_name: str = "espk_dead_letter",
) -> StreamingQuery:
    """K4 — rejected command rows, serialized as the reference's error doc
    shape (ref: src/transmitter/main.cpp:125-140), appended as JSON lines."""
    docs = error_documents(rejected)
    writer = (
        docs.writeStream.format("json")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def console_json_sink(
    df: DataFrame,
    available_now: bool = False,
    query_name: str = "espk_console",
    capture_dir: str | None = None,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """K3 — JSON documents to stdout (dev/debug surface).

    ``capture_dir`` switches the console format for a capturable
    ``foreachBatch`` leg that lands the SAME serialized JSON-line docs in
    batch_id-keyed subdirectories (idempotent under micro-batch retries),
    so tests and the driver can read the delivered documents back and
    value-hash the serialization — the console format itself is
    unobservable. The serialized column (``to_json`` over all input
    columns) is identical on both paths."""
    import os

    docs = df.select(F.to_json(F.struct(*df.columns)).alias("doc"))
    if capture_dir is not None:

        def emit(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("overwrite").json(
                os.path.join(capture_dir, f"batch_id={batch_id}")
            )

        writer = docs.writeStream.foreachBatch(emit).queryName(query_name)
    else:
        writer = (
            docs.writeStream.format("console")
            .option("truncate", "false")
            .queryName(query_name)
        )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
