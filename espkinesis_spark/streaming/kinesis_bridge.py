"""boto3 landing bridge for the Kinesis ingestion edge (S1/S3).

Two production paths exist for the ESP-NOW-equivalent ingestion edge
(reference ``src/receiver/main.cpp:27-44`` receive callback,
``src/transmitter/main.cpp:91-95`` send path):

* the CONNECTOR path (``sources.kinesis_frames``) — preferred when a
  spark-sql-kinesis jar is on the classpath: Spark's micro-batch planner
  owns the shard cursors and the stream is one hop;
* THIS landing bridge — the classic Kinesis -> landing-zone -> file-stream
  architecture: a jar-free boto3 poller drains shard records into parquet
  files that ``sources.file_stream`` (and therefore ``frames_source``'s
  default ``file`` binding) already consumes, with per-shard sequence-number
  cursors so a restarted poller resumes exactly where it stopped. At scale
  the poller is a small always-on daemon (or Lambda/KCL worker) per stream;
  Spark never talks to Kinesis, so executor count and shard count scale
  independently and a reprocessing job is just a re-read of the landing
  zone.

The bridge is also the piece that is testable IN-SANDBOX against the real
AWS API record shapes: moto mocks Kinesis inside the process (no socket —
the connector jar is absent here and a moto/localstack HTTP server needs
exactly the kind of listener this sandbox blocks), so shard iterators,
sequence numbers, ApproximateArrivalTimestamp, and payload bytes all come
from the genuine API surface rather than a hand-rolled fake
(tests/test_kinesis_moto.py).

Landed files carry the CONNECTOR's output shape (``data`` binary +
``approximateArrivalTimestamp`` + ``partitionKey`` + ``sequenceNumber``),
so everything downstream of either path is the same plan:
``split_decoded_frames`` for JSON frame payloads, ``decode_espnow_frames``
for 16-byte ESP-NOW wire frames.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import types as T

# The connector-equivalent record shape (both public connectors emit
# data + approximateArrivalTimestamp; key and sequence ride along for
# lineage/debugging and are dropped by the decode stage).
KINESIS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("approximateArrivalTimestamp", T.TimestampType()),
        T.StructField("partitionKey", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
    ]
)


def drain_stream(
    client,
    stream_name: str,
    cursor: dict[str, str] | None = None,
    limit_per_call: int = 1000,
    max_records: int = 100_000,
) -> tuple[list[dict], dict[str, str]]:
    """Drain records currently available from every shard, up to a bound.

    ``cursor`` maps shard id -> last consumed sequence number; pass the
    returned cursor back in to resume AFTER those records (the poller's
    exactly-once seam — the file-sink side of the landing zone is
    append-only, so not re-reading is what prevents duplicates). A fresh
    shard (no cursor entry) starts at TRIM_HORIZON.

    ``max_records`` bounds ONE drain (review catch: a caught-up check
    alone never fires under a steady producer, so an unbounded drain
    would accumulate the whole live stream in memory and never return
    to let the caller land + checkpoint). The returned cursor reflects
    exactly what was consumed, so the caller's land/checkpoint/drain
    loop picks up where the bound cut — the bound is also what keeps
    the crash-replay window (records landed but cursor not yet
    persisted) at one drain's worth instead of the whole backlog.

    Returns ``(records, new_cursor)`` where each record dict carries
    ``data`` (bytes), ``approximateArrivalTimestamp`` (datetime),
    ``partitionKey``, ``sequenceNumber``, and ``shardId``. Per-shard
    arrival order is preserved (Kinesis orders by sequence number within
    a shard; cross-shard order is undefined, same as the connector).
    """
    cursor = dict(cursor or {})
    records: list[dict] = []
    shards = []
    paginator = client.get_paginator("list_shards")
    for page in paginator.paginate(StreamName=stream_name):
        shards.extend(page["Shards"])
    for shard in shards:
        if len(records) >= max_records:
            break  # unvisited shards keep their cursor; next drain resumes
        shard_id = shard["ShardId"]
        if shard_id in cursor:
            try:
                it = client.get_shard_iterator(
                    StreamName=stream_name,
                    ShardId=shard_id,
                    ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                    StartingSequenceNumber=cursor[shard_id],
                )["ShardIterator"]
            except client.exceptions.InvalidArgumentException as exc:
                # A cursor whose sequence number aged past the stream's
                # retention can never resume — the raw AWS error gives no
                # guidance and a stopped-too-long poller would be stuck
                # behind manual cursor surgery (ADVICE r15). Stay
                # fail-loud (restarting at TRIM_HORIZON silently would
                # hide that records were lost) but say what happened and
                # what the operator must decide. InvalidArgumentException
                # also covers a cursor REPLAYED AGAINST THE WRONG STREAM
                # (sequence 'did not come from this stream') — deleting
                # the cursor there would mass-duplicate the backlog and
                # mask a config error, so the advice must be conditional.
                raise RuntimeError(
                    f"cursor for {shard_id} (sequence "
                    f"{cursor[shard_id]}) was rejected by "
                    f"{stream_name!r}: {exc}. If this checkpoint really "
                    "belongs to this stream, the records after it were "
                    "trimmed by the retention window and the gap is "
                    "unrecoverable — to restart the shard at TRIM_HORIZON "
                    "and accept the loss, delete its entry from the "
                    "cursor checkpoint and re-run the drain. If the "
                    "sequence 'did not come from this stream', the "
                    "checkpoint is being replayed against the wrong "
                    "stream — fix the stream/cursor pairing instead "
                    "(deleting it would re-ingest the whole backlog)."
                ) from exc
        else:
            it = client.get_shard_iterator(
                StreamName=stream_name,
                ShardId=shard_id,
                ShardIteratorType="TRIM_HORIZON",
            )["ShardIterator"]
        while it and len(records) < max_records:
            resp = client.get_records(
                ShardIterator=it,
                Limit=min(limit_per_call, max_records - len(records)),
            )
            for rec in resp["Records"]:
                records.append(
                    {
                        "data": bytes(rec["Data"]),
                        "approximateArrivalTimestamp": rec[
                            "ApproximateArrivalTimestamp"
                        ],
                        "partitionKey": rec["PartitionKey"],
                        "sequenceNumber": rec["SequenceNumber"],
                        "shardId": shard_id,
                    }
                )
                cursor[shard_id] = rec["SequenceNumber"]
            it = resp.get("NextShardIterator")
            # a drain is a bounded poll, not a tail: stop once the
            # iterator is caught up (no records and zero lag)
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                break
    return records, cursor


def land_records(records: list[dict], out_dir: str) -> str | None:
    """Append one parquet file of connector-shaped rows to the landing
    directory; returns the file path (None for an empty drain — no file,
    so the file stream's trigger count is unaffected, the same contract
    as an empty micro-batch).

    pyarrow-direct on purpose: the poller is a daemon that must not need
    a SparkSession (or a JVM) to land bytes. One file per drain keeps the
    landing zone append-only — the file stream treats each file as one
    replayable unit, and a poller restart after ``land_records`` but
    before the cursor checkpoint re-lands at most one drain's records
    into a NEW file (at-least-once at the bridge seam; the dedup stage
    downstream is keyed on frame identity for exactly this reason).
    """
    if not records:
        return None
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "data": pa.array([r["data"] for r in records], pa.binary()),
            # tz-aware micros (isAdjustedToUTC) so Spark's parquet reader
            # lands these as TimestampType, matching KINESIS_RAW_SCHEMA
            "approximateArrivalTimestamp": pa.array(
                [r["approximateArrivalTimestamp"] for r in records],
                pa.timestamp("us", tz="UTC"),
            ),
            "partitionKey": pa.array(
                [r["partitionKey"] for r in records], pa.string()
            ),
            "sequenceNumber": pa.array(
                [r["sequenceNumber"] for r in records], pa.string()
            ),
        }
    )
    path = os.path.join(out_dir, f"drain-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, path)
    return path
