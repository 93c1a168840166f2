"""Source-decode tests: the Kinesis wire decode and the rate-frame shape,
exercised without connector jars (batch DataFrames drive the identical
expressions)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from espkinesis_spark.streaming import sources


def test_kinesis_decode_roundtrip(spark):
    recs = [
        (
            json.dumps({"frame_id": i, "ts": "2024-01-01T00:00:00", "channels": [1000 + i] * 8}).encode(),
            f"2024-01-01 00:00:{i:02d}",
        )
        for i in range(5)
    ]
    raw = spark.createDataFrame(recs, "data binary, approximateArrivalTimestamp string").withColumn(
        "approximateArrivalTimestamp", F.col("approximateArrivalTimestamp").cast("timestamp")
    )
    out = sources.decode_kinesis_payload(raw).collect()
    assert [r["frame_id"] for r in out] == [0, 1, 2, 3, 4]
    assert out[3]["channels"] == [1003] * 8
    assert out[0]["ts"] is not None


def test_kinesis_decode_malformed_payload_yields_nulls(spark):
    raw = spark.createDataFrame(
        [(b"{not json", "2024-01-01 00:00:00")],
        "data binary, approximateArrivalTimestamp string",
    ).withColumn(
        "approximateArrivalTimestamp", F.col("approximateArrivalTimestamp").cast("timestamp")
    )
    (row,) = sources.decode_kinesis_payload(raw).collect()
    assert row["frame_id"] is None and row["channels"] is None  # F2 dead-letter shape


def test_rate_frames_shape(spark):
    df = sources.rate_frames(spark)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["frame_id", "ts", "channels"]


def test_kinesis_dead_letter_split_routes_malformed(spark):
    recs = [
        (json.dumps({"frame_id": 1, "ts": "2024-01-01T00:00:00", "channels": [1500] * 8}).encode(), "2024-01-01 00:00:01"),
        (b"{not json", "2024-01-01 00:00:02"),
        (json.dumps({"frame_id": None, "channels": None}).encode(), "2024-01-01 00:00:03"),
        (json.dumps({"frame_id": 2, "ts": "2024-01-01T00:00:00", "channels": [1600] * 8}).encode(), "2024-01-01 00:00:04"),
    ]
    raw = spark.createDataFrame(recs, "data binary, approximateArrivalTimestamp string").withColumn(
        "approximateArrivalTimestamp", F.col("approximateArrivalTimestamp").cast("timestamp")
    )
    frames, dead = sources.split_decoded_frames(raw)
    assert sorted(r["frame_id"] for r in frames.collect()) == [1, 2]
    assert "__raw" not in frames.columns
    docs = [json.loads(r["doc"]) for r in dead.collect()]
    assert len(docs) == 2
    assert all(d["type"] == "error" and d["message"] == "frame_decode_error" for d in docs)
    import base64
    payloads = {base64.b64decode(d["payload_b64"]) for d in docs}
    assert b"{not json" in payloads  # original bytes preserved for forensics
