"""Streaming sink tests (K1/K4 analogs): replay fixtures into real sinks."""

from __future__ import annotations

import json

import pytest

from espkinesis_spark.streaming import fixtures, pipeline, sinks, sources


@pytest.fixture(scope="module")
def fixture_paths(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sink_fixtures")
    return fixtures.write_fixtures(spark, str(out))


@pytest.fixture(scope="module")
def targets(spark):
    df = fixtures.targets_df(spark)
    df.cache().count()
    return df


def test_parquet_and_dead_letter_sinks(spark, fixture_paths, targets, tmp_path_factory):
    out = tmp_path_factory.mktemp("sink_out")
    lines = sources.file_stream(
        spark, fixture_paths["commands"], sources.COMMAND_LINE_SCHEMA, fmt="json"
    )
    valid, rejected = pipeline.command_plane(lines, targets)
    q1 = sinks.parquet_sink(valid, str(out / "valid"), str(out / "ck1"), available_now=True)
    q1.awaitTermination()
    q2 = sinks.dead_letter_sink(rejected, str(out / "dead"), str(out / "ck2"), available_now=True)
    q2.awaitTermination()

    back_valid = spark.read.parquet(str(out / "valid"))
    back_dead = spark.read.text(str(out / "dead"))
    total = spark.read.schema(sources.COMMAND_LINE_SCHEMA).json(fixture_paths["commands"]).count()
    assert back_valid.count() + back_dead.count() == total
    for line in back_dead.limit(5).collect():
        doc = json.loads(json.loads(line["value"])["doc"])
        assert doc["type"] == "error" and doc["message"]


def test_parquet_sink_checkpoint_resume_is_exactly_once(
    spark, fixture_paths, targets, tmp_path_factory
):
    """Restarting an availableNow sink on the same checkpoint must not
    duplicate output (the source offsets are committed transactionally)."""
    out = tmp_path_factory.mktemp("resume_out")
    lines = sources.file_stream(
        spark, fixture_paths["commands"], sources.COMMAND_LINE_SCHEMA, fmt="json"
    )
    valid, _ = pipeline.command_plane(lines, targets)
    for _ in range(2):  # second run: nothing new to process
        q = sinks.parquet_sink(valid, str(out / "v"), str(out / "ck"), available_now=True)
        q.awaitTermination()
    total_valid = spark.read.parquet(str(out / "v")).count()
    lines2 = sources.file_stream(
        spark, fixture_paths["commands"], sources.COMMAND_LINE_SCHEMA, fmt="json"
    )
    valid2, _ = pipeline.command_plane(lines2, targets)
    q = sinks.parquet_sink(valid2, str(out / "v"), str(out / "ck"), available_now=True)
    q.awaitTermination()
    assert spark.read.parquet(str(out / "v")).count() == total_valid, "resume duplicated rows"


def test_keyed_foreach_batch_delivery(spark, fixture_paths, targets):
    frames = sources.file_stream(spark, fixture_paths["frames"], sources.FRAME_SCHEMA)
    lines = sources.file_stream(
        spark, fixture_paths["commands"], sources.COMMAND_LINE_SCHEMA, fmt="json"
    )
    out_stream, _ = pipeline.transmitter(frames, lines, targets)
    delivered: list[tuple[int, int]] = []

    def deliver(batch, batch_id):
        delivered.append((batch_id, batch.count()))

    q = sinks.keyed_foreach_batch_sink(out_stream, deliver, available_now=True)
    q.awaitTermination()
    assert sum(n for _, n in delivered) == 400 * 8  # every frame reached the sink


def test_console_capture_docs_parse_and_retries_are_idempotent(
    spark, tmp_path_factory
):
    """K3 capture leg: the serialized docs parse back to the source rows,
    and re-delivering a micro-batch (foreachBatch's at-least-once retry)
    lands on top of the first attempt instead of appending duplicates."""
    import os

    out = tmp_path_factory.mktemp("console_cap")
    src_dir = str(out / "src")
    spark.createDataFrame(
        [(i, f"t{i % 2}", float(i)) for i in range(6)],
        "event_id long, event_type string, value double",
    ).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id long, event_type string, value double"
    ).parquet(src_dir)
    cap = str(out / "docs")
    q = sinks.console_json_sink(
        stream,
        available_now=True,
        query_name="__console_cap_test",
        capture_dir=cap,
        checkpoint=str(out / "ckpt"),
    )
    q.awaitTermination()
    batch_dirs = [
        os.path.join(cap, d) for d in os.listdir(cap) if d.startswith("batch_id=")
    ]
    assert batch_dirs, "capture produced no batches"
    docs = spark.read.json(*batch_dirs)
    parsed = {
        json.loads(r["doc"])["event_id"]: json.loads(r["doc"])
        for r in docs.collect()
    }
    assert set(parsed) == set(range(6))
    assert parsed[3] == {"event_id": 3, "event_type": "t1", "value": 3.0}
    # simulate a retry of batch 0: deliver the same batch again (overwrite
    # into the batch-keyed dir); count must hold, not double
    rows = spark.read.json(batch_dirs[0]).collect()
    spark.createDataFrame(rows).write.mode("overwrite").json(batch_dirs[0])
    assert spark.read.json(batch_dirs[0]).count() == len(rows)
    total = sum(spark.read.json(d).count() for d in batch_dirs)
    assert total == 6
