"""Round-trip + partition-pruning tests for the batch IO surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from espkinesis_spark import io as eio
from espkinesis_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, events, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("io") / f"events_{fmt}")
    eio.write_table(events, path, fmt=fmt)
    back = eio.read_table(spark, path, events.schema, fmt=fmt)
    assert back.count() == events.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in events.schema.fields]
    assert back.agg(F.sum("event_id")).first()[0] == events.agg(F.sum("event_id")).first()[0]


def test_partitioned_write_prunes(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "events_part")
    eio.write_table(events, path, partition_by=["event_type"])
    # directory layout is the partition spec
    assert any(d.startswith("event_type=") for d in os.listdir(path))
    back = eio.read_table(spark, path, events.drop("event_type").schema).withColumn(
        "event_type", F.col("event_type")
    )
    clicks = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (pruning, not post-filter)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    want = events.filter(F.col("event_type") == "click").count()
    assert clicks.count() == want
    assert back.count() == events.count()


def test_bucketed_join_no_exchange(spark, events):
    try:
        eio.save_bucketed(events, "ev_bucketed", ["user_id"], 8, sort_by=["user_id"])
        t = spark.table("ev_bucketed")
        # merge hint: at test scale the planner would broadcast (which also
        # skips the shuffle); the bucketing claim is about sort-merge joins
        joined = t.alias("a").hint("merge").join(t.alias("b").hint("merge"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed self-join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")


def test_bad_format_rejected(spark, events):
    with pytest.raises(ValueError):
        eio.write_table(events, "/tmp/nope", fmt="xml")


def test_compact_table_reduces_files_and_preserves_rows(spark, events, tmp_path_factory):
    import os

    from espkinesis_spark.io import compact_table, read_table, write_table

    path = str(tmp_path_factory.mktemp("compact") / "events")
    # fragment: one file per partition, many partitions
    write_table(events.repartition(24), path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 24
    rows = events.count()
    checksum = events.agg({"event_id": "sum"}).first()[0]
    n_after = compact_table(spark, path, events.schema, target_files=4)
    assert n_after == 4
    compacted = read_table(spark, path, events.schema)
    assert compacted.count() == rows
    assert compacted.agg({"event_id": "sum"}).first()[0] == checksum


def test_table_stats_counts_partitions_files_rows(spark, events, tmp_path_factory):
    from espkinesis_spark import io as eio

    path = str(tmp_path_factory.mktemp("stats") / "ev")
    eio.write_table(events, path, partition_by=["event_type"])
    stats = {r["partition"]: r for r in eio.table_stats(spark, path).collect()}
    types = {r["event_type"] for r in events.select("event_type").distinct().collect()}
    assert set(stats) == {f"event_type={t}" for t in types}
    assert sum(r["n_rows"] for r in stats.values()) == events.count()
    assert all(r["n_files"] >= 1 and r["n_bytes"] > 0 for r in stats.values())
