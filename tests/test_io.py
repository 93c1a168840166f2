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


def test_zorder_write_files_carry_tight_biaxial_stats(spark, sf_dir, tmp_path_factory):
    """Write the events table through the z-ordered layout plan and check
    the claim the layout makes, comparatively: per-file min/max stats
    bound BOTH axes (every file's time span is a fraction of the range,
    and the MEAN user-span fraction stays small — sampled range
    boundaries need not align to z-box corners, so an individual
    straddler file may span wider), while the counterfactual plain
    time-sorted write leaves the user axis effectively UNBOUNDED per
    file. That asymmetry is exactly what footer-stat pruning buys."""
    from pyspark.sql import functions as F

    from espkinesis_spark.functions import layout

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("t_ms")
    )
    b = ev.agg(
        F.min("t_ms").alias("__mn"), F.max("t_ms").alias("__mx"),
        F.min("user_id").cast("long").alias("__umn"),
        F.max("user_id").cast("long").alias("__umx"),
    )
    z = ev.crossJoin(F.broadcast(b)).select(
        "event_id", "user_id", "t_ms",
        layout.z_value(
            layout.range_quantize("user_id", "__umn", "__umx"),
            layout.range_quantize("t_ms", "__mn", "__mx"),
        ).alias("z"),
    )
    bounds = b.first()
    u_range = bounds["__umx"] - bounds["__umn"] + 1
    t_range = bounds["__mx"] - bounds["__mn"] + 1
    n_files = 16

    def file_spans(df, sort_col):
        path = str(tmp_path_factory.mktemp("zorder") / sort_col)
        layout.zorder_write_plan(df, sort_col, n_files).write.mode(
            "overwrite"
        ).parquet(path)
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("u_span"),
                (F.max("t_ms") - F.min("t_ms")).alias("t_span"),
                F.count("*").alias("n"),
            )
            .collect()
        )

    zf = file_spans(z, "z")
    tf = file_spans(z, "t_ms")  # counterfactual: a plain time sort
    assert len(zf) >= n_files // 2 and sum(r["n"] for r in zf) == ev.count()
    mean_u_z = sum(r["u_span"] for r in zf) / len(zf) / u_range
    mean_u_t = sum(r["u_span"] for r in tf) / len(tf) / u_range
    for r in zf:  # every z-file bounds the time axis to a range fraction
        assert r["t_span"] <= t_range * 0.6, (r["f"], r["t_span"], t_range)
    assert mean_u_z < 0.6, mean_u_z       # z-order bounds the user axis too
    assert mean_u_t > 0.8, mean_u_t       # a plain time sort does not
    assert mean_u_z < mean_u_t / 1.5      # the asymmetry is material


def test_zrange_bucket_set_skips_zordered_files(spark, sf_dir, tmp_path_factory):
    """Close the z-order read/write loop: the octile BUCKET set that
    ex_zrange_query derives for the middle-half (user x time) box must
    translate into actual FILE skipping on a layout written via
    layout.zorder_write_plan — files-read < files-written — and the
    skipping must be lossless (no skipped file holds a matching row).
    The per-file z min/max computed here over input_file_name IS what
    the parquet footer stores for the written z column, so the pruning
    rule exercised is exactly the footer-stat file skip a table format
    (Delta/Iceberg data skipping) would run; each selected bucket b
    covers the contiguous z-range [b<<shift, (b+1)<<shift), and a file
    whose [z_min, z_max] misses every selected range is skippable."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions import layout

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("t_ms")
    )
    b = ev.agg(
        F.min("t_ms").alias("mn"), F.max("t_ms").alias("mx"),
        F.min("user_id").cast("long").alias("umn"),
        F.max("user_id").cast("long").alias("umx"),
    ).first()
    umn, umx, mn, mx = b["umn"], b["umx"], b["mn"], b["mx"]
    # reuse the collected bounds row — a second identical full-scan agg
    # would just risk the two copies drifting apart in future edits
    bounds = spark.range(1).select(
        F.lit(mn).alias("__mn"), F.lit(mx).alias("__mx"),
        F.lit(umn).alias("__umn"), F.lit(umx).alias("__umx"),
    )
    z = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id", "t_ms",
        layout.z_value(
            layout.range_quantize("user_id", "__umn", "__umx"),
            layout.range_quantize("t_ms", "__mn", "__mx"),
        ).alias("z"),
    )
    path = str(tmp_path_factory.mktemp("zrange_skip") / "events_z")
    layout.zorder_write_plan(z, "z", 16).write.mode("overwrite").parquet(path)
    files = spark.read.parquet(path)
    stats = files.groupBy(F.input_file_name().alias("f")).agg(
        F.min("z").alias("zmn"), F.max("z").alias("zmx")
    ).collect()
    n_written = len(stats)
    assert n_written >= 8  # the range partitioner produced a real layout

    # the middle-half box and its octile set — the ex_zrange_query rule,
    # replayed in exact python integers
    span_u, span_t = umx - umn + 1, mx - mn + 1
    qulo, quhi = umn + span_u // 4, umn + 3 * span_u // 4 - 1
    qtlo, qthi = mn + span_t // 4, mn + 3 * span_t // 4 - 1
    u_oct = range((qulo - umn) * 8 // span_u, (quhi - umn) * 8 // span_u + 1)
    t_oct = range((qtlo - mn) * 8 // span_t, (qthi - mn) * 8 // span_t + 1)
    rb = C.ZORDER_REPORT_BITS // 2
    buckets = [
        sum(((u >> i) & 1) << (2 * i) for i in range(rb))
        + sum(((t >> i) & 1) << (2 * i + 1) for i in range(rb))
        for u in u_oct
        for t in t_oct
    ]
    shift = 2 * C.ZORDER_BITS - C.ZORDER_REPORT_BITS
    ranges = [(bk << shift, ((bk + 1) << shift) - 1) for bk in buckets]
    keep = {
        r["f"]
        for r in stats
        if any(r["zmn"] <= hi and r["zmx"] >= lo for lo, hi in ranges)
    }
    # files-read < files-written: the bucket set skips real files
    assert len(keep) < n_written, (len(keep), n_written)

    # losslessness: every row matching the exact box predicate lives in
    # a kept file — the skipped files contribute nothing
    box = F.col("user_id").between(qulo, quhi) & F.col("t_ms").between(qtlo, qthi)
    n_all = files.filter(box).count()
    n_kept = (
        files.withColumn("__f", F.input_file_name())
        .filter(box & F.col("__f").isin(list(keep)))
        .count()
    )
    assert n_all > 0 and n_kept == n_all, (n_kept, n_all)


def test_zrange_interval_cover_skips_files_at_least_as_well_as_octiles(
    spark, sf_dir, tmp_path_factory
):
    """The BIGMIN-style interval cover (ex_zrange_bigmin's prefilter)
    against the same footer-stat file-skip rule as the octile test
    above, on the SKEWED (sixteenth x half) box: the interval-kept file
    set must be a SUBSET of the octile-kept set (the cover's z-region is
    contained in the octile cross-product's by construction — depth only
    ever refines the octile tiling), must skip real files, and must be
    lossless (every matching row lives in a kept file)."""
    from espkinesis_spark.functions import common as C
    from espkinesis_spark.functions import layout

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("t_ms")
    )
    b = ev.agg(
        F.min("t_ms").alias("mn"), F.max("t_ms").alias("mx"),
        F.min("user_id").cast("long").alias("umn"),
        F.max("user_id").cast("long").alias("umx"),
    ).first()
    umn, umx, mn, mx = b["umn"], b["umx"], b["mn"], b["mx"]
    span_u, span_t = umx - umn + 1, mx - mn + 1
    bounds = spark.range(1).select(
        F.lit(mn).alias("__mn"), F.lit(mx).alias("__mx"),
        F.lit(umn).alias("__umn"), F.lit(umx).alias("__umx"),
    )
    z = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id", "t_ms",
        layout.z_value(
            layout.range_quantize("user_id", "__umn", "__umx"),
            layout.range_quantize("t_ms", "__mn", "__mx"),
        ).alias("z"),
    )
    path = str(tmp_path_factory.mktemp("zrange_bigmin_skip") / "events_z")
    layout.zorder_write_plan(z, "z", 32).write.mode("overwrite").parquet(path)
    files = spark.read.parquet(path)
    stats = files.groupBy(F.input_file_name().alias("f")).agg(
        F.min("z").alias("zmn"), F.max("z").alias("zmx")
    ).collect()
    n_written = len(stats)

    # the skewed box (the ex_zrange_bigmin box, raw units + grid coords)
    qulo, quhi = umn + 7 * span_u // 16, umn + 8 * span_u // 16 - 1
    qtlo, qthi = mn + span_t // 4, mn + 3 * span_t // 4 - 1

    ivs = layout.z_box_intervals(
        layout.range_quantize_py(qulo, umn, umx),
        layout.range_quantize_py(quhi, umn, umx),
        layout.range_quantize_py(qtlo, mn, mx),
        layout.range_quantize_py(qthi, mn, mx),
    )
    iv_keep = {
        r["f"]
        for r in stats
        if any(r["zmn"] <= hi and r["zmx"] >= lo for lo, hi in ivs)
    }
    # octile cross-product keep set for the SAME box (the coarse rule)
    u_oct = range((qulo - umn) * 8 // span_u, (quhi - umn) * 8 // span_u + 1)
    t_oct = range((qtlo - mn) * 8 // span_t, (qthi - mn) * 8 // span_t + 1)
    rb = C.ZORDER_REPORT_BITS // 2
    shift = 2 * C.ZORDER_BITS - C.ZORDER_REPORT_BITS
    oct_ranges = [
        (bk << shift, ((bk + 1) << shift) - 1)
        for u in u_oct
        for t in t_oct
        for bk in [
            sum(((u >> i) & 1) << (2 * i) for i in range(rb))
            + sum(((t >> i) & 1) << (2 * i + 1) for i in range(rb))
        ]
    ]
    oct_keep = {
        r["f"]
        for r in stats
        if any(r["zmn"] <= hi and r["zmx"] >= lo for lo, hi in oct_ranges)
    }
    assert iv_keep <= oct_keep, iv_keep - oct_keep
    assert len(iv_keep) < n_written, (len(iv_keep), n_written)
    # losslessness: every matching row lives in an interval-kept file
    box = F.col("user_id").between(qulo, quhi) & F.col("t_ms").between(qtlo, qthi)
    n_all = files.filter(box).count()
    n_kept = (
        files.withColumn("__f", F.input_file_name())
        .filter(box & F.col("__f").isin(list(iv_keep)))
        .count()
    )
    assert n_all > 0 and n_kept == n_all, (n_kept, n_all)
