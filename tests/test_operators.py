"""Property/unit tests for the reference-semantics operators (SURVEY §5.4)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from espkinesis_spark.operators import core as ops


def _remap_py(v: int) -> int:
    # Arduino map() truncating integer semantics (ref: src/receiver/main.cpp:70)
    return (v - 1000) * (1811 - 172) // 1000 + 172


class TestRemap:
    def test_endpoints(self, spark):
        df = spark.createDataFrame([(1000,), (2000,)], "v int")
        got = [r[0] for r in df.select(ops.remap_range(F.col("v"))).collect()]
        assert got == [172, 1811]

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.integers(1000, 2000), min_size=1, max_size=30))
    def test_matches_integer_map(self, vals):
        spark = TestRemap._spark
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        got = [r[0] for r in df.select(ops.remap_range(F.col("v")).alias("s")).collect()]
        assert got == [_remap_py(v) for v in vals]

    @pytest.fixture(autouse=True)
    def _stash(self, spark):
        TestRemap._spark = spark


def test_remap_is_monotonic(spark):
    df = spark.range(1000, 2001).select(ops.remap_range(F.col("id")).alias("s"))
    vals = [r[0] for r in df.collect()]
    assert vals == sorted(vals)
    assert min(vals) == 172 and max(vals) == 1811


def test_mac_str(spark):
    df = spark.createDataFrame([(bytes([0xA1, 0xB2, 0xC3, 0x04, 0x05, 0xF6]),)], "m binary")
    got = df.select(ops.mac_str(F.col("m")).alias("s")).collect()[0][0]
    assert got == "A1:B2:C3:04:05:F6"
    assert len(got) == 17


def test_patch_channels_sentinel_and_idempotence(spark):
    cmd = [1500, -1, 2000, -1, 1000, -1, -1, 1750]
    cur = [1100, 1200, 1300, 1400, 1500, 1600, 1700, 1800]
    df = spark.createDataFrame([(cmd, cur)], "cmd array<int>, cur array<int>")
    out = df.select(ops.patch_channels(F.col("cmd"), F.col("cur")).alias("p"))
    patched = out.collect()[0][0]
    assert patched == [1500, 1200, 2000, 1400, 1000, 1600, 1700, 1750]
    # idempotent: patching the patched frame with the same command is stable
    df2 = spark.createDataFrame([(cmd, patched)], "cmd array<int>, cur array<int>")
    assert df2.select(ops.patch_channels(F.col("cmd"), F.col("cur"))).collect()[0][0] == patched


def test_validate_channels(spark):
    cases = [
        ([1000, 2000, -1, 1500, 1500, 1500, 1500, 1500], True),
        ([999, 1500, 1500, 1500, 1500, 1500, 1500, 1500], False),
        ([2001, -1, -1, -1, -1, -1, -1, -1], False),
        ([-1, -1, -1, -1, -1, -1, -1, -1], True),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "ch array<int>")
    got = [r[0] for r in df.select(ops.validate_channels(F.col("ch"))).collect()]
    assert got == [e for _, e in cases]


def test_validate_commands_split(spark):
    targets = spark.createDataFrame([Row(id=i) for i in (1, 2, 3)])
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        # (target_id, channels, duration, expected_error)
        (1, [1500] * 8, 1000, None),
        (None, [1500] * 8, 1000, "missing_field"),
        (1, [1500] * 9, 1000, "bad_channel_count"),
        (1, [], 1000, "bad_channel_count"),
        (1, [1500] * 8, 0, "bad_duration"),
        (1, [999] + [1500] * 7, 1000, "bad_channel_value"),
        (9, [1500] * 8, 1000, "unknown_target"),
    ]
    df = spark.createDataFrame(
        [(i, t0, tid, ch, dur) for i, (tid, ch, dur, _) in enumerate(rows)],
        "cmd_id long, ts timestamp, target_id int, channels array<int>, duration long",
    )
    valid, rejected = ops.validate_commands(df, targets)
    assert [r["cmd_id"] for r in valid.collect()] == [0]
    got = {r["cmd_id"]: r["error"] for r in rejected.collect()}
    expected = {i: err for i, (_, _, _, err) in enumerate(rows) if err}
    assert got == expected


def test_latest_per_key_tiebreak(spark):
    t = datetime(2024, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [(1, t, 10, "a"), (1, t, 11, "b"), (2, t, 5, "c")],
        "k int, ts timestamp, eid long, v string",
    )
    out = ops.latest_per_key(df, ["k"], "ts", ["eid"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "b", 2: "c"}


def test_remaining_ttl_clamps_at_zero(spark):
    df = spark.createDataFrame([(1000000, 500000), (500000, 1000000)], "exp long, now long")
    got = [
        r[0]
        for r in df.select(
            ops.remaining_ttl_ms(F.col("exp"), F.col("now")).alias("ms")
        ).collect()
    ]
    assert got == [500, 0]


def test_snapshot_json_shape(spark):
    df = spark.createDataFrame(
        [(2, "Drone_2"), (1, "Drone_1")], "id int, name string"
    )
    doc = ops.snapshot_json(df, ["id", "name"]).collect()[0]["targets_json"]
    assert doc == '[{"id":1,"name":"Drone_1"},{"id":2,"name":"Drone_2"}]'


def test_asof_last_match_preserves_duplicate_left_rows(spark):
    t = datetime(2024, 1, 1, 12, 0, tzinfo=timezone.utc)
    t_p = datetime(2024, 1, 1, 11, 30, tzinfo=timezone.utc)
    # two fully-identical left rows must yield two output rows
    left = spark.createDataFrame(
        [(1, t), (1, t), (2, t)], "k int, lts timestamp"
    )
    right = spark.createDataFrame([(1, t_p, 99)], "k int, rts timestamp, event_id long")
    out = ops.asof_last_match(left, right, "k", "lts", "rts").collect()
    assert len(out) == 3
    assert sorted((r["k"], r["asof_match"]) for r in out) == [
        (1, 99), (1, 99), (2, None),
    ]
    assert "__asof_lid" not in {c for r in out for c in r.asDict()}


def test_norm_value_numpy_scalars_and_arrays():
    import numpy as np

    from espkinesis_spark.verify import _norm_value

    assert _norm_value(np.int64(5)) == 5
    assert _norm_value(np.float64(1.5)) == 1.5
    assert _norm_value(np.array([1, 2])) == (1, 2)
    assert _norm_value([np.int32(3), np.float32(0.5)]) == (3, 0.5)


def test_normalize_sorts_null_element_arrays():
    """Canonical row ordering must be a TOTAL order even when an array
    cell holds NULL elements next to numbers (found by the array fuzz
    family: the plain tuple sort key compared None < float inside the
    cell and raised TypeError). Equal-prefix rows forcing the comparison
    INTO the array cells, mixed with NULL cells and NULL elements."""
    import pandas as pd

    from espkinesis_spark.verify import normalize

    pdf = pd.DataFrame(
        {
            "g": [0, 0, 0, 0],
            "xs": [(None, 7.0), (1.0, None), None, (1.0, 2.0)],
        }
    )
    cols, rows = normalize(pdf)
    assert cols == ["g", "xs"]
    # deterministic: same multiset in, same order out — and no TypeError
    cols2, rows2 = normalize(pdf.iloc[::-1])
    assert rows == rows2
    assert sorted(map(repr, rows)) == sorted(
        map(repr, [(0, (None, 7.0)), (0, (1.0, None)), (0, None), (0, (1.0, 2.0))])
    )
    # map cells (Spark MapType / DuckDB MAP -> dict) are unorderable by
    # <, so the sort key must wrap them too (review catch on the tuple
    # fix); values inside normalize like any other cell
    mdf = pd.DataFrame(
        {"g": [0, 0, 0], "m": [{"a": 1}, {"b": None}, None]}
    )
    _, mrows = normalize(mdf)
    _, mrows2 = normalize(mdf.iloc[::-1])
    assert mrows == mrows2 and len(mrows) == 3


def test_asof_last_match_lookback_boundaries(spark):
    """The as-of window is (left_ts - lookback, left_ts]: a right row
    EXACTLY lookback old is excluded (strict >), one exactly at left_ts
    is included (<=), and among in-window rows max(right_val) wins —
    the contract ex_asof_features' day-composite encoding relies on."""
    from datetime import datetime

    from espkinesis_spark.operators import core as ops

    T0 = datetime(2000, 1, 1, 12, 0, 0)

    def ts(sec):
        return datetime(2000, 1, 1, 12, 0, 0).fromtimestamp(
            T0.timestamp() + sec
        )

    left = spark.createDataFrame(
        [(1, T0), (2, T0)], "k long, lts timestamp"
    ).filter("k = 1")
    right = spark.createDataFrame(
        [
            (1, ts(-3600), 100),  # exactly lookback old -> excluded
            (1, ts(-3599), 200),  # just inside
            (1, ts(0), 300),      # exactly at left_ts -> included
            (1, ts(1), 400),      # future -> excluded
        ],
        "k long, rts timestamp, v long",
    )
    out = ops.asof_last_match(
        left, right, "k", "lts", "rts",
        lookback="INTERVAL 1 HOUR", right_val="v",
    ).collect()
    assert [r["asof_match"] for r in out] == [300]
    # drop the in-window rows: the exactly-lookback row must NOT match
    out2 = ops.asof_last_match(
        left, right.filter("v IN (100, 400)"), "k", "lts", "rts",
        lookback="INTERVAL 1 HOUR", right_val="v",
    ).collect()
    assert [r["asof_match"] for r in out2] == [None]


def test_session_window_exact_gap_merges(spark):
    """Pin Spark's session_window boundary rule the ex_session_funnel
    oracle depends on: a gap of EXACTLY the 30-min duration MERGES into
    one session (so the oracle's new-session rule is gap > 1800s, not
    >=). If a Spark upgrade flips this, the parity gate would catch it
    only as an opaque value drift — this test names the cause."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00"),
            (1, "2020-01-01 00:30:00"),       # exactly 30 min -> merges
            (2, "2020-01-01 00:00:00"),
            (2, "2020-01-01 00:30:00.000001"),  # 1 µs over -> splits
        ],
        ["u", "ts"],
    ).select("u", F.col("ts").cast("timestamp").alias("ts"))
    out = (
        df.groupBy("u", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("u")
        .agg(F.count("*").alias("n_sessions"))
    )
    got = {r["u"]: r["n_sessions"] for r in out.collect()}
    assert got == {1: 1, 2: 2}
