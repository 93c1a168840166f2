"""Timestamp-encoding robustness: every parquet timestamp encoding a real
writer can produce must load to identical TimestampType values and identical
query results.

Round 4 was taken out by exactly this: the driver's testdata switched from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false) and the single
hard-coded nanos branch at the ingestion edge silently stopped firing. This
suite rewrites the events table into each encoding in a tmpdir (other tables
symlinked) and asserts the loaders + events-touching queries are
encoding-invariant.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from espkinesis_spark import queries
from espkinesis_spark.tables import TABLE_NAMES, load_table, table_path

# encoding name -> (arrow timestamp type, extra pq.write_table kwargs)
ENCODINGS = {
    "nanos": (pa.timestamp("ns"), {}),  # TIMESTAMP(NANOS) -> Spark long (nanosAsLong)
    "us_utc": (pa.timestamp("us", tz="UTC"), {}),  # isAdjustedToUTC=true -> timestamp
    "us_ntz": (pa.timestamp("us"), {}),  # isAdjustedToUTC=false -> timestamp_ntz
    "ms_utc": (pa.timestamp("ms", tz="UTC"), {}),  # millis -> timestamp
    # the pre-2.6 legacy physical encoding (Impala/old Hive lineage):
    # 12-byte INT96 nanos — the one form not covered until round 6
    "int96": (
        pa.timestamp("ns"),
        {"use_deprecated_int96_timestamps": True, "version": "1.0"},
    ),
}


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory):
    """One sf-dir per encoding: events.parquet rewritten, rest symlinked."""
    src = pq.read_table(table_path(sf_dir, "events"))
    base = tmp_path_factory.mktemp("ts_encodings")
    dirs: dict[str, str] = {}
    for enc, (ts_type, write_kwargs) in ENCODINGS.items():
        d = base / enc
        d.mkdir()
        # Rebuild with ts cast to the target arrow type. pyarrow refuses a
        # lossy cast (e.g. µs-precision data to 'ms_utc'); skip such
        # encodings — they can't round-trip this data by construction.
        ts = src.column("ts")
        try:
            cast = ts.cast(ts_type)
        except pa.lib.ArrowInvalid:
            continue
        tbl = src.set_column(src.schema.get_field_index("ts"), "ts", cast)
        kwargs = {"version": "2.6", **write_kwargs}
        pq.write_table(tbl, str(d / "events.parquet"), **kwargs)
        for name in TABLE_NAMES:
            if name != "events":
                os.symlink(table_path(sf_dir, name), str(d / f"{name}.parquet"))
        dirs[enc] = str(d)
    return dirs


def _collect_ts(spark, d):
    df = load_table(spark, d, "events").select("event_id", "ts")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{d}: not normalized"
    return sorted((r.event_id, r.ts) for r in df.collect())


def test_load_table_normalizes_every_encoding(spark, sf_dir, encoded_dirs):
    canonical = _collect_ts(spark, sf_dir)
    for enc, d in encoded_dirs.items():
        assert _collect_ts(spark, d) == canonical, f"encoding {enc} drifted"


@pytest.mark.parametrize("qname", ["ex_sessionize", "ex_range_window", "dq07"])
def test_events_queries_encoding_invariant(spark, sf_dir, encoded_dirs, qname):
    fn = queries.registry()[qname]
    canonical = sorted(map(tuple, fn(spark, sf_dir).collect()))
    for enc, d in encoded_dirs.items():
        got = sorted(map(tuple, fn(spark, d).collect()))
        assert got == canonical, f"{qname} drifted under encoding {enc}"


def test_streaming_source_adapts_to_encoding(spark, sf_dir, encoded_dirs):
    """The FileStreamSource path probes the footer for its declared schema;
    the last-value-per-key stream must agree across encodings (the r4 bug
    shape: a long-declared schema over µs data is off by 1000x)."""
    from espkinesis_spark.streaming.jobs import latest_per_user_stream

    canonical = sorted(
        map(tuple, latest_per_user_stream(spark, sf_dir).collect())
    )
    for enc in ("nanos", "us_ntz", "int96"):
        got = sorted(
            map(tuple, latest_per_user_stream(spark, encoded_dirs[enc]).collect())
        )
        assert got == canonical, f"streaming drifted under encoding {enc}"


def test_date_reencoded_orders_normalizes(spark, sf_dir, tmp_path):
    """The date-like columns are midnight-aligned, so a future testdata
    round could re-encode them as parquet DATE (the r4 failure class).
    load_table must restore identical TimestampType instants, and the
    date-touching queries must return identical results."""
    src = pq.read_table(table_path(sf_dir, "orders"))
    idx = src.schema.get_field_index("o_orderdate")
    dated = src.set_column(
        idx, "o_orderdate", src.column("o_orderdate").cast(pa.date32())
    )
    d = tmp_path / "dated"
    d.mkdir()
    pq.write_table(dated, str(d / "orders.parquet"), version="2.6")
    for name in TABLE_NAMES:
        if name != "orders":
            os.symlink(table_path(sf_dir, name), str(d / f"{name}.parquet"))

    df = load_table(spark, str(d), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    canonical = sorted(
        (r.o_orderkey, r.o_orderdate)
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    )
    got = sorted(
        (r.o_orderkey, r.o_orderdate)
        for r in df.select("o_orderkey", "o_orderdate").collect()
    )
    assert got == canonical
    for qname in ("ex_shipping_priority", "ex_exists_shipped"):
        fn = queries.registry()[qname]
        want = sorted(map(tuple, fn(spark, sf_dir).collect()))
        have = sorted(map(tuple, fn(spark, str(d)).collect()))
        assert have == want, f"{qname} drifted under DATE encoding"
