"""Differential verification: run any declared query against its DuckDB
oracle on the same parquet tables and compare results.

This is the engine's own correctness surface (the same contract the driver
gate enforces): row count + column names + order-insensitive normalized
values. Exposed via ``Engine.verify``; the test suite delegates here.
"""

from __future__ import annotations

import math
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def duck_connection(sf_dir: str):
    """A DuckDB connection with every test table registered as a view."""
    import duckdb

    from espkinesis_spark.tables import TABLE_NAMES, table_path

    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.floor("us").isoformat()
    if isinstance(v, datetime):
        return pd.Timestamp(v).floor("us").isoformat()
    if isinstance(v, (int,)):
        return int(v)
    # numpy scalars have .tolist() too (returns a plain scalar) — route them
    # to .item() before the sequence branch, which expects an iterable
    if hasattr(v, "item") and not hasattr(v, "__len__"):
        return _norm_value(v.item())
    if isinstance(v, dict):  # MapType / DuckDB MAP cells
        return {_norm_value(k): _norm_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_norm_value(x) for x in seq)
    return v


def _sort_key(x):
    """Total-order wrapper for one normalized cell. Container cells must
    wrap their ELEMENTS too: an array cell holding a NULL element next
    to a number would otherwise compare None < float inside the plain
    tuple comparison and TypeError (found by the array-functions fuzz
    family), and a map cell (Spark MapType / DuckDB MAP both reach
    pandas as dict) has no native ordering at all — the comparator must
    not be the thing that breaks first when a query emits one."""
    if isinstance(x, tuple):
        return (False, "tuple", tuple(_sort_key(e) for e in x))
    if isinstance(x, dict):
        return (
            False,
            "dict",
            tuple(sorted((_sort_key(k), _sort_key(v)) for k, v in x.items())),
        )
    return (x is None, str(type(x)), x)


def normalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, normalized + canonically ordered rows)."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple(_sort_key(x) for x in r))
    return cols, rows


def compare(spark_df: DataFrame, duck_pdf: pd.DataFrame) -> None:
    """Raise AssertionError on any column/count/value divergence."""
    spark_pdf = spark_df.toPandas()
    s_cols, s_rows = normalize(spark_pdf)
    d_cols, d_rows = normalize(duck_pdf)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"


def verify_query(
    spark: SparkSession, name: str, sf_dir: str, con=None
) -> tuple[bool, str]:
    """Run query ``name`` on Spark and its oracle on DuckDB; returns
    (matched, detail). Queries without an oracle entry report a rows-only
    check."""
    from espkinesis_spark import oracles, queries

    df = queries.registry()[name](spark, sf_dir)
    if name not in oracles.ORACLES:
        n = df.count()
        return True, f"rows-only: {n} rows (no oracle declared)"
    own = con is None
    if own:
        con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(oracles.ORACLES[name]).df()
        try:
            compare(df, duck_pdf)
            return True, f"match: {len(duck_pdf)} rows"
        except AssertionError as exc:
            return False, str(exc)
    finally:
        if own:
            con.close()
