"""Shared Spark-vs-DuckDB comparison mirroring the driver's t2 gate:
row count + column names + order-insensitive normalized values."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pandas as pd

from espkinesis_spark.tables import TABLE_NAMES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
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
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_norm_value(x) for x in seq)
    if isinstance(v, (int,)):
        return int(v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_value(v.item())
    return v


def normalize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return cols, rows


def compare(spark_df, duck_pdf: pd.DataFrame) -> None:
    spark_pdf = spark_df.toPandas()
    s_cols, s_rows = normalize(spark_pdf)
    d_cols, d_rows = normalize(duck_pdf)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
