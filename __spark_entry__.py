"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (DQ-21 pricing summary) at
sf0.001; ``queries()`` exposes the full declared inventory from
espkinesis_spark.queries (SURVEY.md §2.10 DQ-01..DQ-25 plus the
LLM-pipeline extension and streaming entries); ``oracle_sql()`` returns the
matching DuckDB SQL from espkinesis_spark.oracles (rows-only entries —
genuinely non-SQL ops like the mapInPandas decode plumbing — are absent
there by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from espkinesis_spark import oracles as _oracles
from espkinesis_spark import queries as _queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _queries.dq21(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries.registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omissions = rows-only checks)."""
    return dict(_oracles.ORACLES)
