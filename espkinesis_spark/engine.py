"""Engine facade: the user-facing API surface.

Mirrors the reference's lifecycle (ingest → validate → dispatch → execute →
respond; ref: src/transmitter/main.cpp:229-277) on Spark: tables register as
views, queries go through Catalyst, and the declared query inventory is
addressable by name (the "command registry" analog —
ref: src/transmitter/main.cpp:28-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from espkinesis_spark import tables
from espkinesis_spark.session import get_spark


class Engine:
    """One SparkSession + one registered table set + the query registry."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self._tables: dict[str, DataFrame] = {}
        self.sf_dir: str | None = None

    # -- tables ---------------------------------------------------------
    def register_tables(self, sf_dir: str) -> dict[str, DataFrame]:
        """Load the parquet tables under sf_dir and register temp views."""
        self._tables = tables.load_tables(self.spark, sf_dir)
        self.sf_dir = sf_dir
        return self._tables

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise KeyError(f"table {name!r} not registered; call register_tables()")
        return self._tables[name]

    # -- functions (the command-registry analog, SURVEY §2.8) -------------
    def register_functions(self, include_python: bool = True) -> list[str]:
        """Register the engine's SQL-callable function surface: SQL scalar
        UDFs (Catalyst-inlined) + Arrow-batched Python handlers."""
        from espkinesis_spark.functions import registry

        names = registry.register_sql_functions(self.spark)
        if include_python:
            names += registry.register_python_functions(self.spark)
        return names

    # -- queries ----------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """SQL surface (Catalyst handles plan + optimization)."""
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a declared query from the inventory by name (e.g. 'dq21')."""
        from espkinesis_spark import queries

        if self.sf_dir is None:
            raise RuntimeError("call register_tables(sf_dir) first")
        registry = queries.registry()
        if name not in registry:
            raise KeyError(f"unknown query {name!r}; known: {sorted(registry)}")
        return registry[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from espkinesis_spark import queries

        return sorted(queries.registry())

    # -- differential verification ----------------------------------------
    def verify(self, name: str, sf_dir: str | None = None) -> tuple[bool, str]:
        """Run a declared query AND its DuckDB oracle on the same tables;
        returns (matched, detail). The engine ships its own correctness
        harness — the test suite and driver gate use the same comparator."""
        from espkinesis_spark.verify import verify_query

        target = sf_dir or self.sf_dir
        if target is None:
            raise RuntimeError("pass sf_dir or call register_tables(sf_dir) first")
        return verify_query(self.spark, name, target)
