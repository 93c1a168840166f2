"""Shared Spark-vs-DuckDB comparison mirroring the driver's t2 gate.

Thin re-export: the comparator is part of the engine itself
(espkinesis_spark.verify) so users get the same differential surface the
tests run.
"""

from __future__ import annotations

from espkinesis_spark.verify import compare, duck_connection, normalize

__all__ = ["compare", "duck_connection", "normalize"]
