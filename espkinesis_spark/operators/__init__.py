"""Reference-semantics operators re-expressed as DataFrame transforms.

Every public function here is a pure DataFrame->DataFrame (or Column)
transform built from JVM-side pyspark.sql.functions — no Python row loops —
so Catalyst keeps pushdown/pruning/codegen across them.
"""

from espkinesis_spark.operators.core import (
    assign_ids,
    asof_last_match,
    asof_last_match_pandas,
    latest_per_key,
    mac_str,
    patch_channels,
    remaining_ttl_ms,
    remap_range,
    resample_last,
    snapshot_json,
    stale_keys,
    validate_channels,
    validate_commands,
)
from espkinesis_spark.operators.skew import salted_join

__all__ = [
    "assign_ids",
    "asof_last_match",
    "asof_last_match_pandas",
    "latest_per_key",
    "salted_join",
    "mac_str",
    "patch_channels",
    "remaining_ttl_ms",
    "remap_range",
    "resample_last",
    "snapshot_json",
    "stale_keys",
    "validate_channels",
    "validate_commands",
]
