"""Plan inspection & audit utilities (see audit.py).

Per SURVEY §4 the engine needs zero custom Catalyst rules — this package
instead *verifies* that Catalyst produced the plans the 100 TB posture
depends on (pushdown, pruning, broadcasts, no redundant exchanges).
"""

from espkinesis_spark.plans.audit import (
    broadcast_join_count,
    exchange_count,
    physical_plan,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "physical_plan",
    "pushed_filters",
    "scan_columns",
]
