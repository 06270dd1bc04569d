"""Physical-plan inspection utilities.

The engine delegates all optimization to Catalyst (like the reference,
SURVEY.md §4) — these helpers make the resulting plans *checkable*:
tests assert that filters are pushed into scans, scans prune columns,
and small join sides broadcast, so a regression that silently degrades
the 100 TB posture fails CI instead of a production run.
"""

from hermes_spark.plans.inspect import (
    input_size_bytes,
    rebalance_for_cpu,
    suggest_shuffle_partitions,
    count_exchanges,
    explain_formatted,
    has_broadcast_join,
    plan_operators,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "input_size_bytes",
    "rebalance_for_cpu",
    "suggest_shuffle_partitions",
    "count_exchanges",
    "explain_formatted",
    "has_broadcast_join",
    "plan_operators",
    "pushed_filters",
    "read_schemas",
]
