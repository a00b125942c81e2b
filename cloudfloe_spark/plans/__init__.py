"""Plan introspection + audits (SURVEY.md §4: what Catalyst must deliver).

The reference delegates all optimization to DuckDB and documents the
expectations in prose (`reference/README.md:199,232-234`); this package
makes the equivalent Spark expectations MACHINE-CHECKABLE: tests assert
that filters reach the parquet scan, small dimensions broadcast, range
joins don't degrade to nested loops, and metadata queries never read
payload columns.
"""

from cloudfloe_spark.plans.audit import (
    broadcast_hint_count,
    codegen_stage_count,
    executed_plan,
    has_broadcast_join,
    has_cartesian_or_bnl,
    node_count,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_hint_count",
    "executed_plan",
    "pushed_filters",
    "scan_columns",
    "has_broadcast_join",
    "has_cartesian_or_bnl",
    "node_count",
    "shuffle_count",
    "codegen_stage_count",
]
