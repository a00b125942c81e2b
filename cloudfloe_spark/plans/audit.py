"""Physical-plan audit helpers.

Small string-level extractors over ``df.explain``'s formatted output —
deliberately representation-light so they survive Spark version changes,
and cheap enough to run inside tests for every operator family.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_columns(df: DataFrame) -> dict[str, list[str]]:
    """ReadSchema column lists per scan location (column-pruning audit)."""
    plan = executed_plan(df)
    out: dict[str, list[str]] = {}
    loc = None
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("Location:"):
            m = re.search(r"\[([^\]]*)\]", line)
            loc = m.group(1) if m else line
        elif line.startswith("ReadSchema:") and loc is not None:
            cols = re.findall(r"(\w+):", line.split("struct<", 1)[-1])
            out[loc] = cols
            loc = None
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df, "simple")


def has_cartesian_or_bnl(df: DataFrame) -> bool:
    plan = executed_plan(df, "simple")
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def node_count(df: DataFrame, node: str) -> int:
    """Occurrences of a physical operator (simple mode: one line per node,
    unlike formatted mode's tree + detail double listing)."""
    plan = executed_plan(df, "simple")
    return len(re.findall(rf"\b{re.escape(node)}\b", plan))


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (broadcasts excluded)."""
    plan = executed_plan(df, "simple")
    return len(re.findall(r"(?<!Broadcast)Exchange ", plan))


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of FORCED broadcast hints in the analyzed logical plan.

    Forced hints are honored regardless of build-side size, so a hint on an
    unbounded relation (customer/supplier/part, or any fact-derived
    aggregate) is a driver-OOM risk at scale; only bounded relations
    (nation/region, one-row globals, literal VALUES, query vectors) may
    carry one. Counted on the ANALYZED plan — the optimizer folds hints
    into join nodes later, which would hide them."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the FINAL plan (0 means the
    hot path fell out of codegen entirely — a perf smell).

    Executes the query (``collect`` — ``count()`` would plan a DIFFERENT
    query execution and leave this one unfinalized): under AQE the
    physical plan only finalizes, and codegen ids only appear, after the
    plan's own execution. Use on small/audit-sized results only.
    """
    df.collect()
    plan = executed_plan(df, "formatted")
    return len(set(re.findall(r"codegen id : (\d+)", plan)))
