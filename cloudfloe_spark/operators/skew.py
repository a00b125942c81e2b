"""Skew-mitigation operators: salted two-phase aggregation.

AQE's skew-join splitting handles most join skew automatically; what it
does NOT fix is a groupBy whose key distribution is pathological (one key
holding a double-digit percentage of all rows — a classic shape in web
event data). Salting splits each hot key across ``n_salts`` reducers in a
first partial aggregation, then merges the partials in a second, tiny
aggregation:

    phase 1: groupBy(keys…, salt)  — |keys|×n_salts groups, even load
    phase 2: groupBy(keys…)        — n_salts rows per key, trivial

Total work is one extra (small) shuffle; the win is that no single
reducer owns a hot key's full row set. Only MERGEABLE aggregates can be
salted this way (sum/count/min/max — avg as sum+count); the helper
exposes exactly those.

The salt is DETERMINISTIC — a hash of a caller-named spread column (an
id that varies within hot keys) — because nondeterministic salts
(``rand()``) break retry/speculation semantics: a re-executed task could
re-salt rows differently mid-shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase-1 partial, phase-2 merge) per supported aggregate
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    spread_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of ``(column, fn, alias)`` with ``fn`` in
    ``sum|count|min|max``. ``spread_col`` must vary within hot keys
    (a row id, event id, …); it seeds the deterministic salt.
    """
    for _, fn, _ in aggs:
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{fn!r} is not salt-mergeable; use {sorted(_MERGEABLE)}"
            )

    salt: Column = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _MERGEABLE[fn][0](F.col(col)).alias(f"__p_{alias}")
                for col, fn, alias in aggs
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGEABLE[fn][1](F.col(f"__p_{alias}")).alias(alias)
            for _, fn, alias in aggs
        ]
    )


def salted_avg(
    df: DataFrame,
    keys: list[str],
    col: str,
    alias: str,
    *,
    spread_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Average via salted sum+count (avg itself is not directly mergeable
    from partial avgs)."""
    merged = salted_agg(
        df,
        keys,
        [(col, "sum", "__s"), (col, "count", "__c")],
        spread_col=spread_col,
        n_salts=n_salts,
    )
    return merged.select(
        *keys, (F.col("__s") / F.col("__c")).alias(alias)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    spread_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a skewed fact against a dimension too large to
    broadcast: the fact side salts deterministically on ``spread_col``; the
    dimension side replicates each row across all ``n_salts`` partitions
    (explode over a salt array). The hot key's probe rows then spread over
    ``n_salts`` reducers instead of one.

    Cost model: dim is shuffled ``n_salts``× (it must be small relative to
    the fact, just not broadcast-small); the fact — the 100 TB side — still
    shuffles exactly once. Prefer AQE skew-join splitting when it fires;
    this operator is for when the skew is in the GROUPING of a following
    stage or AQE's thresholds don't trigger.
    """
    salt: Column = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts))
    fact_s = fact.withColumn("__salt", salt)
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return fact_s.join(dim_s, [*on, "__salt"], how).drop("__salt")
