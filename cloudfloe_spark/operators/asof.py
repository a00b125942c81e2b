"""As-of join (point-in-time join): for each left row, the most recent
right row at-or-before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB does — it is the oracle for our
catalog entries). The scalable implementation here is the union+window
technique, NOT a theta join:

    naive:  L JOIN R ON L.key = R.key AND R.ts <= L.ts  + row_number
            → per-key Cartesian blow-up before the filter; on skewed keys
              this is quadratic. Unusable at 100 TB.

    here:   tag L and R rows, union them, one window over
            (key, ORDER BY ts, tag) carrying the last non-null right
            payload forward — exactly one shuffle+sort on (key, ts), the
            same cost envelope as a sort-merge join, linear in |L|+|R|.
            AQE/salting applies to the single shuffle as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: list[str] | None = None,
    value_columns: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join.

    For every ``left`` row, attach ``value_columns`` from the latest
    ``right`` row with ``right.on <= left.on`` (``< left.on`` when
    ``strict``) and equal ``by`` keys; NULLs when no such row exists
    (left-outer semantics, like DuckDB ``ASOF LEFT JOIN``).

    ``left`` and ``right`` only need ``on``/``by``/value columns; other
    left columns pass through unchanged.
    """
    by = by or []
    if value_columns is None:
        value_columns = [
            c for c in right.columns if c != on and c not in by
        ]

    left_cols = left.columns
    # Tag: right rows sort before left rows at equal ts for inclusive
    # semantics (right value at ts == left ts is visible), after them for
    # strict semantics.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(left_tag).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_columns],
    )
    r_tagged = right.select(
        *[F.col(c) if c in (by + [on]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
        F.lit(right_tag).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in value_columns],
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        F.col("__tag"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_columns
        ],
    )
    return carried.filter(F.col("__tag") == left_tag).drop("__tag")
