"""Range (interval) join: left points joined to right intervals
containing them — ``R.start <= L.point <= R.end`` (+ optional equi keys).

Spark plans a bare range predicate as BroadcastNestedLoop/Cartesian —
quadratic and unusable at scale unless one side is tiny. The scalable
form here is BUCKETED: quantize time into fixed buckets, explode each
interval into the buckets it covers, and equi-join on (keys…, bucket)
before applying the exact range filter.

    shuffle keys:  (by…, bucket)  — a plain hash join, AQE-friendly
    right blow-up: ceil(interval_width / bucket) rows per interval
    left blow-up:  none (one bucket per point)

Pick ``bucket`` ≈ the typical interval width: blow-up stays O(1) per
interval and each bucket pairs only temporally-near rows. Degenerate
intervals (weeks-wide against a minutes bucket) should instead widen the
bucket or pre-split the long tail — the operator logs nothing silently:
the blow-up factor is exactly ``size(sequence(...))`` and can be audited
with ``.explain``/count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    bucket: int,
) -> DataFrame:
    """Join each left row to every right interval containing its point.

    ``point``/``start``/``end`` must be integral columns in the same unit
    (e.g. epoch seconds — cast timestamps upstream); ``bucket`` is the
    quantization width in that unit. Returns left columns + right columns
    (overlapping right names suffixed ``_r``).
    """
    by = by or []

    def _b(c: Column) -> Column:
        return F.floor(c / F.lit(bucket)).cast("long")

    rename = {
        c: f"{c}_r" for c in right.columns if c in left.columns and c not in by
    }
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_start, r_end = rename.get(start, start), rename.get(end, end)

    l_b = left.withColumn("__bucket", _b(F.col(point)))
    r_b = r.withColumn(
        "__bucket",
        F.explode(F.sequence(_b(F.col(r_start)), _b(F.col(r_end)))),
    )
    joined = l_b.join(r_b, on=by + ["__bucket"], how="inner").filter(
        (F.col(point) >= F.col(r_start)) & (F.col(point) <= F.col(r_end))
    )
    return joined.drop("__bucket")
