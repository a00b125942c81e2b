"""Unit tests for the as-of / range join operators on synthetic edge
cases (value-level fixture correctness is pinned by the oracle catalog
tests for the timejoins entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudfloe_spark.operators.asof import asof_join
from cloudfloe_spark.operators.rangejoin import range_join_bucketed


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 15), (4, "c", 5)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 1, 3.0)],
        "k string, t long, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _asof_fixture(spark)
    got = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, on="t", by=["k"], value_columns=["v"], suffix="_right"
        ).collect()
    }
    # id=1: right at t=10 visible (inclusive); id=2: latest of {10,15}=15;
    # id=3: b@1; id=4: no c rows → NULL
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: None}


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _asof_fixture(spark)
    got = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left,
            right,
            on="t",
            by=["k"],
            value_columns=["v"],
            suffix="_right",
            strict=True,
        ).collect()
    }
    assert got[1] is None  # t=10 right row no longer visible at t=10


def test_asof_preserves_left_row_count(spark):
    left, right = _asof_fixture(spark)
    assert (
        asof_join(left, right, on="t", by=["k"], value_columns=["v"]).count()
        == left.count()
    )


def test_range_join_bucket_boundaries(spark):
    """Matches must be identical whether or not the interval crosses a
    bucket boundary (the classic off-by-one in bucketed range joins)."""
    left = spark.createDataFrame(
        [(1, 99), (2, 100), (3, 150), (4, 201), (5, 1000)],
        "lid long, p long",
    )
    right = spark.createDataFrame(
        [(10, 100, 200)], "rid long, s long, e long"
    )
    got = sorted(
        r["lid"]
        for r in range_join_bucketed(
            left, right, point="p", start="s", end="e", bucket=64
        ).collect()
    )
    assert got == [2, 3]  # inclusive both ends, 99 and 201 excluded


def test_range_join_equals_naive_theta_join(spark):
    """Differential vs the naive theta join on random-ish data."""
    left = spark.createDataFrame(
        [(i, "k" + str(i % 3), (i * 37) % 500) for i in range(100)],
        "lid long, k string, p long",
    )
    right = spark.createDataFrame(
        [(j, "k" + str(j % 3), (j * 91) % 450, (j * 91) % 450 + 60)
         for j in range(40)],
        "rid long, k string, s long, e long",
    )
    fast = range_join_bucketed(
        left, right, point="p", start="s", end="e", by=["k"], bucket=50
    ).select("lid", "rid")
    naive = left.join(right, "k").filter(
        (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
    ).select("lid", "rid")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))
