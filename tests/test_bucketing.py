"""Bucketed-table audits: the write-once-shuffle-never property, checked
against the physical plan (the SURVEY §4 'co-located join' promise)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudfloe_spark.plans import executed_plan, shuffle_count
from cloudfloe_spark.sources.bucketing import (
    bucketed_tables_cojoin,
    write_bucketed,
)
from cloudfloe_spark.sources.tables import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        o,
        "b_orders",
        bucket_cols=["o_orderkey"],
        n_buckets=8,
        path=str(base / "orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        bucket_cols=["o_orderkey"],
        n_buckets=8,
        path=str(base / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    """Matching bucket layouts on the join key ⇒ SortMergeJoin with zero
    Exchange in the plan — the write-time shuffle amortized."""
    left, right = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_tables_cojoin(spark, left, right, ["o_orderkey"])
        plan = executed_plan(df, "simple")
        assert "SortMergeJoin" in plan, plan
        assert shuffle_count(df) == 0, plan
        # and it actually returns the join, not an empty accident
        assert df.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_needs_exchanges(spark, sf_dir):
    """Control: the same join off raw parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders").select("o_orderkey")
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        df = o.join(li, "o_orderkey")
        assert shuffle_count(df) >= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_is_exchange_free(spark, bucketed_pair):
    """Aggregation keyed on the bucket column also rides the layout."""
    left, _ = bucketed_pair
    df = (
        spark.table(left)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert shuffle_count(df) == 0, executed_plan(df, "simple")


def test_bucketed_output_file_count(spark, bucketed_pair, tmp_path):
    """Exactly n_buckets files — repartition-to-bucket-count prevents the
    tasks×buckets small-file explosion."""
    left, _ = bucketed_pair
    files = {f for f in spark.table(left).inputFiles()}
    assert len(files) == 8, len(files)
