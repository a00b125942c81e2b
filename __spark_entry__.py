"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All operators live in ``cloudfloe_spark.queries`` — each registered once with
its Spark DataFrame program and its DuckDB oracle twin side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-flavored pricing summary: scan → filter → hash agg → sort
    (SURVEY.md §7.4 minimum slice).
    """
    from cloudfloe_spark.queries import all_queries

    return all_queries()["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cloudfloe_spark.queries import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog query."""
    from cloudfloe_spark.queries import oracle_map

    return oracle_map()
