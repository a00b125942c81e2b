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
    """One entry per implemented operator from SURVEY.md §2.

    Ordering is driver-aware (failed → pending → rotating green sample):
    the explicit ``apply_driver_ordering`` hook runs here, not at package
    import, so only the driver contract sees the adaptive order.
    """
    from cloudfloe_spark.queries import apply_driver_ordering, query_map

    apply_driver_ordering()
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog query."""
    from cloudfloe_spark.queries import apply_driver_ordering, oracle_map

    apply_driver_ordering()
    return oracle_map()
