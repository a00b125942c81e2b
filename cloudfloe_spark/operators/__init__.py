"""Custom operators Spark SQL lacks as primitives, built as scalable
compositions of built-in DataFrame ops (SURVEY.md §7.2 'composed from
built-ins'; no Catalyst extensions needed)."""

from cloudfloe_spark.operators.asof import asof_join
from cloudfloe_spark.operators.rangejoin import range_join_bucketed
from cloudfloe_spark.operators.skew import salted_agg, salted_avg, salted_join

__all__ = ["asof_join", "range_join_bucketed", "salted_agg", "salted_avg", "salted_join"]
