"""Structured Streaming surface (SURVEY.md §2C streaming ops, §7.1 Phase 6).

The reference has no streaming at all (SURVEY.md §1.4); this package is the
north-star extension over the ``events`` stream table. Every operator here
has a batch twin in :mod:`cloudfloe_spark.queries.events` checked against
the DuckDB oracle; the streaming tests then pin streaming-vs-batch
equivalence, which is exactly the guarantee Spark's unified model makes.
"""

from cloudfloe_spark.streaming.stateful import running_user_totals
from cloudfloe_spark.streaming.windows import (
    dedup_within_watermark,
    run_available_now,
    session_counts,
    sliding_avg,
    stream_events,
    stream_static_enrich,
    stream_stream_interval_join,
    tumbling_counts,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_avg",
    "session_counts",
    "dedup_within_watermark",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "running_user_totals",
    "run_available_now",
]
