"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stream semantics the built-in windowed aggregations
can't express (north-star: "applyInPandasWithState for custom stateful
operators"). State is per-key and explicit: Spark shuffles each
micro-batch by key, hands the group's Arrow batches plus its persisted
state to the Python function, and checkpoints whatever is stored back.

Scale properties: state lives in the state store (RocksDB on real
deployments), partitioned by key — memory is O(keys × state size), not
O(stream). The Python hop costs one Arrow round-trip per key-batch; keep
the state schema narrow and prefer built-in window aggs whenever they fit
(see windows.py — only custom logic belongs here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit group
    state; one updated row per user per micro-batch (update semantics).

    The batch twin is a plain ``groupBy(user_id).agg(count, sum)`` — the
    final emitted totals must equal it, which is what the tests pin.
    """

    def _update(key, pdfs, state: GroupState):
        # Self-contained closure (stdlib+pandas only): ships by value, no
        # module import needed on executors.
        import pandas as pd

        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            v += float(pdf["value"].fillna(0.0).sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
