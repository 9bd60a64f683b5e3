"""Custom stateful streaming operator via ``applyInPandasWithState``
(the brief's designated escape hatch when built-in windowed aggs can't
express the semantics).

``running_user_totals``: per-user running event count / value sum /
last-seen timestamp, emitted once per micro-batch per active user. State
is a 3-tuple per user in the state store — bounded by user cardinality,
not stream length; a processing-time timeout would expire idle users at
true scale (left at NoTimeout here for determinism).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_ts TIMESTAMP"
STATE_SCHEMA = "n BIGINT, total DOUBLE, last_ts TIMESTAMP"


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API (typed state variables on a StatefulProcessor instead of
# one tuple blob; timers and TTL available per state var). Keeping both
# forms documents the migration path for user-defined stateful ops.
# Runtime requirements beyond the legacy API: the RocksDB state store
# provider AND the google.protobuf package (state-server protocol) — the
# latter is absent in this container, so the paired test skips here and
# runs wherever protobuf exists.
# ---------------------------------------------------------------------------


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor form of running_user_totals: one ValueState per
    user holding (n, total, last_ts)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
            TimestampType,
        )

        self._state = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n", LongType()),
                    StructField("total", DoubleType()),
                    StructField("last_ts", TimestampType()),
                ]
            ),
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n, total, last_ts = self._state.get()
        else:
            n, total, last_ts = 0, 0.0, None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        self._state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """running_user_totals on the transformWithStateInPandas API."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
