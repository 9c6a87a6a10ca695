"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md ST4/ST5 adjacents; north-star custom stateful surface).

The built-in stateful ops (windowed aggs, ``dropDuplicates``,
stream-stream joins) cover the reference's semantics; this module is
the escape hatch for state machines they can't express.  The pattern:
group by the entity key, keep a small typed state tuple per key,
Arrow-batch the per-key rows through pandas, emit on change.

Scale: state lives in the executor state store (RocksDB-backed on a
real cluster), partitioned by the group key — the same hash shuffle a
grouped agg costs.  Keep the state schema primitive-typed and bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = "user_id long, n_events long, last_event_ms long"
USER_STATS_STATE = "n_events long, last_event_ms long"


def _user_stats_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running event count + latest event time (epoch ms).

    Count and max are order-insensitive, so the final emission is
    deterministic regardless of micro-batch slicing — which keeps the
    operator oracle-checkable against a batch GROUP BY."""
    n, last_ms = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            batch_max = int(pdf["ts_ms"].max())
            last_ms = max(last_ms, batch_max)
    state.update((n, last_ms))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "last_event_ms": [last_ms]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user stats state machine.  Input needs columns
    (user_id long, ts_ms long); emits the updated totals for every user
    seen in each micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
