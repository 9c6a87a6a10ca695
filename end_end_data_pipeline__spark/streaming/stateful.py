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


class _UserStatsProcessor:
    """``transformWithState`` form of :func:`running_user_stats` — the
    Spark 4 arbitrary-state API (typed state handles, timers, TTL)
    that succeeds ``applyInPandasWithState``.  Requires the RocksDB
    state store provider; same emission contract as the GroupState
    version, so the two backends are interchangeable."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._state = handle.getValueState("stats", USER_STATS_STATE)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        prior = self._state.get() if self._state.exists() else None
        n, last_ms = prior if prior is not None else (0, 0)
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                last_ms = max(last_ms, int(pdf["ts_ms"].max()))
        self._state.update((n, last_ms))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_event_ms": [last_ms]}
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """:func:`running_user_stats` on ``transformWithStateInPandas``.
    The session must run the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the TWS
    operator requires it — and the Python environment needs
    ``google.protobuf`` (the TWS state-server wire protocol;
    ``stateful_processor_api_client`` imports it).  This container
    ships neither protobuf nor pip access, so the backend is
    verified by tests/test_streaming.py only where protobuf exists
    (pytest.importorskip) — the ``applyInPandasWithState`` backend
    above is the in-container default."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:  # pragma: no cover - environment guard
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (TWS "
            "state-server protocol); use running_user_stats instead"
        ) from ex
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclassing at call time keeps the module importable on builds
    # without the TWS API
    proc = type(
        "_UserStatsProcessorTWS", (_UserStatsProcessor, StatefulProcessor), {}
    )()
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        proc,
        outputStructType=USER_STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


SESSIONS_OUTPUT = (
    "user_id long, session_start_ms long, session_end_ms long, n_events long"
)
# buf: JSON [[start_ms, last_ms, n], ...] of not-yet-final sessions,
# sorted by start; max_ts: newest event time ever seen for the key
# (the per-key watermark anchor).  Bounded: only sessions within
# gap+lateness of max_ts can still be non-final.
SESSIONS_STATE = "buf string, max_ts long"


def _merge_session(sessions: list[list[int]], t: int, gap_ms: int) -> None:
    """Insert event time ``t`` into the sorted candidate-session list,
    extending/merging any sessions now within ``gap_ms`` of each other
    (a late interior event can bridge two sessions into one)."""
    import bisect

    bisect.insort(sessions, [t, t, 1])
    merged: list[list[int]] = []
    for s in sessions:
        if merged and s[0] - merged[-1][1] <= gap_ms:
            merged[-1][1] = max(merged[-1][1], s[1])
            merged[-1][2] += s[2]
        else:
            merged.append(s)
    sessions[:] = merged


def _make_sessionize_fn(gap_ms: int, allowed_lateness_ms: int):
    def _sessionize_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Gap-based sessionizer, out-of-order-safe: candidate sessions
        buffer in state and a session is emitted only once the per-key
        watermark (newest event time seen − ``allowed_lateness_ms``)
        has passed its end by more than ``gap_ms`` — i.e. no admissible
        future event can extend or bridge it.  Events arriving later
        than the allowed lateness are dropped (standard watermark
        semantics), never turned into a wrong session.  With ordered
        arrival and lateness 0 this reduces exactly to close-on-gap:
        a session emits as soon as some later event is > gap past it."""
        import json

        buf, max_ts = state.get if state.exists else ("[]", None)
        sessions: list[list[int]] = json.loads(buf)
        ts = sorted(
            int(t) for pdf in pdfs if len(pdf) for t in pdf["ts_ms"].tolist()
        )
        for t in ts:
            max_ts = t if max_ts is None else max(max_ts, t)
            if t < max_ts - allowed_lateness_ms:
                # behind the watermark: the session it belonged to may
                # already be emitted — drop, never mis-sessionize
                continue
            _merge_session(sessions, t, gap_ms)
        watermark = (max_ts if max_ts is not None else 0) - allowed_lateness_ms
        final = [s for s in sessions if s[1] + gap_ms < watermark]
        live = [s for s in sessions if s[1] + gap_ms >= watermark]
        state.update((json.dumps(live), max_ts if max_ts is not None else 0))
        if final:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(final),
                    "session_start_ms": [s[0] for s in final],
                    "session_end_ms": [s[1] for s in final],
                    "n_events": [s[2] for s in final],
                }
            )

    return _sessionize_fn


def sessionize(
    events_stream: DataFrame,
    gap_ms: int = 1_800_000,
    allowed_lateness_ms: int = 0,
) -> DataFrame:
    """Custom gap-based sessionization via ``applyInPandasWithState``
    — the state-machine form of ST4's built-in session window, for
    pipelines that need per-session emission control (close-on-gap)
    rather than watermark-driven flush.  Input needs columns
    (user_id long, ts_ms long); emits one row per session once it can
    no longer change.  ``allowed_lateness_ms`` bounds how far behind
    the newest seen event a straggler may arrive and still merge into
    its session; later ones are dropped, never mis-sessionized."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_fn(gap_ms, allowed_lateness_ms),
        outputStructType=SESSIONS_OUTPUT,
        stateStructType=SESSIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
