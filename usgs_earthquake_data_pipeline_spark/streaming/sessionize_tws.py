"""Gap sessionization on Spark 4's ``transformWithStateInPandas`` —
the arbitrary-stateful-processing API that supersedes
``applyInPandasWithState`` (SPARK-40434 era) with explicit typed state
handles, first-class event-time timers, and state-schema evolution.

Same session semantics as ``sessionize.sessionize_stream`` (the
applyInPandasWithState operator it twins, and the batch twin both are
validated against): sessions closed by an in-batch gap emit
immediately; the open frontier session lives in a ValueState record
and closes via an event-time timer at ``session_end + gap``.

Why keep both operators: applyInPandasWithState is the stable
widely-deployed API; transformWithState is where new Spark state
features land (timer multiplexing, composite state, TTL). The
processor here exercises the parts that differ — explicit timer
registration/deletion instead of a single implicit timeout, and a
stale-timer guard, because unlike ``setTimeoutTimestamp`` (which
REPLACES the previous timeout) registered timers accumulate: each
session extension must delete the superseded timer or ignore its
firing.

State per active key is one fixed-width record + one timer — bounded
by active-key cardinality, never stream volume, exactly like the
older operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .sessionize import SESSION_SCHEMA

_STATE_DDL = (
    "start_us long, end_us long, n_events int, sum_value double, timer_ms long"
)


def _emit(user_id: int, sessions: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(
        sessions, columns=["start_us", "end_us", "n_events", "sum_value"]
    )
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(out), dtype="int64"),
            "session_start": pd.to_datetime(out["start_us"], unit="us"),
            "session_end": pd.to_datetime(out["end_us"], unit="us"),
            "n_events": out["n_events"].astype("int32"),
            "sum_value": out["sum_value"].astype("float64"),
        }
    )


class GapSessionProcessor(StatefulProcessor):
    """Per-user gap sessionizer. One ValueState record holds the open
    session; one event-time timer per key closes it when the watermark
    passes ``end + gap``."""

    def __init__(self, gap_seconds: int = 1800):
        self._gap_us = gap_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_DDL)

    def handleInputRows(
        self, key: tuple, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        vals = pdf["value"].tolist()

        if self._session.exists():
            s_us, e_us, n, sv, timer_ms = self._session.get()
        else:
            s_us = e_us = timer_ms = None
            n, sv = 0, 0.0

        closed: list[tuple] = []
        for t, v in zip(ts_us, vals):
            if s_us is None:
                s_us, e_us, n, sv = t, t, 1, float(v or 0.0)
            elif t - e_us <= self._gap_us:
                # in-watermark late arrival may precede the frontier:
                # extend the interval, never shrink it (same rule as
                # the applyInPandasWithState twin)
                s_us, e_us = min(s_us, t), max(e_us, t)
                n, sv = n + 1, sv + float(v or 0.0)
            else:
                closed.append((s_us, e_us, n, sv))
                s_us, e_us, n, sv = t, t, 1, float(v or 0.0)

        # registered timers accumulate (unlike setTimeoutTimestamp):
        # drop the superseded one before arming the new close time
        new_timer_ms = (e_us + self._gap_us) // 1000
        if timer_ms is not None and timer_ms != new_timer_ms:
            self._handle.deleteTimer(timer_ms)
        if timer_ms != new_timer_ms:
            self._handle.registerTimer(new_timer_ms)
        self._session.update(
            (int(s_us), int(e_us), int(n), float(sv), int(new_timer_ms))
        )
        if closed:
            yield _emit(user_id, closed)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if not self._session.exists():
            return
        s_us, e_us, n, sv, timer_ms = self._session.get()
        # stale-timer guard: a timer armed before a session extension
        # may still fire; only the CURRENT close time ends the session
        if expiredTimerInfo.getExpiryTimeInMs() != timer_ms:
            return
        self._session.clear()
        yield _emit(user_id, [(s_us, e_us, n, sv)])

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessionization over (user_id, ts, value) on the
    transformWithState API. Requires the RocksDB state store provider
    (transformWithState's backing store; set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=GapSessionProcessor(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="EventTime",
        )
    )
