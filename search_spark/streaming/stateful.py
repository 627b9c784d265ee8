"""Custom stateful streaming operator: event-time sessionization.

The reference has no streaming (SURVEY.md §2.11); this is the
Spark-native custom-stateful-operator slot — ``applyInPandasWithState``
with event-time timeout, the mechanism a production pipeline uses for
operators Structured Streaming lacks natively (per-key session windows
with arbitrary per-session aggregates).

Semantics: events are grouped per ``user_id``; consecutive events whose
gap is ≤ ``gap`` belong to one session. A session is *emitted* once the
event-time watermark passes ``session_end + gap`` (the session can no
longer grow) — classic watermark-closed sessionization. State per key is
one open-session triple ``(start, end, n_events)``; memory is O(keys),
independent of stream length.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# open-session state: (start_epoch_us, end_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

_US = 1_000_000


def _session_func(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def from_us(us: int) -> dt.datetime:
            # tz-naive UTC wall time (the session TZ is asserted to be UTC
            # by sessionize_stream; utcfromtimestamp is deprecated in 3.12)
            return dt.datetime.fromtimestamp(
                us / _US, dt.timezone.utc
            ).replace(tzinfo=None)

        def emit(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [from_us(start_us)],
                    "session_end": [from_us(end_us)],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit(start_us, end_us, n)
            return

        # gather this batch's event times for the key, oldest first
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        ts_us.sort()
        if not ts_us:
            return

        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = ts_us[0], ts_us[0], 0

        for t_us in ts_us:
            if t_us - end_us > gap_us:
                # gap exceeded within the batch → close the old session now
                yield emit(start_us, end_us, n)
                start_us, n = t_us, 0
            end_us = max(end_us, t_us)
            n += 1

        state.update((start_us, end_us, n))
        # close via event-time timeout once the watermark passes end + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 3600,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """events stream → closed-session stream (append mode).

    ``events`` must carry ``user_id`` and ``ts``; works on any streaming
    DataFrame (file source, Kafka, rate…) **on a UTC session**: the state
    epoch math interprets tz-naive pandas timestamps as UTC, so the session
    time zone must be UTC (asserted below; ``session.get_spark`` pins it).
    """
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"sessionize_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): state epoch math assumes UTC wall times"
        )
    stream = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
