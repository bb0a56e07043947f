"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful operators at all (§2.7 of the survey —
"no watermarks/sessionization"); this is part of the Spark-side
extension surface. Sessionization with an inactivity gap is the
canonical custom-state example: one state entry per key holding the
open session; event-time timeout flushes sessions whose gap expired.

Scale shape: state is partitioned by key across executors (the shuffle
before applyInPandasWithState is the only one); state size is O(open
sessions), not O(events); late events beyond the watermark are dropped
by Spark before reaching the function.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _us(ts: Any) -> int:
    t = pd.Timestamp(ts)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return int(t.value // 1000)


def _ts(us: int) -> _dt.datetime:
    return _dt.datetime.utcfromtimestamp(us / 1e6)


def sessionize_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming sessionization: emit (key, start, end, n_events) for
    every CLOSED session (closed by a later event past the gap, or by
    event-time timeout once the watermark passes start+gap)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((key[0], _ts(start_us), _ts(last_us), n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(_us(v) for v in pdf[ts_col])
            ts_list.sort()
            if not ts_list:
                return
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = ts_list[0], ts_list[0], 0
            for t in ts_list:
                if t - last_us > gap_us:
                    closed.append((key[0], _ts(start_us), _ts(last_us), n))
                    start_us, n = t, 0
                last_us = max(last_us, t)
                n += 1
            state.update((start_us, last_us, n))
            # close by timeout when the watermark passes last event + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )

    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(key_col).cast("string").alias("__sess_key"),
        F.col(ts_col).alias(ts_col),
    )
    return (
        prepared.withWatermark(ts_col, watermark_delay)
        .groupBy("__sess_key")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("seq_text", T.StringType()),
    ]
)

_SEQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("items", T.StringType()),
    ]
)


def sequence_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    gap_seconds: int,
    watermark_delay: str = "10 seconds",
    max_items: int = 10_000,
) -> DataFrame:
    """Streaming counterpart of relational.session_sequences: emit the
    chronologically ordered event sequence of every CLOSED session
    ("type:epoch_us|..."), same rendering as the batch operator so the
    two paths are directly comparable.

    State per open session additionally carries the item list (bounded
    by `max_items`; overflow events still count in n_events but are
    dropped from the text — the documented cap that keeps state size
    below Spark's per-key state limits for pathological never-idle
    keys). Items are re-sorted at close, so late-but-within-watermark
    arrivals land in correct event-time order regardless of arrival
    order."""
    gap_us = gap_seconds * 1_000_000

    def render(items: list[tuple[int, str]]) -> str:
        items.sort()
        return "|".join(f"{ty}:{t}" for t, ty in items)

    def parse(s: str) -> list[tuple[int, str]]:
        out = []
        for part in s.split("|"):
            if part:
                # epoch is after the LAST colon (type may contain ':')
                ty, _, t = part.rpartition(":")
                out.append((int(t), ty))
        return out

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []

        def close(start_us, last_us, n, items):
            closed.append(
                (key[0], _ts(start_us), _ts(last_us), n, render(items))
            )

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, items_s = state.get
                close(start_us, last_us, n, parse(items_s))
                state.remove()
        else:
            ev: list[tuple[int, str]] = []
            for pdf in pdfs:
                ev.extend(
                    (_us(t), str(ty))
                    for t, ty in zip(pdf[ts_col], pdf[type_col])
                )
            ev.sort()
            if not ev:
                return
            if state.exists:
                start_us, last_us, n, items_s = state.get
                items = parse(items_s)
            else:
                start_us, last_us, n, items = ev[0][0], ev[0][0], 0, []
            for t, ty in ev:
                if t - last_us > gap_us:
                    close(start_us, last_us, n, items)
                    start_us, n, items = t, 0, []
                last_us = max(last_us, t)
                n += 1
                if len(items) < max_items:
                    items.append((t, ty))
            # items are re-sorted at render; state keeps them in
            # arrival order meanwhile
            state.update((start_us, last_us, n, render(items)))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "key",
                    "session_start",
                    "session_end",
                    "n_events",
                    "seq_text",
                ],
            )

    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(key_col).cast("string").alias("__seq_key"),
        F.col(ts_col).alias(ts_col),
        F.col(type_col).cast("string").alias(type_col),
    )
    return (
        prepared.withWatermark(ts_col, watermark_delay)
        .groupBy("__seq_key")
        .applyInPandasWithState(
            fn,
            outputStructType=SEQUENCE_SCHEMA,
            stateStructType=_SEQ_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
