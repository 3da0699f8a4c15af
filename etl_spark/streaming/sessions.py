"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming counterpart of the batch window sessionizer
(etl_spark/queries.py::q_sessionize): events arrive on an unbounded
stream, a per-key session stays OPEN in the state store while events
keep landing within ``gap_sec`` of the last one, and is emitted exactly
once when either (a) a later event opens the next session, or (b) the
event-time watermark passes last_ts + gap (timeout) — so output is
final, never retracted.

Scale shape: state is O(open sessions) = O(active keys), partitioned by
the group key across executors (RocksDB-backed state store on a real
cluster); each micro-batch touches only the keys present in the batch
plus timed-out ones. The per-group python function sees Arrow-batched
pandas frames — no per-row Python.

The reference has no streaming sessionizer (its pipeline is row-at-a-
time channels, /root/reference/v2/etl.go:76-141); this is the
Spark-native extension the transcript workload needs (conversation
activity windows over the change stream).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state: (start_us, last_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_group(gap_sec: int):
    import pandas as pd

    gap_us = gap_sec * 1_000_000

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        out: list[tuple[int, int, int, int]] = []  # start_us, end_us, n
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                out.append((user_id, s, e, n))
            state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                # tz-naive event-time micros (batch frames are Arrow)
                ts_list.extend(
                    pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
                    .astype("int64") // 1000
                )
            ts_list.sort()
            if state.exists:
                cur_s, cur_e, cur_n = state.get
            else:
                cur_s = cur_e = ts_list[0]
                cur_n = 0
                ts_list = ts_list  # first event counted in the loop
            for t in ts_list:
                if t - cur_e > gap_us:
                    out.append((user_id, cur_s, cur_e, cur_n))
                    cur_s, cur_e, cur_n = t, t, 1
                else:
                    cur_s = min(cur_s, t)  # late fold-in keeps boundaries
                    cur_e = max(cur_e, t)
                    cur_n += 1
            state.update((cur_s, cur_e, cur_n))
            # close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp(cur_e // 1000 + gap_sec * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming event-time sessionization with a ``gap_sec`` inactivity
    gap. ``events`` must be a STREAMING DataFrame carrying (key_col,
    ts_col). Output (append mode): one final row per closed session.

    Ordering contract: with the default ``watermark_delay='0 seconds'``
    the state logic is EXACT — the watermark after any batch is >= that
    batch's max event time, so every surviving later event is strictly
    newer than the open session's end and sessions only ever extend
    forward (cross-batch out-of-order input is impossible by
    construction; the streaming result equals the batch sessionization,
    asserted against the DuckDB oracle). With a nonzero delay, events
    may arrive older than the open session's end; they are folded into
    the open session (counts stay right, boundaries follow min/max)
    but an out-of-order event older than ``session_start - gap`` would
    be merged rather than forming its own earlier session — if you need
    exact sessions under late arrivals, keep the delay at 0 and let the
    WAL's per-partition ordering (this engine's ingest contract)
    provide order."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark_delay)
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group(gap_sec),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
