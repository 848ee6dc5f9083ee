"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY M6 extension — the escape hatch for semantics the built-in
windows can't express).

``running_entity_stats`` maintains per-key running aggregates (count,
sum, min/max event-time) across micro-batches with explicit state — the
streaming generalization of the reference's "accumulate per symbol over
repeated cron runs" pattern, but with state owned by the engine
(checkpointed, recoverable) instead of a database round trip per run.

State is a single tuple per key and is BOUNDED: the operator uses
``GroupStateTimeout.EventTimeTimeout`` with a watermark on ``ts``; a key
idle for ``session_gap`` past the watermark is evicted (``hasTimedOut``
branch removes its state), so counts restart from zero if the key
reappears later — the property the reference's grow-forever URL set lacks
(newsflow_scraper.py:243-272).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("first_ts", T.TimestampType()),
    T.StructField("last_ts", T.TimestampType()),
])

STATS_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("first_ts", T.LongType()),   # epoch micros
    T.StructField("last_ts", T.LongType()),
])

SESSION_GAP_MS_DEFAULT = 30 * 60 * 1000   # 30 minutes


def _make_update_fn(session_gap_ms: int):
    def _update_stats(key, pdf_iter: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: evict.
            # No row is emitted — the running aggregate was already emitted
            # on the batch that last touched the key.
            state.remove()
            return
        (n, total, first_us, last_us) = state.get if state.exists \
            else (0, 0.0, None, None)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_us = (pdf["ts"].astype("int64") // 1000)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        # evict once the watermark passes last event time + session gap
        state.setTimeoutTimestamp(last_us // 1000 + session_gap_ms)
        yield pd.DataFrame({
            "key": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        })
    return _update_stats


def running_entity_stats(events: DataFrame, key_col: str = "user_id", *,
                         watermark: str = "10 minutes",
                         session_gap_ms: int = SESSION_GAP_MS_DEFAULT) -> DataFrame:
    """events(user_id, ts, value) stream -> running per-key stats.

    Emits the updated running aggregate for every key touched in each
    micro-batch (update mode). Arrow-batched: one Python invocation per
    key-group per batch, not per row. A watermark on ``ts`` drives
    event-time timeouts: keys idle for ``session_gap_ms`` beyond the
    watermark are evicted, bounding total state by the active-key set.
    """
    return (
        events.selectExpr(f"{key_col} as key_in", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("key_in")
        .applyInPandasWithState(
            _make_update_fn(session_gap_ms),
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
