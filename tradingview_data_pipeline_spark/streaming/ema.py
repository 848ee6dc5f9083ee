"""Streaming EMA/MACD via ``applyInPandasWithState`` — the live form of
``operators/timeseries.ema_macd`` (q63), maintaining the recurrence
state (ema_fast, ema_slow, macd_signal, last event time) per key across
micro-batches.

Semantics contract: the EMA recurrence is order-dependent, so the
operator processes each micro-batch's rows in (ts, event_id) order and
DROPS rows at-or-before the last processed (ts, event_id) high-water
mark (a late event cannot be retro-folded into an already-emitted EMA
without retracting downstream results — the documented trade; size the
watermark so the source delivers per-key-ordered data within it). The
mark is the full tiebreak tuple, not just ts: a distinct equal-timestamp
event that straddles a micro-batch boundary is still processed, exactly
as the batch operator's (ts, event_id) ordering would.  With in-order
delivery, emitted values are IDENTICAL to the batch operator on the
same prefix — pinned by tests/test_streaming_ema.py.

State is one fixed-size tuple per key — bounded by the active-key set;
an event-time timeout evicts keys idle past the watermark + gap, after
which a reappearing key restarts its EMA (same restart-from-first-value
convention as the batch operator on a fresh series).

CHECKPOINT COMPATIBILITY: ``EMA_STATE_SCHEMA`` grew a 5th field
(``last_eid``) in round 5. Structured Streaming does NOT migrate state
schemas — a checkpoint written by the 4-field version must be discarded
(start the query with a fresh ``checkpointLocation``); resuming it is
rejected by the state-store schema check rather than silently
misreading. ``_update`` also pads a 4-tuple defensively (last_eid=-1,
i.e. "replay any equal-ts event once") in case a state store delivers
the legacy shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUTPUT_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ema_fast", T.DoubleType()),
    T.StructField("ema_slow", T.DoubleType()),
    T.StructField("macd", T.DoubleType()),
    T.StructField("macd_signal", T.DoubleType()),
    T.StructField("macd_hist", T.DoubleType()),
])

EMA_STATE_SCHEMA = T.StructType([
    T.StructField("ema_fast", T.DoubleType()),
    T.StructField("ema_slow", T.DoubleType()),
    T.StructField("macd_signal", T.DoubleType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("last_eid", T.LongType()),
])

IDLE_EVICT_MS_DEFAULT = 60 * 60 * 1000    # 1 hour past watermark


def _make_update_fn(fast: int, slow: int, signal: int, idle_evict_ms: int):
    a_f, a_s, a_g = 2.0 / (fast + 1.0), 2.0 / (slow + 1.0), 2.0 / (signal + 1.0)

    def _update(key, pdf_iter: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            stored = tuple(state.get)
            if len(stored) == 4:       # legacy pre-last_eid state tuple
                stored += (-1,)
            ef, es, sig, last_us, last_eid = stored
        else:
            ef, es, sig, last_us, last_eid = None, None, None, -1, -1
        out_frames = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"],
                                  kind="mergesort").reset_index(drop=True)
            ts_us = (pdf["ts"].astype("int64") // 1000)
            # drop at-or-before the (ts, event_id) high-water mark —
            # equal-ts events with a NEW event_id are still in-order
            keep = (ts_us > last_us) | (
                (ts_us == last_us) & (pdf["event_id"] > last_eid))
            pdf, ts_us = pdf[keep.to_numpy()], ts_us[keep.to_numpy()]
            if not len(pdf):
                continue
            x = pdf["value"].astype("float64").to_numpy()
            n = len(x)
            col_ef, col_es = [0.0] * n, [0.0] * n
            col_m, col_sig = [0.0] * n, [0.0] * n
            for i in range(n):
                xi = x[i]
                ef = xi if ef is None else a_f * xi + (1.0 - a_f) * ef
                es = xi if es is None else a_s * xi + (1.0 - a_s) * es
                m = ef - es
                sig = m if sig is None else a_g * m + (1.0 - a_g) * sig
                col_ef[i], col_es[i], col_m[i], col_sig[i] = ef, es, m, sig
            last_us = int(ts_us.iloc[-1]) if hasattr(ts_us, "iloc") \
                else int(ts_us[-1])
            last_eid = int(pdf["event_id"].iloc[-1])
            out_frames.append(pd.DataFrame({
                "key": key[0],
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "value": x,
                "ema_fast": col_ef,
                "ema_slow": col_es,
                "macd": col_m,
                "macd_signal": col_sig,
                "macd_hist": [m - s for m, s in zip(col_m, col_sig)],
            }))
        if last_us >= 0 and ef is not None:
            state.update((float(ef), float(es), float(sig), int(last_us),
                          int(last_eid)))
            state.setTimeoutTimestamp(last_us // 1000 + idle_evict_ms)
        for f in out_frames:
            yield f

    return _update


def streaming_ema_macd(events: DataFrame, key_col: str = "user_id", *,
                       fast: int = 12, slow: int = 26, signal: int = 9,
                       watermark: str = "10 minutes",
                       idle_evict_ms: int = IDLE_EVICT_MS_DEFAULT) -> DataFrame:
    """events(key, event_id, ts, value) stream -> per-event EMA/MACD rows
    (append mode). One Arrow-batched Python call per key-group per
    micro-batch; state is one tuple per key, evicted on idle timeout."""
    return (
        events.selectExpr(f"{key_col} as key_in", "event_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("key_in")
        .applyInPandasWithState(
            _make_update_fn(fast, slow, signal, idle_evict_ms),
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
