"""Streaming EMA/MACD ≡ batch ema_macd across micro-batch boundaries,
plus the late-event drop contract."""

import datetime as dt

from tradingview_data_pipeline_spark.operators.timeseries import ema_macd
from tradingview_data_pipeline_spark.streaming.ema import streaming_ema_macd

SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def _batch(rows, spark, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _run(out, tmp_path, captured):
    q = (out.writeStream.outputMode("append")
         .foreachBatch(lambda b, _id: captured.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_streaming_ema_equals_batch_across_microbatches(spark, tmp_path):
    t0 = dt.datetime(2026, 8, 13, 12, 0, 0)
    rows = [(u, i, t0 + dt.timedelta(minutes=i), float(10 + (i * 7) % 5 + u))
            for u in (1, 2) for i in range(8)]
    # state must carry across micro-batches: split each user's series
    src = tmp_path / "ev"
    src.mkdir()
    _batch([r for r in rows if r[1] < 4], spark, str(src / "b1"))
    _batch([r for r in rows if r[1] >= 4], spark, str(src / "b2"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    captured = []
    _run(streaming_ema_macd(stream, fast=3, slow=5, signal=2), tmp_path, captured)
    got = {(r["key"], r["event_id"]): r for r in captured}

    expected = {(r["user_id"], r["event_id"]): r for r in
                ema_macd(spark.createDataFrame(rows, SCHEMA), "user_id", "ts",
                         "value", fast=3, slow=5, signal=2,
                         tiebreak="event_id").collect()}
    assert set(got) == set(expected)
    for k, e in expected.items():
        g = got[k]
        for c in ("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist"):
            assert g[c] == e[c], (k, c)


def test_streaming_ema_equal_ts_across_batch_boundary(spark, tmp_path):
    # a DISTINCT event with the same timestamp as the last processed one,
    # arriving in the next micro-batch, must be processed (high-water mark
    # is the (ts, event_id) tuple, not ts alone) — matching the batch
    # operator's (ts, event_id) tiebreak order
    t0 = dt.datetime(2026, 8, 13, 12, 0, 0)
    tE = t0 + dt.timedelta(minutes=5)
    src = tmp_path / "ev"
    src.mkdir()
    _batch([(1, 0, t0, 10.0), (1, 1, tE, 20.0)], spark, str(src / "b1"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    captured = []
    _run(streaming_ema_macd(stream, fast=3, slow=5, signal=2), tmp_path, captured)

    # same ts as event 1, higher event_id, next batch -> must NOT be
    # dropped; a re-delivered duplicate (same ts AND same-or-lower id) must
    _batch([(1, 2, tE, 30.0), (1, 1, tE, 20.0)], spark, str(src / "b2"))
    _run(streaming_ema_macd(stream, fast=3, slow=5, signal=2), tmp_path, captured)
    ids = sorted(r["event_id"] for r in captured)
    assert ids == [0, 1, 2]

    rows = [(1, 0, t0, 10.0), (1, 1, tE, 20.0), (1, 2, tE, 30.0)]
    expected = {r["event_id"]: r for r in
                ema_macd(spark.createDataFrame(rows, SCHEMA), "user_id", "ts",
                         "value", fast=3, slow=5, signal=2,
                         tiebreak="event_id").collect()}
    for r in captured:
        for c in ("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist"):
            assert r[c] == expected[r["event_id"]][c], (r["event_id"], c)


def test_streaming_ema_drops_late_events(spark, tmp_path):
    t0 = dt.datetime(2026, 8, 13, 12, 0, 0)
    src = tmp_path / "ev"
    src.mkdir()
    _batch([(1, 0, t0, 10.0), (1, 1, t0 + dt.timedelta(minutes=5), 20.0)],
           spark, str(src / "b1"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    captured = []
    _run(streaming_ema_macd(stream, fast=3, slow=5, signal=2), tmp_path, captured)

    # second run, same checkpoint: event_id 9 arrives EARLIER than the
    # last processed ts -> must be dropped, not folded out of order
    _batch([(1, 9, t0 + dt.timedelta(minutes=1), 99.0),
            (1, 2, t0 + dt.timedelta(minutes=6), 30.0)],
           spark, str(src / "b2"))
    _run(streaming_ema_macd(stream, fast=3, slow=5, signal=2), tmp_path, captured)
    ids = sorted(r["event_id"] for r in captured)
    assert ids == [0, 1, 2]
    # surviving rows equal the batch recurrence over the in-order prefix
    rows = [(1, 0, t0, 10.0), (1, 1, t0 + dt.timedelta(minutes=5), 20.0),
            (1, 2, t0 + dt.timedelta(minutes=6), 30.0)]
    expected = {r["event_id"]: r for r in
                ema_macd(spark.createDataFrame(rows, SCHEMA), "user_id", "ts",
                         "value", fast=3, slow=5, signal=2,
                         tiebreak="event_id").collect()}
    for r in captured:
        assert r["ema_fast"] == expected[r["event_id"]]["ema_fast"]
