"""Unit tests for operators/timeseries.py: rolling indicator edges
(series head, exact SMA arithmetic) and pairwise Pearson (hand-checked
value, zero-variance and short-series guards)."""

import datetime as dt
import math

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import timeseries as tso


def _series(spark, vals, key=1):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, key, base + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")


def test_rolling_features_values_and_head_nulls(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0, 10.0, 0.0])
    out = {r["event_id"]: r for r in
           tso.rolling_features(df, "user_id", "ts", "value",
                                window_rows=3, momentum_lag=2,
                                tiebreak="event_id").collect()}
    assert out[0]["sma3"] == 1.0 and out[0]["momentum2"] is None
    assert out[1]["sma3"] == 1.5 and out[1]["momentum2"] is None
    assert out[2]["sma3"] == 2.0 and out[2]["momentum2"] == 2.0
    assert out[4]["sma3"] == (3.0 + 4.0 + 10.0) / 3
    assert out[4]["min3"] == 3.0 and out[4]["max3"] == 10.0
    assert out[4]["range3"] == 7.0
    assert out[5]["momentum2"] == -4.0


def test_rolling_features_partitions_do_not_leak(spark):
    a = _series(spark, [100.0, 100.0], key=1)
    b = _series(spark, [1.0, 1.0], key=2)
    out = tso.rolling_features(a.unionByName(b), "user_id", "ts", "value",
                               window_rows=5, momentum_lag=1,
                               tiebreak="event_id")
    got = {(r["user_id"], r["event_id"]): r["sma5"] for r in out.collect()}
    assert got[(2, 0)] == 1.0 and got[(1, 0)] == 100.0


def test_pairwise_pearson_exact_and_guards(spark):
    # x perfectly correlates with 2x, anti-correlates with -x + 10,
    # zero-variance column -> NULL
    rows = [(1, 2, 9, 5), (2, 4, 8, 5), (3, 6, 7, 5), (4, 8, 6, 5)]
    df = spark.createDataFrame(rows, "x long, y long, z long, c long")
    out = {(r["series_a"], r["series_b"]): r["corr"]
           for r in tso.pairwise_pearson_counts(df, ["x", "y", "z", "c"]).collect()}
    assert math.isclose(out[("x", "y")], 1.0)
    assert math.isclose(out[("x", "z")], -1.0)
    assert out[("x", "c")] is None          # zero variance
    assert out[("y", "c")] is None

    # hand-computed non-degenerate value: x=[1,2,3,4], w=[1,3,2,4]
    df2 = spark.createDataFrame([(1, 1), (2, 3), (3, 2), (4, 4)], "x long, w long")
    got = tso.pairwise_pearson_counts(df2, ["x", "w"]).collect()[0]["corr"]
    assert math.isclose(got, 0.8)

    # min_periods guard
    df3 = spark.createDataFrame([(1, 2)], "x long, w long")
    got3 = tso.pairwise_pearson_counts(df3, ["x", "w"]).collect()[0]
    assert got3["corr"] is None and got3["n_periods"] == 1


def test_ema_macd_matches_reference_recurrence(spark):
    # hand-rolled recurrence oracle (adjust=False): s1=x1,
    # st = a*xt + (1-a)*st-1
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0]
    df = _series(spark, vals)
    out = {r["event_id"]: r for r in
           tso.ema_macd(df, "user_id", "ts", "value",
                        fast=3, slow=5, signal=2,
                        tiebreak="event_id").collect()}
    af, as_, ag = 2.0 / 4.0, 2.0 / 6.0, 2.0 / 3.0
    ef = es = sig = None
    for i, x in enumerate(vals):
        ef = x if i == 0 else af * x + (1.0 - af) * ef
        es = x if i == 0 else as_ * x + (1.0 - as_) * es
        macd = ef - es
        sig = macd if i == 0 else ag * macd + (1.0 - ag) * sig
        r = out[i]
        assert r["ema_fast"] == ef and r["ema_slow"] == es
        assert r["macd"] == macd and r["macd_signal"] == sig
        assert r["macd_hist"] == macd - sig


def test_ema_macd_groups_isolated(spark):
    a = _series(spark, [5.0, 7.0], key=1)
    b = _series(spark, [100.0], key=2)
    out = {(r["user_id"], r["event_id"]): r["ema_fast"]
           for r in tso.ema_macd(a.unionByName(b), "user_id", "ts",
                                 "value", tiebreak="event_id").collect()}
    assert out[(2, 0)] == 100.0 and out[(1, 0)] == 5.0


def test_ema_macd_group_carry_across_arrow_batches(spark):
    # force tiny Arrow batches so one group straddles several mapInPandas
    # batches — exercises the carry buffer, not just the flush path
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        vals1 = [float(10 + (i * 7) % 11) for i in range(20)]
        vals2 = [float(5 + (i * 3) % 7) for i in range(8)]
        df = _series(spark, vals1, key=1).unionByName(_series(spark, vals2, key=2))
        got = {(r["user_id"], r["event_id"]): r for r in
               tso.ema_macd(df, "user_id", "ts", "value",
                            fast=3, slow=5, signal=2,
                            tiebreak="event_id").collect()}
        assert len(got) == 28
        for key_id, vals in ((1, vals1), (2, vals2)):
            af, as_, ag = 2.0 / 4.0, 2.0 / 6.0, 2.0 / 3.0
            ef = es = sig = None
            for i, x in enumerate(vals):
                ef = x if i == 0 else af * x + (1.0 - af) * ef
                es = x if i == 0 else as_ * x + (1.0 - as_) * es
                macd = ef - es
                sig = macd if i == 0 else ag * macd + (1.0 - ag) * sig
                r = got[(key_id, i)]
                assert r["ema_fast"] == ef and r["macd_signal"] == sig
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_resample_counts_fills_gaps(spark):
    import datetime as dt
    from tradingview_data_pipeline_spark.operators.timeseries import (
        resample_counts)

    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    rows = [("a", t0), ("a", t0 + dt.timedelta(hours=3)),   # 2 silent hours
            ("b", t0 + dt.timedelta(hours=1))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {(r["k"], r["period"].hour): r["n"]
           for r in resample_counts(df, "ts", "k").collect()}
    # dense: 4 periods x 2 keys
    assert len(got) == 8
    assert got[("a", 10)] == 1 and got[("a", 11)] == 0 \
        and got[("a", 12)] == 0 and got[("a", 13)] == 1
    assert got[("b", 11)] == 1 and sum(v for (k, _), v in got.items()
                                       if k == "b") == 1


def test_trailing_window_is_time_based_not_row_based(spark):
    import datetime as dt
    from tradingview_data_pipeline_spark.operators.timeseries import (
        trailing_window_stats)

    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    rows = [(1, t0, 1.0),
            (1, t0 + dt.timedelta(minutes=30), 2.0),
            (1, t0 + dt.timedelta(minutes=59, seconds=59), 4.0),
            (1, t0 + dt.timedelta(hours=2), 8.0)]          # old rows expire
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {r["ts"]: (r["n_trailing"], r["sum_trailing"])
           for r in trailing_window_stats(df, "k", "ts", "v",
                                          seconds=3600).collect()}
    assert got[t0] == (1, 1.0)
    assert got[t0 + dt.timedelta(minutes=30)] == (2, 3.0)
    assert got[t0 + dt.timedelta(minutes=59, seconds=59)] == (3, 7.0)
    # 2h later: every earlier row is outside the 3600 s frame
    assert got[t0 + dt.timedelta(hours=2)] == (1, 8.0)


def test_resample_counts_multi_unit_interval(spark):
    """Regression: counts must bucket by the SAME tumbling assignment
    as the spine — a base-unit date_trunc dropped every row not landing
    exactly on a multi-unit spine period."""
    import datetime as dt
    from tradingview_data_pipeline_spark.operators.timeseries import (
        resample_counts)

    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    rows = [("a", t0), ("a", t0 + dt.timedelta(minutes=20)),
            ("a", t0 + dt.timedelta(minutes=40))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r["period"].minute: r["n"]
           for r in resample_counts(df, "ts", "k",
                                    interval="15 minutes").collect()}
    # epoch-aligned 15-min buckets: 10:00 ->1, 10:15 ->1, 10:30 ->1, 10:45 absent
    assert got == {0: 1, 15: 1, 30: 1}
    assert sum(got.values()) == df.count()      # nothing silently dropped


def test_resample_counts_null_key_preserved(spark):
    import datetime as dt
    from tradingview_data_pipeline_spark.operators.timeseries import (
        resample_counts)

    t0 = dt.datetime(2026, 8, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [(None, t0), (None, t0), ("a", t0 + dt.timedelta(hours=1))],
        "k string, ts timestamp")
    got = {(r["k"], r["period"].hour): r["n"]
           for r in resample_counts(df, "ts", "k").collect()}
    assert got[(None, 10)] == 2 and got[(None, 11)] == 0
    assert got[("a", 10)] == 0 and got[("a", 11)] == 1
