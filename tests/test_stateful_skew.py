"""applyInPandasWithState running stats across micro-batches + skew helpers."""

import datetime as dt

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators.skew import (
    salted_aggregate, salted_broadcast_left,
)
from tradingview_data_pipeline_spark.streaming.stateful import running_entity_stats

SCHEMA = "user_id long, ts timestamp, value double"


def _batch(rows, spark, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def test_running_entity_stats_state_across_batches(spark, tmp_path):
    t0 = dt.datetime(2026, 8, 13, 12, 0, 0)
    src = tmp_path / "ev"
    src.mkdir()
    _batch([(1, t0, 10.0), (1, t0 + dt.timedelta(minutes=1), 5.0),
            (2, t0, 1.0)], spark, str(src / "b1"))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    out = running_entity_stats(stream)

    def run_once():
        captured = []
        q = (out.writeStream.outputMode("update")
             .foreachBatch(lambda b, _id: captured.extend(b.collect()))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["key"]: r for r in captured}

    got = run_once()
    assert got[1]["n_events"] == 2 and got[1]["total_value"] == 15.0
    assert got[2]["n_events"] == 1

    # second batch: state must carry over (user 1 accumulates)
    _batch([(1, t0 + dt.timedelta(minutes=5), 2.5)], spark, str(src / "b2"))
    got2 = run_once()
    assert got2[1]["n_events"] == 3 and got2[1]["total_value"] == 17.5
    assert got2[1]["first_ts"] == t0
    assert got2[1]["last_ts"] == t0 + dt.timedelta(minutes=5)
    assert 2 not in got2          # untouched key not re-emitted in update mode


def test_running_entity_stats_event_time_eviction(spark, tmp_path):
    """Idle keys are evicted once the watermark passes last_ts + gap:
    a key reappearing after the session gap restarts from zero."""
    t0 = dt.datetime(2026, 8, 13, 12, 0, 0)
    src = tmp_path / "ev2"
    src.mkdir()

    stream = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    out = running_entity_stats(stream, watermark="10 minutes",
                               session_gap_ms=30 * 60 * 1000)

    def run_once():
        captured = []
        q = (out.writeStream.outputMode("update")
             .foreachBatch(lambda b, _id: captured.extend(b.collect()))
             .option("checkpointLocation", str(tmp_path / "ck2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r["key"]: r for r in captured}

    _batch([(1, t0, 10.0)], spark, str(src / "b1"))
    got = run_once()
    assert got[1]["n_events"] == 1

    # advance the watermark far past key 1's (t0 + 30min) timeout via key 2
    _batch([(2, t0 + dt.timedelta(hours=2), 1.0)], spark, str(src / "b2"))
    run_once()
    _batch([(2, t0 + dt.timedelta(hours=3), 1.0)], spark, str(src / "b3"))
    got3 = run_once()
    assert got3[2]["n_events"] == 2          # key 2 accumulated
    assert 1 not in got3                     # eviction emits no row

    # key 1 returns after the gap: state restarted, not carried over
    _batch([(1, t0 + dt.timedelta(hours=4), 7.0)], spark, str(src / "b4"))
    got4 = run_once()
    assert got4[1]["n_events"] == 1 and got4[1]["total_value"] == 7.0
    assert got4[1]["first_ts"] == t0 + dt.timedelta(hours=4)


def test_salted_aggregate_matches_plain(spark):
    rows = [(1, float(i)) for i in range(1000)] + [(2, 1.0)] * 10
    df = spark.createDataFrame(rows, "k long, v double")
    got = {r["k"]: (r["n"], r["total"], r["mx"]) for r in
           salted_aggregate(df, "k", {"n": "count", "total": "sum:v", "mx": "max:v"},
                            buckets=8).collect()}
    exp = {r["k"]: (r["n"], r["total"], r["mx"]) for r in
           df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                               F.sum("v").alias("total"),
                               F.max("v").alias("mx")).collect()}
    assert got == exp


def test_salted_broadcast_left_matches_plain(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)], "k long, payload int")
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k long, name string")
    got = salted_broadcast_left(fact, dim, "k", buckets=4).groupBy("k", "name").count()
    exp = fact.join(dim, "k", "left").groupBy("k", "name").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
