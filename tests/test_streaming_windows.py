"""Event-time windowed aggregation under Structured Streaming with a
watermark — proving the batch window queries (q18-shape) run unchanged as
streams (SURVEY §2.9 / M6 unified-API claim)."""

import datetime as dt

from pyspark.sql import functions as F


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    rows = []
    base = dt.datetime(2026, 8, 13, 9, 0, 0)
    for i in range(100):
        rows.append((i, base + dt.timedelta(minutes=i), "click" if i % 2 else "view",
                     round(i * 0.5, 2)))
    schema = "event_id long, ts timestamp, event_type string, value double"
    batch_df = spark.createDataFrame(rows, schema)
    src = tmp_path / "events_src"
    batch_df.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    def agg(df):
        return (df.withWatermark("ts", "10 minutes") if df.isStreaming else df) \
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type") \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"))

    expected = {(r["w"]["start"], r["event_type"]): (r["n"], r["total"])
                for r in agg(batch_df).collect()}

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src) + "/*")
    q = (agg(stream)
         .writeStream.outputMode("complete")
         .format("memory").queryName("win_agg")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["w"]["start"], r["event_type"]): (r["n"], r["total"])
           for r in spark.sql("select * from win_agg").collect()}
    assert got == expected
    assert len(got) == 4                # 2 hours x 2 event types


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Gap-based session windows (q20-shape) under Structured Streaming:
    sessions that span micro-batch boundaries must merge exactly as the
    batch plan merges them."""
    base = dt.datetime(2026, 8, 13, 9, 0, 0)
    rows = []
    for u in range(5):
        t = base + dt.timedelta(minutes=u)
        for i in range(30):
            # bursts with 3-min steps inside, >10-min silences between
            t += dt.timedelta(minutes=3 if i % 6 else 25)
            rows.append((u * 100 + i, u, t, 1.0 * i))
    schema = "event_id long, user_id long, ts timestamp, value double"
    batch_df = spark.createDataFrame(rows, schema)
    src = tmp_path / "sw_src"
    # two files -> two micro-batches with availableNow + maxFilesPerTrigger
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], schema).coalesce(1) \
        .write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[half:], schema).coalesce(1) \
        .write.parquet(str(src / "b2"))

    def agg(df):
        return (df.withWatermark("ts", "1 hour") if df.isStreaming else df) \
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id") \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                 .alias("total"))

    expected = {(r["w"]["start"], r["w"]["end"], r["user_id"]): (r["n"], r["total"])
                for r in agg(batch_df).collect()}
    assert len(expected) > 5            # fixture yields multiple sessions

    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (agg(stream)
         .writeStream.outputMode("complete")
         .format("memory").queryName("sess_agg")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["w"]["start"], r["w"]["end"], r["user_id"]): (r["n"], r["total"])
           for r in spark.sql("select * from sess_agg").collect()}
    assert got == expected


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join (streaming/joins.py) produces the
    same view->click pairs as the identical batch join."""
    from tradingview_data_pipeline_spark.streaming.joins import view_click_stream_join

    base = dt.datetime(2026, 8, 13, 9, 0, 0)
    rows = []
    for i in range(200):
        rows.append((i, i % 5, base + dt.timedelta(minutes=i % 90),
                     "view" if i % 3 == 0 else "click", float(i % 7)))
    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    batch_df = spark.createDataFrame(rows, schema)
    src = tmp_path / "ss_src"
    batch_df.coalesce(2).write.mode("overwrite").parquet(str(src / "b1"))

    views_b = batch_df.where(F.col("event_type") == "view")
    clicks_b = batch_df.where(F.col("event_type") == "click")
    expected = {(r["view_id"], r["click_id"]) for r in
                view_click_stream_join(views_b, clicks_b).collect()}
    assert expected  # fixture must actually produce pairs

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src) + "/*")
    out = view_click_stream_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "click"))
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("ss_join")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["view_id"], r["click_id"]) for r in
           spark.sql("select * from ss_join").collect()}
    assert got == expected
