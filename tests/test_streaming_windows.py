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
