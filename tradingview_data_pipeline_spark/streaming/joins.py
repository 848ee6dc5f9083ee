"""Watermarked stream-stream join: the streaming form of the batch
funnel / interval join (q39 / q50).

Structured Streaming keeps both sides' unmatched rows in state; the
join is only safe unbounded if (a) both sides carry a watermark and
(b) the join condition bounds event time on both sides (here: click
within [view_ts, view_ts + window]).  Spark derives the state
retention from exactly those two constraints — old state is evicted
once the watermark passes the upper time bound, so state size is
O(rows inside the watermark horizon), not O(stream).

At scale the join keys partition the state store (user_id here), so
state shards across executors like any keyed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_stream_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pairs each view with the same user's clicks inside ``within``.

    Works identically on batch DataFrames (watermarks become no-ops),
    which is how the equivalence test pins the semantics.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"))
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (v["user_id"] == c["c_user_id"])
        & (c["click_ts"] > v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return v.join(c, cond).select(
        "user_id", "view_id", "view_ts", "click_id", "click_ts")
