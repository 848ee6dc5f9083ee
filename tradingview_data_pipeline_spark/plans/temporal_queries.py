"""Temporal-join queries over ``events``: as-of join (q45) and bucketed
interval join (q50).

Reference counterpart: the pandas jobs' "newest row at-or-before t per
symbol" lookups (``calcompositescore.py`` reads the latest technical
snapshot per symbol before scoring).  Here the same semantics run as
distributed one-shuffle plans — see ``operators/asof.py`` for the scale
analysis.

Oracle notes: the as-of oracle mirrors the union-tag + running
``last_value (IGNORE NULLS)`` construction in plain window SQL (DuckDB
ASOF JOIN leaves duplicate-timestamp picks unspecified, so we pin the
tie-break explicitly on both engines).  Sums of event values go through
DECIMAL(18,2) accumulators (the values are 2-dp) for order-independent
cross-engine equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import asof as aj
from tradingview_data_pipeline_spark.plans.analytics import register, _dsum
from tradingview_data_pipeline_spark.plans.events_queries import events


# ---------------------------------------------------------------------------
# q45 — as-of join: for each purchase, the latest click of the same user
# at-or-before the purchase time (union-tag + running last_value; one
# shuffle on user_id, no range fan-out).
# ---------------------------------------------------------------------------

_Q45_ASOF_SQL = """
WITH u AS (
  SELECT user_id, ts AS ord_ts, 0 AS side, event_id AS tb,
         event_id AS r_id, ts AS r_ts, value AS r_value,
         NULL::BIGINT AS l_event_id, NULL::TIMESTAMP AS l_ts,
         NULL::DOUBLE AS l_value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1, event_id, NULL, NULL, NULL, event_id, ts, value
  FROM events WHERE event_type = 'purchase'
), w AS (
  SELECT l_event_id, user_id, l_ts, l_value, side,
         last_value(r_id IGNORE NULLS) OVER win AS click_id_asof,
         last_value(r_ts IGNORE NULLS) OVER win AS click_ts_asof,
         last_value(r_value IGNORE NULLS) OVER win AS click_value_asof
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ord_ts, side, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l_event_id AS event_id, user_id, l_ts AS ts, l_value AS value,
       click_id_asof, click_ts_asof, click_value_asof
FROM w WHERE side = 1
"""


def _q45_asof_join(spark, sf_dir):
    e = events(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase") \
                 .select("event_id", "user_id", "ts", "value")
    clicks = e.where(F.col("event_type") == "click") \
              .select("user_id",
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("value").alias("click_value"))
    out = aj.asof_join(
        purchases, clicks, on="user_id",
        left_time="ts", right_time="click_ts",
        payload=["click_id", "click_ts", "click_value"],
        tiebreak="click_id",
    )
    return out.select("event_id", "user_id", "ts", "value",
                      F.col("click_id_asof"),
                      F.col("click_ts_asof"),
                      F.col("click_value_asof"))


# ---------------------------------------------------------------------------
# q50 — bucketed interval join: clicks landing inside each error event's
# 30-minute follow-up window, per user.  The Spark plan equi-joins on
# (user_id, 1800 s time bucket) — each interval covers <= 2 buckets — so
# the shuffle and per-task fan-out stay bounded at 100 TB, unlike a raw
# key-only join whose fan-out is every (error, click) pair per user.
# ---------------------------------------------------------------------------

_Q50_INTERVAL_SQL = """
SELECT i.event_id AS err_id, i.user_id,
       COUNT(*) AS n_clicks,
       MIN(p.ts) AS first_click_ts,
       MAX(p.ts) AS last_click_ts,
       CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value_sum
FROM events i
JOIN events p
  ON p.user_id = i.user_id
 AND i.event_type = 'error' AND p.event_type = 'click'
 AND p.ts >= i.ts AND p.ts <= i.ts + INTERVAL '30 minutes'
GROUP BY i.event_id, i.user_id
"""


@register("q45_temporal_joins", oracle=f"""
WITH ao AS ({_Q45_ASOF_SQL}), iv AS ({_Q50_INTERVAL_SQL})
SELECT 'asof' AS kind, event_id, user_id, ts, value AS v,
       click_id_asof AS ref_id, click_ts_asof AS ref_ts,
       click_value_asof AS ref_v,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS TIMESTAMP) AS ts2
FROM ao
UNION ALL
SELECT 'interval' AS kind, err_id AS event_id, user_id,
       first_click_ts AS ts, click_value_sum AS v,
       CAST(NULL AS BIGINT) AS ref_id, CAST(NULL AS TIMESTAMP) AS ref_ts,
       CAST(NULL AS DOUBLE) AS ref_v,
       n_clicks AS n, last_click_ts AS ts2
FROM iv
""")
def q45_temporal_joins(spark, sf_dir):
    """Tagged union (round-6 consolidation #6, COVERAGE.md map): 'asof'
    — as-of join (latest click at-or-before each purchase; union-tag +
    running last_value, one shuffle, no range fan-out); 'interval' —
    bucketed interval join (clicks inside each error's 30-minute
    follow-up window; equi-join on (user_id, 1800 s bucket) keeps the
    fan-out bounded at 100 TB)."""
    asof = _q45_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("kind"), "event_id", "user_id", "ts",
        F.col("value").alias("v"),
        F.col("click_id_asof").alias("ref_id"),
        F.col("click_ts_asof").alias("ref_ts"),
        F.col("click_value_asof").alias("ref_v"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("timestamp").alias("ts2"))
    iv = _q50_interval_join(spark, sf_dir).select(
        F.lit("interval").alias("kind"),
        F.col("err_id").alias("event_id"), "user_id",
        F.col("first_click_ts").alias("ts"),
        F.col("click_value_sum").alias("v"),
        F.lit(None).cast("bigint").alias("ref_id"),
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(None).cast("double").alias("ref_v"),
        F.col("n_clicks").alias("n"),
        F.col("last_click_ts").alias("ts2"))
    return asof.unionByName(iv)


def _q50_interval_join(spark, sf_dir):
    e = events(spark, sf_dir)
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("err_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("err_end"))
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"))
    pairs = aj.interval_join_bucketed(
        errors, clicks, on="user_id",
        start="err_start", end="err_end", point_time="click_ts",
        bucket_seconds=1800)
    return (pairs.groupBy("err_id", "user_id")
            .agg(F.count(F.lit(1)).alias("n_clicks"),
                 F.min("click_ts").alias("first_click_ts"),
                 F.max("click_ts").alias("last_click_ts"),
                 _dsum(F.col("click_value"), scale="18,2")
                 .alias("click_value_sum")))


# (q56_sessionize merged into events_queries.q20_sessionization as the
# 'gaps' leg — round-9 consolidation #19; operators/asof.sessionize keeps
# its own oracle-equivalent coverage through that leg and the gap-edge
# parity pytest.)


# ---------------------------------------------------------------------------
# (q57_cohort_retention merged into q39_user_behavior's 'retention' leg,
# round 11 — slot reused by q84_video_neardup; COVERAGE.md merge #21)
# ---------------------------------------------------------------------------
