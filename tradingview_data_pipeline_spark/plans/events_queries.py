"""Event-time window queries over the ``events`` table (SURVEY §2.9 —
the streaming-shaped semantics; same DataFrame code works under
Structured Streaming with a watermark, see ``streaming/``).

The events parquet has carried ``ts`` as either TIMESTAMP(NANOS) (which
Spark's reader only accepts as long, via the legacy conf) or plain
``timestamp[us]`` (loaded as TIMESTAMP_NTZ). ``events()`` adapts to
whichever physical type the file declares: the conf is set *before* the
read (it is only consulted for nanos columns and is a no-op otherwise),
then we branch on the loaded dtype — a BIGINT ``ts`` is nanos and gets
truncated to microseconds (what DuckDB's reader does natively), a real
timestamp passes through untouched. TIMESTAMP_NTZ is kept as-is: it
matches DuckDB's tz-naive TIMESTAMP, so both engines see identical µs
timestamps either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.plans.analytics import register, _dsum


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Must be set before the read: only consulted when the parquet column
    # is physically TIMESTAMP(NANOS); harmless for µs files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":  # nanos-as-long → truncate to µs
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


# ---------------------------------------------------------------------------
# q18 — event-time windows, both shapes tagged and unioned (Structured
# Streaming shapes; batch equivalence): tumbling 1 h windows per
# event_type, and sliding 1 h windows with a 15 min slide (each event
# lands in 4 windows; the oracle replicates via an offset cross join).
# Consolidates the former q18 + q19.
# ---------------------------------------------------------------------------

@register("q18_event_windows", oracle="""
WITH base AS (
  SELECT date_trunc('minute', ts)
           - (CAST(EXTRACT(minute FROM ts) AS INT) % 15) * INTERVAL '1 minute' AS floor15,
         value
  FROM events
), js AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
         COUNT(*) AS n
  FROM events
  GROUP BY event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
), mo AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         o_orderpriority,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders
  GROUP BY date_trunc('month', o_orderdate), o_orderpriority
)
SELECT 'tumbling' AS kind, event_type AS g1, CAST(NULL AS BIGINT) AS b,
       date_trunc('hour', ts) AS ts, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events
GROUP BY date_trunc('hour', ts), event_type
UNION ALL
SELECT 'sliding', NULL::VARCHAR, CAST(NULL AS BIGINT),
       floor15 - k.k * INTERVAL '15 minutes', COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM base CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
GROUP BY 4
UNION ALL
SELECT 'json', event_type, k_bucket, CAST(NULL AS TIMESTAMP), n,
       CAST(NULL AS DOUBLE)
FROM js
UNION ALL
SELECT 'monthly', o_orderpriority, CAST(NULL AS BIGINT), month, n_orders,
       total_price
FROM mo
""")
def q18_event_windows(spark, sf_dir):
    """Four-leg tagged union (round-11 consolidation of q18 + q21, freeing
    the slot for q83_multimodal_codecs — COVERAGE.md headroom map):
    'tumbling'/'sliding' — event-time windowed aggregates (the former
    q18); 'json' — JSON property extraction + bucket count (scalar JSON
    family); 'monthly' — calendar rollup on the orders fact (F14).
    Unified schema (kind, g1, b, ts, n, total)."""
    e = events(spark, sf_dir)
    tumbling = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("value"), scale="18,2").alias("total"))
        .select(F.lit("tumbling").alias("kind"),
                F.col("event_type").alias("g1"),
                F.lit(None).cast("bigint").alias("b"),
                F.col("w.start").alias("ts"), "n", "total")
    )
    sliding = (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("value"), scale="18,2").alias("total"))
        .select(F.lit("sliding").alias("kind"),
                F.lit(None).cast("string").alias("g1"),
                F.lit(None).cast("bigint").alias("b"),
                F.col("w.start").alias("ts"), "n", "total")
    )
    k = F.get_json_object("props", "$.k").cast("bigint")
    js = (
        e.groupBy("event_type", (k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("json").alias("kind"),
                F.col("event_type").alias("g1"),
                F.col("k_bucket").alias("b"),
                F.lit(None).cast("timestamp").alias("ts"),
                "n", F.lit(None).cast("double").alias("total"))
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    mo = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"),
                  "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             _dsum(F.col("o_totalprice"), scale="18,2").alias("total"))
        .select(F.lit("monthly").alias("kind"),
                F.col("o_orderpriority").alias("g1"),
                F.lit(None).cast("bigint").alias("b"),
                F.col("month").alias("ts"), "n", "total")
    )
    return tumbling.unionByName(sliding).unionByName(js).unionByName(mo)


# ---------------------------------------------------------------------------
# q20 — sessionization, tagged union (round-9 consolidation of q20+q56;
# see COVERAGE.md headroom map). Two physical strategies for the same
# 30-minute-gap session semantics over events, in ONE row set:
#   'window' — Spark's built-in F.session_window grouping (the
#              Structured Streaming shape), per-user session event
#              counts + exact decimal value sums;
#   'gaps'   — the lag + running-sum gaps-and-islands operator
#              (operators/asof.sessionize: one key-partitioned window,
#              both functions share the sort, single shuffle), emitting
#              the 1-based session_seq and the session span.
# Boundary convention (both legs): an event at exactly prev + 30 min
# CONTINUES the session — session_window merges gap <= 30 min INCLUSIVE
# (empirically pinned by the gap-edge parity test in
# tests/test_temporal_corpus_vectors.py); the oracle flags a new
# session only at gap > 30 min — same boundary. (Round 2 had `>=` here,
# unfalsified only because the synthetic events carry
# microsecond-random timestamps with no exact 30:00 gaps.)
# Unified schema (kind, user_id, session_start, n_events, v1, v2):
# 'window' carries v1 = total_value (DECIMAL-exact sum), v2 NULL;
# 'gaps' carries v1 = session_seq, v2 = span in microseconds (exact:
# epoch-µs differences are < 2^53, so the double is lossless).
# ---------------------------------------------------------------------------

@register("q20_sessionization", oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
), win AS (
  SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM sessions
  GROUP BY user_id, sid
), g_flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g_sessions AS (
  SELECT user_id, ts,
         CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM g_flagged
), gaps AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM g_sessions GROUP BY user_id, session_seq
)
SELECT 'window' AS kind, user_id, session_start, n_events,
       total_value AS v1, NULL::DOUBLE AS v2
FROM win
UNION ALL
SELECT 'gaps', user_id, session_start, n_events,
       CAST(session_seq AS DOUBLE),
       CAST(epoch_us(session_end) - epoch_us(session_start) AS DOUBLE)
FROM gaps
""")
def q20_sessionization(spark, sf_dir):
    e = events(spark, sf_dir)
    win = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             _dsum(F.col("value"), scale="18,2").alias("v1"))
        .select(F.lit("window").alias("kind"), "user_id",
                F.col("w.start").alias("session_start"), "n_events", "v1",
                F.lit(None).cast("double").alias("v2"))
    )
    from tradingview_data_pipeline_spark.operators import asof as aj
    s = aj.sessionize(e.select("user_id", "event_id", "ts"),
                      "user_id", "ts", gap="30 minutes",
                      tiebreak="event_id")
    gaps = (s.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .select(F.lit("gaps").alias("kind"), "user_id",
                    "session_start", "n_events",
                    F.col("session_seq").cast("double").alias("v1"),
                    F.expr("timestampdiff(MICROSECOND, session_start, "
                           "session_end)")
                    .cast("double").alias("v2")))
    return win.unionByName(gaps)


# ---------------------------------------------------------------------------
# (q21_events_shapes merged into q18_event_windows's 'json'/'monthly'
# legs, round 11 — slot reused by q83_multimodal_codecs; COVERAGE.md map)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# q39 — user-behavior shapes, tagged union (round-11 registry merge #21:
# q39 funnel + q57 cohort retention — they share the per-user event
# scan; slot freed for q84_video_neardup).
#   'funnel': per user, 'view' events followed by a 'click' within 30
#     minutes (temporal range self-join; at scale both sides
#     pre-bucketed by user_id).
#   'retention': users grouped by first-activity week, distinct active
#     users per week offset as columns w0..w5 (declared-value pivot —
#     one aggregate, no values-discovery scan).
# Shared schema (kind, g, key_ts, n1..n6): funnel rows carry
# (user_id, first_conversion_ts, pairs, converting_views, NULLs);
# retention rows carry (NULL, cohort_week, w0..w5).
# ---------------------------------------------------------------------------

_WEEK_OFFSETS = [0, 1, 2, 3, 4, 5]

@register("q39_user_behavior", oracle=f"""
WITH funnel AS (
  SELECT v.user_id AS g,
         MIN(c.ts) AS key_ts,
         COUNT(*) AS n1,
         COUNT(DISTINCT v.event_id) AS n2
  FROM events v
  JOIN events c
    ON c.user_id = v.user_id
   AND v.event_type = 'view' AND c.event_type = 'click'
   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '30 minutes'
  GROUP BY v.user_id
), firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
  FROM events
), j AS (
  SELECT f.cohort_week, a.user_id,
         CAST(floor((epoch(a.act_week) - epoch(f.cohort_week)) / 604800.0)
              AS BIGINT) AS week_offset
  FROM act a JOIN firsts f USING (user_id)
), retention AS (
  SELECT cohort_week,
         {", ".join(f"COUNT(DISTINCT user_id) FILTER (WHERE week_offset = {k}) AS w{k}"
                    for k in _WEEK_OFFSETS)}
  FROM j GROUP BY cohort_week
)
SELECT 'funnel' AS kind, g, key_ts, n1, n2,
       CAST(NULL AS BIGINT) AS n3, CAST(NULL AS BIGINT) AS n4,
       CAST(NULL AS BIGINT) AS n5, CAST(NULL AS BIGINT) AS n6
FROM funnel
UNION ALL
SELECT 'retention' AS kind, CAST(NULL AS BIGINT) AS g,
       cohort_week AS key_ts, w0 AS n1, w1 AS n2, w2 AS n3,
       w3 AS n4, w4 AS n5, w5 AS n6
FROM retention
""")
def q39_user_behavior(spark, sf_dir):
    e = events(spark, sf_dir)

    v = e.where(F.col("event_type") == "view") \
         .select(F.col("user_id"), F.col("event_id").alias("view_id"),
                 F.col("ts").alias("v_ts"))
    c = e.where(F.col("event_type") == "click") \
         .select(F.col("user_id"), F.col("ts").alias("c_ts"))
    joined = v.join(c, "user_id").where(
        (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")))
    nulls = [F.lit(None).cast("bigint").alias(f"n{k}") for k in range(3, 7)]
    funnel = (joined.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n1"),
                   F.countDistinct("view_id").alias("n2"),
                   F.min("c_ts").alias("key_ts"))
              .select(F.lit("funnel").alias("kind"),
                      F.col("user_id").alias("g"), "key_ts",
                      "n1", "n2", *nulls))

    firsts = (e.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    act = e.select("user_id",
                   F.date_trunc("week", F.col("ts")).alias("act_week")) \
           .distinct()
    off = F.floor(
        (F.unix_timestamp("act_week") - F.unix_timestamp("cohort_week"))
        / F.lit(604800.0)).cast("bigint")
    long = act.join(firsts, "user_id").withColumn("week_offset", off)
    wide = (long.groupBy("cohort_week")
            .pivot("week_offset", _WEEK_OFFSETS)
            .agg(F.countDistinct("user_id")))
    retention = wide.select(
        F.lit("retention").alias("kind"),
        F.lit(None).cast("bigint").alias("g"),
        F.col("cohort_week").alias("key_ts"),
        *[F.coalesce(F.col(str(k)), F.lit(0)).alias(f"n{k + 1}")
          for k in _WEEK_OFFSETS])

    return funnel.unionByName(retention)
