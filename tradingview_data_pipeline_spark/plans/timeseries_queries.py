"""Time-series queries over ``events``: rolling technical indicators
(q60), exact pairwise activity correlation (q61), and the EMA/MACD
family as a recurrence with a recursive-CTE oracle (q63).

Reference counterpart: the scoring jobs consume a moving-average /
momentum / MACD indicator family as input columns
(calcompositescore.py's ``sma20``/``ema``-era technicals;
functions/cleaning.py's MACD histogram) — q60/q63 produce that family
inside the engine.  q61 is the cross-sectional analysis layer on top
(which activity streams move together), kept integer-exact so it
oracle-checks bit-for-bit.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import timeseries as tso
from tradingview_data_pipeline_spark.plans.analytics import register
from tradingview_data_pipeline_spark.plans.events_queries import events


# ---------------------------------------------------------------------------
# q60 — rolling indicators per user stream: 5-row SMA (DECIMAL sum /
# exact count), rolling min/max/range, 3-row momentum.  One shuffle on
# user_id; every frame shares the (ts, event_id) sort.
# ---------------------------------------------------------------------------

def _q60_oracle() -> str:
    rolling = """
SELECT 'rolling' AS kind, CAST(user_id AS VARCHAR) AS key_a,
       CAST(NULL AS VARCHAR) AS key_b, event_id, ts,
       CAST(NULL AS BIGINT) AS n,
       value AS v1,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w5 AS DOUBLE)
         / COUNT(value) OVER w5 AS v2,
       MIN(value) OVER w5 AS v3,
       MAX(value) OVER w5 AS v4,
       MAX(value) OVER w5 - MIN(value) OVER w5 AS v5,
       value - lag(value, 3) OVER wo AS v6
FROM events
WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       wo AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
    corr = """
SELECT 'corr' AS kind, series_a AS key_a, series_b AS key_b,
       CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts,
       n_periods AS n, corr AS v1,
       CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3,
       CAST(NULL AS DOUBLE) AS v4, CAST(NULL AS DOUBLE) AS v5,
       CAST(NULL AS DOUBLE) AS v6
FROM ({}) __corr
""".format(_q61_oracle())
    return rolling + " UNION ALL " + corr


def q60_timeseries_stats(spark, sf_dir):
    """Tagged union (round-6 consolidation #4 of the COVERAGE.md map):
    'rolling' — per-stream rolling indicators (5-row SMA via DECIMAL
    sum / exact count, rolling min/max/range, 3-row momentum; one
    shuffle on user_id, every frame shares the (ts, event_id) sort);
    'corr' — exact pairwise Pearson of hourly event-type activity
    (dense declared pivot -> one BIGINT-sums aggregate -> 10 pair
    rows; integer arithmetic until the closing IEEE divide/sqrt)."""
    e = events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    roll = tso.rolling_features(e, "user_id", "ts", "value",
                                window_rows=5, momentum_lag=3,
                                tiebreak="event_id")
    roll = roll.select(
        F.lit("rolling").alias("kind"),
        F.col("user_id").cast("string").alias("key_a"),
        F.lit(None).cast("string").alias("key_b"),
        "event_id", "ts", F.lit(None).cast("bigint").alias("n"),
        F.col("value").alias("v1"), F.col("sma5").alias("v2"),
        F.col("min5").alias("v3"), F.col("max5").alias("v4"),
        F.col("range5").alias("v5"), F.col("momentum3").alias("v6"))
    corr = _q61_event_correlation(spark, sf_dir).select(
        F.lit("corr").alias("kind"),
        F.col("series_a").alias("key_a"), F.col("series_b").alias("key_b"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("n_periods").alias("n"), F.col("corr").alias("v1"),
        *[F.lit(None).cast("double").alias(f"v{i}") for i in range(2, 7)])
    return roll.unionByName(corr)


# ---------------------------------------------------------------------------
# q61 — pairwise Pearson correlation of hourly event-type activity:
# hourly dense counts (declared pivot, zero-filled) -> ONE aggregate of
# BIGINT sums -> 10 pair rows.  Integer arithmetic until the closing
# IEEE divide/sqrt, so the oracle hash-matches exactly.
# ---------------------------------------------------------------------------

_ETYPES = ["click", "error", "purchase", "signup", "view"]


def _q61_oracle() -> str:
    cnt_cols = ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS c_{t}" for t in _ETYPES)
    sums = ["COUNT(*) AS n"]
    for t in _ETYPES:
        sums.append(f"SUM(c_{t}) AS s_{t}")
        sums.append(f"SUM(c_{t} * c_{t}) AS ss_{t}")
    for a, b in combinations(_ETYPES, 2):
        sums.append(f"SUM(c_{a} * c_{b}) AS p_{a}_{b}")
    pair_rows = []
    for a, b in combinations(_ETYPES, 2):
        corr = (f"CASE WHEN n >= 2 AND n * ss_{a} - s_{a} * s_{a} > 0 "
                f"AND n * ss_{b} - s_{b} * s_{b} > 0 "
                f"THEN CAST(n * p_{a}_{b} - s_{a} * s_{b} AS DOUBLE) "
                f"/ (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE)) "
                f"* sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))) "
                f"ELSE NULL END")
        pair_rows.append(
            f"SELECT '{a}' AS series_a, '{b}' AS series_b, "
            f"CAST(n AS BIGINT) AS n_periods, {corr} AS corr FROM s")
    return (f"WITH hourly AS (SELECT date_trunc('hour', ts) AS h, {cnt_cols} "
            f"FROM events GROUP BY 1), "
            f"s AS (SELECT {', '.join(sums)} FROM hourly) "
            + " UNION ALL ".join(pair_rows))


def _q61_event_correlation(spark, sf_dir):
    e = events(spark, sf_dir)
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"))
              .pivot("event_type", _ETYPES)
              .agg(F.count(F.lit(1))))
    hourly = hourly.select(
        "h", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _ETYPES])
    return tso.pairwise_pearson_counts(hourly, _ETYPES)


# Registration happens here because _q60_oracle() embeds _q61_oracle()
# (defined above) as the 'corr' leg.
register("q60_timeseries_stats", oracle=_q60_oracle())(q60_timeseries_stats)


# ---------------------------------------------------------------------------
# q63 — EMA(12)/EMA(26)/MACD/signal(9)/histogram per user stream.  The
# Spark side is the applyInPandas recurrence (operators/timeseries.
# ema_macd — the escape hatch for order-dependent state); the oracle
# expresses the SAME recurrence as a DuckDB RECURSIVE CTE stepping
# row_number-ordered events.  Both sides evaluate α·x + (1−α)·s with
# identical literals and association order, so every intermediate double
# is bit-identical and the value hash matches exactly — a rare case of a
# sequential recurrence with a full SQL oracle (not rows-only).
# Recursion depth = max events per key (≤ 86 at the gate's sf0.01).
# ---------------------------------------------------------------------------

_AF, _AS_, _AG = "(2.0/13.0)", "(2.0/27.0)", "(2.0/10.0)"
_NEW_EF = f"{_AF} * b.value + (1.0 - {_AF}) * r.ema_fast"
_NEW_ES = f"{_AS_} * b.value + (1.0 - {_AS_}) * r.ema_slow"
_NEW_MACD = f"({_NEW_EF}) - ({_NEW_ES})"

@register("q63_ema_macd", oracle=f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT user_id, event_id, ts, value, rn,
         value AS ema_fast, value AS ema_slow,
         CAST(0.0 AS DOUBLE) AS macd, CAST(0.0 AS DOUBLE) AS macd_signal
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.event_id, b.ts, b.value, b.rn,
         {_NEW_EF},
         {_NEW_ES},
         {_NEW_MACD},
         {_AG} * ({_NEW_MACD}) + (1.0 - {_AG}) * r.macd_signal
  FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT user_id, event_id, ts, value, ema_fast, ema_slow, macd, macd_signal,
       macd - macd_signal AS macd_hist
FROM rec
""")
def q63_ema_macd(spark, sf_dir):
    e = events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    return tso.ema_macd(e, "user_id", "ts", "value",
                        fast=12, slow=26, signal=9, tiebreak="event_id")


# ---------------------------------------------------------------------------
# q69 — temporal density, tagged union (slot freed by the q45+q50
# merge):
#   'gap_fill' — dense hourly counts per event type including EMPTY
#                hours (timeseries.resample_counts: one tiny (min,max)
#                aggregate builds the spine, broadcast key domain,
#                left-join zero-fill — spine cost is periods, not fact
#                size).
#   'trailing' — time-based RANGE-frame trailing hour per user
#                (timeseries.trailing_window_stats: count + exact
#                decimal sum over the last 3600 s, frame bounds by
#                epoch-second value, which ROWS frames can't express).
# Epoch ordering is integer seconds on both engines (Spark
# unix_timestamp truncates; the oracle floors epoch()) so frame
# membership is identical.
# ---------------------------------------------------------------------------

@register("q69_temporal_density", oracle="""
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
), spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS period FROM b
), types AS (SELECT DISTINCT event_type FROM events),
cnt AS (
  SELECT date_trunc('hour', ts) AS period, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), gap AS (
  SELECT s.period, t.event_type, COALESCE(cnt.n, 0) AS n
  FROM spine s CROSS JOIN types t
  LEFT JOIN cnt ON cnt.period = s.period AND cnt.event_type = t.event_type
), tr AS (
  SELECT user_id, ts, value,
         COUNT(*) OVER w AS n_trailing,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
           AS sum_trailing
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
)
SELECT 'gap_fill' AS kind, event_type AS g, period AS ts, n,
       CAST(NULL AS DOUBLE) AS total
FROM gap
UNION ALL
SELECT 'trailing' AS kind, CAST(user_id AS VARCHAR) AS g, ts,
       n_trailing AS n, sum_trailing AS total
FROM tr
""")
def q69_temporal_density(spark, sf_dir):
    e = events(spark, sf_dir)
    gap = tso.resample_counts(e, "ts", "event_type", interval="1 hour") \
        .select(F.lit("gap_fill").alias("kind"),
                F.col("event_type").alias("g"),
                F.col("period").alias("ts"), "n",
                F.lit(None).cast("double").alias("total"))
    tr = tso.trailing_window_stats(e, "user_id", "ts", "value",
                                   seconds=3600) \
        .select(F.lit("trailing").alias("kind"),
                F.col("user_id").cast("string").alias("g"),
                "ts", F.col("n_trailing").alias("n"),
                F.col("sum_trailing").alias("total"))
    return gap.unionByName(tr)
