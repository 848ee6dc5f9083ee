"""Time-series queries over ``events``: rolling technical indicators
(q60) and exact pairwise activity correlation (q61).

Reference counterpart: the scoring jobs consume a moving-average /
momentum indicator family as input columns (calcompositescore.py's
``sma20``/``ema``-era technicals; functions/cleaning.py's MACD
histogram) — q60 produces that family inside the engine.  q61 is the
cross-sectional analysis layer on top (which activity streams move
together), kept integer-exact so it oracle-checks bit-for-bit.
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

@register("q60_rolling_indicators", oracle="""
SELECT event_id, user_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w5 AS DOUBLE)
         / COUNT(value) OVER w5 AS sma5,
       MIN(value) OVER w5 AS min5,
       MAX(value) OVER w5 AS max5,
       MAX(value) OVER w5 - MIN(value) OVER w5 AS range5,
       value - lag(value, 3) OVER wo AS momentum3
FROM events
WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       wo AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q60_rolling_indicators(spark, sf_dir):
    e = events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return tso.rolling_features(e, "user_id", "ts", "value",
                                window_rows=5, momentum_lag=3,
                                tiebreak="event_id")


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


@register("q61_event_correlation", oracle=_q61_oracle())
def q61_event_correlation(spark, sf_dir):
    e = events(spark, sf_dir)
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"))
              .pivot("event_type", _ETYPES)
              .agg(F.count(F.lit(1))))
    hourly = hourly.select(
        "h", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _ETYPES])
    return tso.pairwise_pearson_counts(hourly, _ETYPES)
