"""Composite technical score pipeline (reference: calcompositescore.py).

The reference loops Python dicts over ~300 (cap, sector, industry) peer
groups (calcompositescore.py:222-299, 4.1 s for 1.6k rows). Here the whole
job is one declarative plan: derived columns -> global rank bucketing ->
two windowed z-score trees (industry / sector granularity) -> group-size
gate coalesce -> horizontal weighted sum. One shuffle per grouping
granularity; at 100 TB the windows partition by (cap, sector[, industry])
so no single-task stage exists except the parity-mode bucketing (see
``bucket_by_global_rank`` scale mode).

Engine semantics (documented deviation from pandas quirks): the
normalization level is industry when the (cap, sector, industry) group has
>= 2 members, else sector — chosen per metric-independent group size; the
reference's dict-overwrite order could leak a sector-level score for a
metric whose industry-level gate failed (SURVEY §4 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions.cleaning import (
    guarded_rel_diff, macd_histogram, rating_to_score,
)
from tradingview_data_pipeline_spark.operators.scoring import (
    bucket_by_global_rank, group_zscore, top_k,
)

# Factor weights (calcompositescore.py:161-188)
COMPOSITE_WEIGHTS: dict[str, float] = {
    "rsi_14_1_day": 3.0,
    "momentum_10_1_day": 3.0,
    "roc_9_1_day": 3.0,
    "macd_12_26_level_1_day": 3.0,
    "adx_14_1_day": 3.0,
    "stochastic_k_14_3_3_1_day": 2.5,
    "cci_20_1_day": 2.5,
    "sma50_relative": 2.0,
    "sma200_relative": 2.0,
    "bollinger_upper_relative": 2.0,
    "bollinger_middle_relative": 2.0,
    "bollinger_lower_relative": 2.0,
    "chaikin_money_flow_20_1_day": 3.0,
    "performance_ytd": 2.0,
    "performance_1_year": 2.0,
    "performance_6_months": 3.0,
    "performance_3_months": 3.0,
    "performance_1_month": 4.0,
    "performance_1_week": 5.0,
    "analyst_rating_score": 5.0,
    "target_price_performance_1_year": 3.0,
    "macd_histogram": 3.0,
    "chaikin_money_flow_20_1_week": 2.0,
    "chaikin_money_flow_20_1_month": 2.5,
}

# z-scored metrics (calcompositescore.py:233-244) — same set minus none;
# weights above reference the normalized columns.
NORMALIZED_METRICS = list(COMPOSITE_WEIGHTS.keys())

LEVEL_WEIGHTS = {"industry": 1.0, "sector": 0.8}   # calcompositescore.py:224-227


def add_derived_columns(df: DataFrame) -> DataFrame:
    """F5 rating map, F6 guarded relative diffs, F7 MACD histogram
    (calcompositescore.py:99-139)."""
    price = F.col("price")
    return (
        df.withColumn("analyst_rating_score",
                      rating_to_score(F.col("analyst_rating")).cast("double"))
        .withColumn("sma50_relative", guarded_rel_diff(F.col("sma_50_1_day"), price))
        .withColumn("sma200_relative", guarded_rel_diff(F.col("sma_200_1_day"), price))
        .withColumn("bollinger_upper_relative",
                    guarded_rel_diff(F.col("bollinger_upper_20_1_day"), price))
        .withColumn("bollinger_middle_relative",
                    guarded_rel_diff(F.col("bollinger_basis_20_1_day"), price))
        .withColumn("bollinger_lower_relative",
                    guarded_rel_diff(F.col("bollinger_lower_20_1_day"), price))
        .withColumn("macd_histogram",
                    macd_histogram(F.col("macd_12_26_level_1_day"),
                                   F.col("macd_12_26_signal_1_day")))
    )


def composite_scores(df: DataFrame, *, bucket_mode: str = "parity") -> DataFrame:
    """Full composite pipeline; returns input columns + market_cap_category
    + per-metric ``{m}_normalized`` + composite_score (rounded 2dp)."""
    df = add_derived_columns(df)
    df = bucket_by_global_rank(df, "market_capitalization",
                               out_col="market_cap_category",
                               tie_break="symbol", mode=bucket_mode)

    w_ind = Window.partitionBy("market_cap_category", "sector", "industry")
    w_sec = Window.partitionBy("market_cap_category", "sector")
    n_ind = F.count(F.lit(1)).over(w_ind)

    # a stock participates only with non-null cap/sector/industry
    # (the reference's loops skip NaN group keys, calcompositescore.py:273-289)
    in_scope = (F.col("market_cap_category").isNotNull()
                & F.col("sector").isNotNull() & F.col("industry").isNotNull())

    # ONE select for every normalized column: window functions sharing a
    # spec merge into a single Window operator only when they sit in the
    # same projection — per-metric withColumn chaining left 49 Window
    # operators (and as many local sorts) in the physical plan; this
    # form plans 2 (one per granularity, count included).
    zcols = []
    for m in NORMALIZED_METRICS:
        v = F.col(m).cast("double")
        z_ind = group_zscore(v, w_ind, min_group=3, level_weight=LEVEL_WEIGHTS["industry"])
        z_sec = group_zscore(v, w_sec, min_group=3, level_weight=LEVEL_WEIGHTS["sector"])
        z = F.when(~in_scope, F.lit(0.0)) \
             .when(n_ind >= 2, z_ind).otherwise(z_sec)   # W6 gate (:292-299)
        zcols.append(z.alias(f"{m}_normalized"))
    df = df.select("*", *zcols)

    weighted = None
    for m, w in COMPOSITE_WEIGHTS.items():
        term = F.coalesce(F.col(f"{m}_normalized"), F.lit(0.0)) * F.lit(w)
        weighted = term if weighted is None else weighted + term
    return df.withColumn("composite_score", F.round(weighted, 2))


def rankings_output(df: DataFrame) -> DataFrame:
    """Projection merged into stock_rankings (calcompositescore.py:313-320)."""
    return df.select(
        "symbol", "composite_score", "market_cap_category",
        F.current_timestamp().alias("update_date"),
    )


def top_bottom_report(df: DataFrame, k: int = 10) -> tuple[DataFrame, DataFrame]:
    """W7 report (calcompositescore.py:396-399)."""
    cols = ["symbol", "composite_score", "market_cap_category"]
    top = top_k(df, "composite_score", k, tie_break="symbol").select(*cols)
    bottom = top_k(df, "composite_score", k, ascending=True, tie_break="symbol").select(*cols)
    return top, bottom
