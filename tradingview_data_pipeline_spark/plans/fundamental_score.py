"""Fundamental score pipeline (reference: calfundamentalscore.py).

The reference iterates rows (calfundamentalscore.py:256-316, ~630 rows/s)
re-deriving each stock's peer group and percentiles in Python. Here the
whole job is windows + expressions:

1. peer-group fallback (W5): industry if its member count >= MIN_PEERS,
   elif sector, else all stocks — computed once per row with three
   windowed counts (:162-180);
2. per-metric percentile (W4/A9) at each granularity via the
   count-comparison identity  #{peers < v} == rank(v) - 1, with the
   valuation positivity filter (P6) applied to the peer set via
   rank-over-filtered-value (:137-159, 196-203);
3. weight-renormalized category means (A7, :206-228);
4. 0.4/0.3/0.2/0.1 blend with neutral-50 default (A8, :304-316);
5. rank within market-cap category (W2, :339-349).

Three shuffles total (industry / sector / global percentile trees) — each
partitioned by a business key, skew-safe under AQE; nothing is
single-task. At 100 TB the same plan holds: the windows are per-metric
expressions over three exchanges, not per-metric jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions.cleaning import clip_upper
from tradingview_data_pipeline_spark.operators.scoring import rank_within

MIN_PEERS = 5     # calfundamentalscore.py:49

# Metric registry (calfundamentalscore.py:55-88): category -> metric ->
# (weight, higher_is_better, cap)
QUALITY_METRICS = {
    "return_on_equity_ttm": (0.12, True, None),
    "return_on_invested_capital_ttm": (0.10, True, None),
    "operating_margin_ttm": (0.08, True, None),
    "net_margin_ttm": (0.06, True, None),
    "gross_margin_annual": (0.04, True, None),
}
GROWTH_METRICS = {
    "eps_diluted_growth_ttm_yoy": (0.10, True, None),
    "revenue_growth_annual_yoy": (0.08, True, None),
    "eps_diluted_growth_annual_yoy": (0.06, True, None),
    "net_income_growth_annual_yoy": (0.06, True, None),
}
VALUATION_METRICS = {
    "pe_ratio": (0.07, False, None),
    "price_to_earnings_growth_ttm": (0.05, False, None),
    "enterprise_value_to_ebitda_ttm": (0.04, False, None),
    "price_to_book_ratio": (0.02, False, None),
    "price_to_sales_ratio": (0.02, False, None),
}
HEALTH_METRICS = {
    "current_ratio_quarterly": (0.03, True, 3.0),
    "debt_to_equity_ratio_quarterly": (0.03, False, None),
    "quick_ratio_quarterly": (0.02, True, 2.0),
    "ebitda_interest_coverage_ttm": (0.02, True, 10.0),
}
ALL_METRICS = {**QUALITY_METRICS, **GROWTH_METRICS, **VALUATION_METRICS,
               **HEALTH_METRICS}

CATEGORY_BLEND = {"quality_score": 0.40, "growth_score": 0.30,
                  "valuation_score": 0.20, "health_score": 0.10}


def apply_caps(df: DataFrame) -> DataFrame:
    """F8 (calfundamentalscore.py:183-193)."""
    for m, (_, _, cap) in ALL_METRICS.items():
        if cap is not None and m in df.columns:
            df = df.withColumn(m, clip_upper(F.col(m), cap))
    return df


def _percentile_at(df: DataFrame, metric: str, keys: list[str],
                   higher_is_better: bool, positive_only: bool) -> Column:
    """Percentile of ``metric`` within the group defined by ``keys``
    (empty = all stocks), as 100*(rank-1)/n with <2-peer neutral 50.
    ``positive_only`` ranks over a masked value so non-positive rows drop
    out of the peer set without a second pass over a filtered frame."""
    v = F.col(metric)
    ranked_v = F.when(v > 0, v) if positive_only else v
    direction = ranked_v.asc_nulls_last() if higher_is_better else ranked_v.desc_nulls_last()
    wr = Window.partitionBy(*keys).orderBy(direction) if keys else Window.orderBy(direction)
    wg = Window.partitionBy(*keys) if keys else Window.partitionBy()
    n = F.count(ranked_v).over(wg)
    pct = F.round((F.rank().over(wr) - F.lit(1)) * 100.0 / n, 2)  # :159 round
    # self is in the peer set; a masked (non-positive) self never ranks
    return F.when(n < 2, F.lit(50.0)).otherwise(pct)


def fundamental_scores(df: DataFrame) -> DataFrame:
    """Adds ``{metric}_percentile``, peer_level, four category scores and
    fundamental_score to ``df``."""
    df = apply_caps(df)

    w_ind = Window.partitionBy("industry")
    w_sec = Window.partitionBy("sector")
    n_ind = F.when(F.col("industry").isNotNull(),
                   F.count(F.lit(1)).over(w_ind)).otherwise(F.lit(0))
    n_sec = F.when(F.col("sector").isNotNull(),
                   F.count(F.lit(1)).over(w_sec)).otherwise(F.lit(0))
    df = df.withColumn(
        "peer_level",
        F.when(n_ind >= MIN_PEERS, F.lit("industry"))
         .when(n_sec >= MIN_PEERS, F.lit("sector"))
         .otherwise(F.lit("all")),
    )

    for m, (_, hib, _) in ALL_METRICS.items():
        if m not in df.columns:
            continue
        positive_only = m in VALUATION_METRICS
        p_ind = _percentile_at(df, m, ["industry"], hib, positive_only)
        p_sec = _percentile_at(df, m, ["sector"], hib, positive_only)
        p_all = _percentile_at(df, m, [], hib, positive_only)
        pct = F.when(F.col("peer_level") == "industry", p_ind) \
               .when(F.col("peer_level") == "sector", p_sec) \
               .otherwise(p_all)
        v = F.col(m)
        if positive_only:
            # loss-makers score 0 outright (:275-281); null stays null
            pct = F.when(v.isNull(), F.lit(None).cast("double")) \
                   .when(v <= 0, F.lit(0.0)).otherwise(pct)
        else:
            pct = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(pct)
        df = df.withColumn(f"{m}_percentile", pct)

    for cat_col, metrics in [("quality_score", QUALITY_METRICS),
                             ("growth_score", GROWTH_METRICS),
                             ("valuation_score", VALUATION_METRICS),
                             ("health_score", HEALTH_METRICS)]:
        num, den = None, None
        for m, (w, _, _) in metrics.items():
            s = F.col(f"{m}_percentile")
            t_num = F.when(s.isNotNull(), s * F.lit(w)).otherwise(F.lit(0.0))
            t_den = F.when(s.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
            num = t_num if num is None else num + t_num
            den = t_den if den is None else den + t_den
        df = df.withColumn(cat_col, F.round(F.when(den > 0, num / den), 2))

    blend = None
    for cat_col, w in CATEGORY_BLEND.items():
        term = F.coalesce(F.col(cat_col), F.lit(50.0)) * F.lit(w)
        blend = term if blend is None else blend + term
    return df.withColumn("fundamental_score", F.round(blend, 2))


def fundamental_ranks(df: DataFrame, categories: DataFrame | None = None) -> DataFrame:
    """W2: 1..N per market_cap_category by fundamental_score desc
    (calfundamentalscore.py:339-349); deterministic symbol tie-break."""
    if categories is not None:
        df = df.join(categories.select("symbol", "market_cap_category"),
                     "symbol", "left")
    return rank_within(df, ["market_cap_category"], "fundamental_score",
                       out_col="fundamental_rank", tie_break="symbol")


def rankings_output(df: DataFrame) -> DataFrame:
    """Projection merged into stock_rankings (calfundamentalscore.py:361-370)."""
    return df.select(
        "symbol", "fundamental_score",
        F.col("fundamental_rank").cast("int").alias("fundamental_rank"),
        "quality_score", "growth_score", "valuation_score", "health_score",
        F.current_timestamp().alias("fundamental_update_date"),
    )
