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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions.cleaning import (
    guarded_rel_diff, macd_histogram, rating_to_score, round_py,
)
from tradingview_data_pipeline_spark.operators.scoring import (
    bucket_by_global_rank, top_k,
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
    # one withColumns call: each chained withColumn re-analyzes the whole
    # accumulated plan JVM-side (~40 ms apiece at this width, r12 §7.3)
    return df.withColumns({
        "analyst_rating_score":
            rating_to_score(F.col("analyst_rating")).cast("double"),
        "sma50_relative": guarded_rel_diff(F.col("sma_50_1_day"), price),
        "sma200_relative": guarded_rel_diff(F.col("sma_200_1_day"), price),
        "bollinger_upper_relative":
            guarded_rel_diff(F.col("bollinger_upper_20_1_day"), price),
        "bollinger_middle_relative":
            guarded_rel_diff(F.col("bollinger_basis_20_1_day"), price),
        "bollinger_lower_relative":
            guarded_rel_diff(F.col("bollinger_lower_20_1_day"), price),
        "macd_histogram":
            macd_histogram(F.col("macd_12_26_level_1_day"),
                           F.col("macd_12_26_signal_1_day")),
    })


def composite_scores(df: DataFrame, *, bucket_mode: str = "parity") -> DataFrame:
    """Full composite pipeline; returns input columns + market_cap_category
    + per-metric ``{m}_normalized`` + composite_score (rounded 2dp)."""
    df = add_derived_columns(df)
    df = bucket_by_global_rank(df, "market_capitalization",
                               out_col="market_cap_category",
                               tie_break="symbol", mode=bucket_mode)

    # a stock participates only with non-null cap/sector/industry
    # (the reference's loops skip NaN group keys, calcompositescore.py:273-289)
    in_scope = (F.col("market_cap_category").isNotNull()
                & F.col("sector").isNotNull() & F.col("industry").isNotNull())

    # Group statistics as AGGREGATES + broadcast joins, not windows
    # (round-10 reshape, measured at the 16.4M-stock decade): the
    # z-score needs only (n, mean, stddev) per group per metric, and
    # group cardinality is business-bounded (caps x sectors x
    # industries ~ 10^4) — so two map-side-combinable aggregates
    # produce tiny stats tables that broadcast back, and the ~100-col
    # fact rows never enter a window exchange at all. The previous
    # two full-width window exchanges sorted the entire wide table
    # twice (~32 GB of shuffle at 16.4M rows; heap-death at the 8g
    # default, 501 s at 24g). Float caveat checked against the oracle
    # gate: avg/stddev_samp under partial aggregation can differ from
    # the window form by last-ulp reassociation; the driver hash
    # stayed green (q37/q12 re-verified) because scores are rounded
    # downstream and the generated metrics are low-entropy 3-dp; the
    # reassociation risk is pinned by tests/test_pipelines.py::
    # test_zscore_agg_form_equals_window_form_at_boundaries (round-11
    # advisor catch), which drives both forms onto exact rounding
    # midpoints and requires identical 2-dp outputs.
    keys_ind = ["market_cap_category", "sector", "industry"]
    keys_sec = ["market_cap_category", "sector"]

    def stats(keys: list[str], tag: str) -> DataFrame:
        # peer scope = non-null GROUP KEYS only (window-partitioning
        # semantics preserved): a null-industry row cannot score itself
        # but IS a sector-level peer — filtering on full in_scope here
        # would silently shrink sector stats
        scope = None
        for k in keys:
            c = F.col(k).isNotNull()
            scope = c if scope is None else scope & c
        aggs = [F.count(F.lit(1)).alias(f"__nrows_{tag}")]
        for m in NORMALIZED_METRICS:
            v = F.col(m).cast("double")
            aggs += [F.count(v).alias(f"__n_{tag}_{m}"),
                     F.avg(v).alias(f"__mu_{tag}_{m}"),
                     F.stddev_samp(v).alias(f"__sd_{tag}_{m}")]
        return df.where(scope).groupBy(*keys).agg(*aggs)

    df = (df.join(F.broadcast(stats(keys_ind, "i")), keys_ind, "left")
            .join(F.broadcast(stats(keys_sec, "s")), keys_sec, "left"))

    def z_at(m: str, tag: str, level: str) -> F.Column:
        v = F.col(m).cast("double")
        n = F.col(f"__n_{tag}_{m}")
        mu, sd = F.col(f"__mu_{tag}_{m}"), F.col(f"__sd_{tag}_{m}")
        z = (v - mu) / sd * F.lit(LEVEL_WEIGHTS[level])
        return F.when(v.isNull() | (n < 3) | (sd == 0) | sd.isNull(),
                      F.lit(0.0)).otherwise(z)

    zcols = []
    for m in NORMALIZED_METRICS:
        z = F.when(~in_scope, F.lit(0.0)) \
             .when(F.coalesce(F.col("__nrows_i"), F.lit(0)) >= 2,
                   z_at(m, "i", "industry")) \
             .otherwise(z_at(m, "s", "sector"))   # W6 gate (:292-299)
        zcols.append(z.alias(f"{m}_normalized"))
    df = df.select(*[c for c in df.columns if not c.startswith("__")],
                   *zcols)

    weighted = None
    for m, w in COMPOSITE_WEIGHTS.items():
        term = F.coalesce(F.col(f"{m}_normalized"), F.lit(0.0)) * F.lit(w)
        weighted = term if weighted is None else weighted + term
    return df.withColumn("composite_score", round_py(weighted, 2))


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
