"""Declared schemas + CSV-header mappings for the domain tables.

The reference infers schemas from CSV then renames via explicit header→
column maps (uploadtodb.py:74-124, funda_uploadtodb.py:60-111) and
validates against the sink schema discovered at runtime
(sectormerged_improved.py:655-680). Our engine declares StructTypes up
front and treats the CSV header map as a tolerant adapter (SURVEY §1.3).

The header maps below cover every column the scoring jobs consume plus
the identifying/audit columns; unmapped CSV columns are dropped by the
adapter (same behavior as the reference's mapping-projection step,
uploadtodb.py:149-151).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# stock_data — technical columns (CSV "Technicals M" export).
# Header → snake_case DB column, per uploadtodb.py:74-124.
# ---------------------------------------------------------------------------

TECHNICAL_HEADER_MAP: dict[str, str] = {
    "Symbol": "symbol",
    "Description": "description",
    "Sector": "sector",
    "Industry": "industry",
    "Price": "price",
    "Price - Currency": "price_currency",
    "Market capitalization": "market_capitalization",
    "Market capitalization - Currency": "market_capitalization_currency",
    "Analyst Rating": "analyst_rating",
    "Technical Rating 1 day": "technical_rating_1_day",
    "Moving Averages Rating 1 day": "moving_averages_rating_1_day",
    "Oscillators Rating 1 day": "oscillators_rating_1_day",
    "Technical Rating 1 week": "technical_rating_1_week",
    "Relative Strength Index (14) 1 day": "rsi_14_1_day",
    "Momentum (10) 1 day": "momentum_10_1_day",
    "Awesome Oscillator 1 day": "awesome_oscillator_1_day",
    "Commodity Channel Index (20) 1 day": "cci_20_1_day",
    "Rate of Change (9) 1 day": "roc_9_1_day",
    "Average Directional Index (14) 1 day": "adx_14_1_day",
    "Ultimate Oscillator (7,14,28) 1 day": "ultimate_oscillator_7_14_28_1_day",
    "Williams Percent Range (14) 1 day": "williams_percent_range_14_1_day",
    "Stochastic (14,3,3) 1 day, %K": "stochastic_k_14_3_3_1_day",
    "Stochastic (14,3,3) 1 day, %D": "stochastic_d_14_3_3_1_day",
    "Candlestick Pattern 1 day": "candlestick_pattern_1_day",
    # pandas dedups duplicate CSV headers with a ".1" suffix; map both
    # (uploadtodb.py:113-114)
    "Moving Average Convergence Divergence (12,26) 1 day, Level": "macd_12_26_level_1_day",
    "Moving Average Convergence Divergence (12,26) 1 day, Signal": "macd_12_26_signal_1_day",
    "Moving Average Convergence Divergence (12,26) 1 day, Level.1": "macd_12_26_level_1_day_2",
    "Moving Average Convergence Divergence (12,26) 1 day, Signal.1": "macd_12_26_signal_1_day_2",
    "Simple Moving Average (50) 1 day": "sma_50_1_day",
    "Simple Moving Average (200) 1 day": "sma_200_1_day",
    "Bollinger Bands (20) 1 day, Upper": "bollinger_upper_20_1_day",
    "Bollinger Bands (20) 1 day, Basis": "bollinger_basis_20_1_day",
    "Bollinger Bands (20) 1 day, Lower": "bollinger_lower_20_1_day",
    "Chaikin Money Flow (20) 1 day": "chaikin_money_flow_20_1_day",
    "Chaikin Money Flow (20) 1 week": "chaikin_money_flow_20_1_week",
    "Chaikin Money Flow (20) 1 month": "chaikin_money_flow_20_1_month",
    "Performance % 1 week": "performance_1_week",
    "Performance % 1 month": "performance_1_month",
    "Performance % 3 months": "performance_3_months",
    "Performance % 6 months": "performance_6_months",
    "Performance % Year to date": "performance_ytd",
    "Performance % 1 year": "performance_1_year",
    "Target price 1 year": "target_price_1_year",
    "Target price 1 year - Currency": "target_price_1_year_currency",
    "Target price performance % 1 year": "target_price_performance_1_year",
    "Beta 1 year": "beta_1_year",
    "Volatility 1 week": "volatility_1w",
    "Volatility 1 month": "volatility_1_month",
    "Index": "index_memberships",
}

# ---------------------------------------------------------------------------
# stock_data — fundamental columns (CSV "funda" export).
# Header → snake_case, per funda_uploadtodb.py:60-111.
# ---------------------------------------------------------------------------

FUNDAMENTAL_HEADER_MAP: dict[str, str] = {
    "Symbol": "symbol",
    "Description": "description",
    "Price": "price",
    "Price - Currency": "price_currency",
    "Market capitalization": "market_capitalization",
    "Market capitalization - Currency": "market_capitalization_currency",
    "Sector": "sector",
    "Industry": "industry",
    "Analyst Rating": "analyst_rating",
    "Price to earnings ratio": "pe_ratio",
    "Price to book ratio": "price_to_book_ratio",
    "Price to sales ratio": "price_to_sales_ratio",
    "Price to earning to growth, Trailing 12 months": "price_to_earnings_growth_ttm",
    "Price to cash flow ratio": "price_to_free_cash_flow_ratio",
    "Enterprise value": "enterprise_value",
    "Enterprise value to revenue ratio, Trailing 12 months": "enterprise_value_to_revenue_ttm",
    "Enterprise value to EBITDA ratio, Trailing 12 months": "enterprise_value_to_ebitda_ttm",
    "Return on equity %, Trailing 12 months": "return_on_equity_ttm",
    "Return on assets %, Trailing 12 months": "return_on_assets_ttm",
    "Return on invested capital %, Trailing 12 months": "return_on_invested_capital_ttm",
    "Gross margin %, Annual": "gross_margin_annual",
    "Operating margin %, Annual": "operating_margin_ttm",
    "Net margin %, Trailing 12 months": "net_margin_ttm",
    "Earnings per share diluted, Trailing 12 months": "eps_diluted_ttm",
    "Earnings per share basic, Trailing 12 months": "basic_eps_ttm",
    "Earnings per share diluted growth %, TTM YoY": "eps_diluted_growth_ttm_yoy",
    "Earnings per share diluted growth %, Annual YoY": "eps_diluted_growth_annual_yoy",
    "Earnings per share diluted growth %, Quarterly YoY": "eps_diluted_growth_quarterly_yoy",
    "Earnings per share diluted growth %, Quarterly QoQ": "eps_diluted_growth_quarterly_qoq",
    "Earnings per share estimate, Quarterly": "eps_forecast_quarterly",
    "Total revenue, Annual": "total_revenue_annual",
    "Net income, Annual": "net_income_annual",
    "Net income, Trailing 12 months": "net_income_ttm",
    "EBITDA, Trailing 12 months": "ebitda_ttm",
    "Revenue growth %, Annual YoY": "revenue_growth_annual_yoy",
    "Revenue growth %, Quarterly YoY": "revenue_growth_quarterly_yoy",
    "Revenue growth %, Quarterly QoQ": "revenue_growth_quarterly_qoq",
    "Net income growth %, Annual YoY": "net_income_growth_annual_yoy",
    "Free cash flow, Annual": "free_cash_flow_annual",
    "Operating cash flow per share, Trailing 12 months": "cash_from_operating_activities_ttm",
    "Total debt, Quarterly": "total_debt_quarterly",
    "Debt to equity ratio, Quarterly": "debt_to_equity_ratio_quarterly",
    "Debt to EBITDA ratio, Annual": "debt_to_ebitda_ratio_annual",
    "Interest coverage, Trailing 12 months": "ebitda_interest_coverage_ttm",
    "Current ratio, Quarterly": "current_ratio_quarterly",
    "Quick ratio, Quarterly": "quick_ratio_quarterly",
    "Dividend yield %, Trailing 12 months": "dividend_yield_ttm",
    "Cash & equivalents, Annual": "cash_and_equivalents_annual",
    "Total common shares outstanding": "shares_outstanding",
    "Free float %": "float_percent",
}

# Numeric technical/fundamental columns get DoubleType; identifiers and
# ratings are strings; market cap and shares are longs.

_STRING_COLS = {
    "symbol", "description", "sector", "industry", "price_currency",
    "market_capitalization_currency", "target_price_1_year_currency",
    "analyst_rating", "technical_rating_1_day", "moving_averages_rating_1_day",
    "oscillators_rating_1_day", "technical_rating_1_week",
    "candlestick_pattern_1_day", "index_memberships",
}
_LONG_COLS = {"market_capitalization", "shares_outstanding"}


def _field(name: str) -> T.StructField:
    if name in _STRING_COLS:
        return T.StructField(name, T.StringType())
    if name in _LONG_COLS:
        return T.StructField(name, T.LongType())
    return T.StructField(name, T.DoubleType())


def stock_data_schema() -> T.StructType:
    cols: list[str] = []
    for m in (TECHNICAL_HEADER_MAP, FUNDAMENTAL_HEADER_MAP):
        for c in m.values():
            if c not in cols and not c.endswith("_1_day_2"):
                cols.append(c)
    fields = [_field(c) for c in cols]
    fields.append(T.StructField("last_modified_date", T.TimestampType()))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# stock_rankings (calcompositescore.py:313-320, calfundamentalscore.py:361-370)
# ---------------------------------------------------------------------------

STOCK_RANKINGS_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType(), False),
    T.StructField("composite_score", T.DoubleType()),
    T.StructField("market_cap_category", T.StringType()),
    T.StructField("update_date", T.TimestampType()),
    T.StructField("fundamental_score", T.DoubleType()),
    T.StructField("fundamental_rank", T.IntegerType()),
    T.StructField("quality_score", T.DoubleType()),
    T.StructField("growth_score", T.DoubleType()),
    T.StructField("valuation_score", T.DoubleType()),
    T.StructField("health_score", T.DoubleType()),
    T.StructField("fundamental_update_date", T.TimestampType()),
])

# ---------------------------------------------------------------------------
# sector_data / industry_data (sectormerged_improved.py:667-677,
# industrymerged.py:769-779): scraped all-string perf columns cleaned to
# doubles + derived normalized scores.
# ---------------------------------------------------------------------------

SEGMENT_PERF_COLS = ["perf_1w", "perf_1m", "perf_3m", "perf_6m", "perf_ytd",
                     "perf_1y", "perf_5y", "perf_10y", "perf_all_time"]

# analyst-text + rating columns carried by the reference's segment tables
# (sectormerged_improved.py:667-677, industrymerged.py:769-779)
SEGMENT_ANALYST_COLS = [
    "macro_summary", "short_term_classification", "short_term_performance",
    "short_term_catalysts", "long_term_classification", "long_term_performance",
    "long_term_catalysts", "upside_risks", "downside_risks",
    "quantitative_assessment", "old_macro_call", "overall_rating", "rationale",
]


def segment_schema(key: str) -> T.StructType:
    fields = [T.StructField(key, T.StringType(), False),
              T.StructField("market_cap", T.DoubleType()),
              T.StructField("div_yield_indicated", T.DoubleType()),
              T.StructField("change_pct", T.DoubleType()),
              T.StructField("volume", T.DoubleType()),
              T.StructField("industries", T.LongType()),
              T.StructField("stocks", T.LongType())]
    fields += [T.StructField(c, T.DoubleType()) for c in SEGMENT_PERF_COLS]
    fields += [T.StructField("normalized_score_3m", T.DoubleType()),
               T.StructField("normalized_score_6m", T.DoubleType()),
               T.StructField("normalized_score_1y", T.DoubleType())]
    fields += [T.StructField(c, T.StringType()) for c in SEGMENT_ANALYST_COLS]
    fields += [T.StructField("macro_rank", T.DoubleType()),
               T.StructField(f"{key}_atm_iv", T.DoubleType()),
               T.StructField("updated_at", T.TimestampType())]
    return T.StructType(fields)


# Scrape-shaped raw header variants (sectormerged_improved.py:497-535)
SEGMENT_HEADER_MAP: dict[str, str] = {
    "Sector": "sector",
    "Industry": "industry",
    "Market cap": "market_cap",
    "Div yield % (indicated)": "div_yield_indicated",
    "Change %": "change_pct",
    "Volume": "volume",
    "Industries": "industries",
    "Stocks": "stocks",
    "Perf % 1W": "perf_1w",
    "Perf % 1M": "perf_1m",
    "Perf % 3M": "perf_3m",
    "Perf % 6M": "perf_6m",
    "Perf % YTD": "perf_ytd",
    "Perf % 1Y": "perf_1y",
    "Perf % 5Y": "perf_5y",
    "Perf % 10Y": "perf_10y",
    "Perf % All Time": "perf_all_time",
}

# ---------------------------------------------------------------------------
# news events (newsflow_scraper.py:296-309)
# ---------------------------------------------------------------------------

NEWS_SCHEMA = T.StructType([
    T.StructField("tweet_id", T.StringType(), False),
    T.StructField("article_title", T.StringType()),
    T.StructField("article_description", T.StringType()),
    T.StructField("article_url", T.StringType()),
    T.StructField("username", T.StringType()),
    T.StructField("posted_at", T.TimestampType()),
    T.StructField("is_critical", T.BooleanType()),
])
