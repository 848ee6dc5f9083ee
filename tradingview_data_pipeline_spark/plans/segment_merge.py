"""Scrape-shaped segment ingestion: overview ⟗ performance merge
(SURVEY J1/P5/F4/K3; reference: sectormerged_improved.py:249-468,
industrymerged.py:247-570).

The reference scrapes two HTML tables per segment type (Overview and
Performance), cleans mojibake, filters junk rows, and full-outer-merges
them on a normalized key with suffix disambiguation and key coalesce.
Engine equivalents:

- scrape rows arrive as all-string DataFrames (connector concern; S8/S9);
- F4 ``normalize_text`` repairs mojibake/whitespace;
- P5 ``valid_segment_rows`` drops header echoes, date-like cells,
  analysis prose, and oversized names (sectormerged_improved.py:343-353);
- J1 full-outer join on the normalized key; overlapping non-key columns
  resolve overview-first (``coalesce(o.c, p.c)`` — the reference keeps
  the overview value and fills from performance);
- K3 overwrite into the segment table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions.cleaning import normalize_text

_DATE_LIKE = r"^\d{4}-\d{2}-\d{2}"
_ANALYSIS_MARKERS = ["Strengths:", "Weaknesses:", "Opportunities:", "Threats:"]


def valid_segment_rows(df: DataFrame, key: str, *, max_len: int = 50) -> DataFrame:
    """P5 multi-clause validity predicate on the segment-name column."""
    c = F.col(key)
    cond = (
        c.isNotNull()
        & (F.trim(c) != "")
        & (F.length(c) <= max_len)
        & (F.trim(c) != F.lit(key.capitalize()))      # header echo ("Sector")
        & ~c.rlike(_DATE_LIKE)                        # date-like cells
    )
    for marker in _ANALYSIS_MARKERS:
        cond = cond & ~c.contains(marker)
    return df.where(cond)


def clean_segment_strings(df: DataFrame, key: str) -> DataFrame:
    """F4 on the key (mojibake repair + whitespace collapse); metric
    columns stay raw strings for segment_score.clean_columns."""
    return df.withColumn(key, normalize_text(F.col(key)))


def _dedup_by_key(df: DataFrame, key: str) -> DataFrame:
    """Key normalization can collapse near-duplicate scraped rows onto one
    key; merge them deterministically (max of non-null values per column)
    so the full-outer join stays 1:1."""
    aggs = [F.max(c).alias(c) for c in df.columns if c != key]
    return df.groupBy(key).agg(*aggs)


def merge_overview_performance(overview: DataFrame, performance: DataFrame,
                               key: str) -> DataFrame:
    """J1: full-outer on the cleaned key; shared non-key columns coalesce
    overview-first; one output row per key from either side."""
    o = _dedup_by_key(
        valid_segment_rows(clean_segment_strings(overview, key), key), key).alias("o")
    p = _dedup_by_key(
        valid_segment_rows(clean_segment_strings(performance, key), key), key).alias("p")
    joined = o.join(p, on=key, how="full_outer")
    out_cols = [F.col(key)]
    o_cols = [c for c in overview.columns if c != key]
    p_cols = [c for c in performance.columns if c != key]
    for c in o_cols:
        if c in p_cols:
            out_cols.append(F.coalesce(F.col(f"o.{c}"), F.col(f"p.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"o.{c}").alias(c))
    for c in p_cols:
        if c not in o_cols:
            out_cols.append(F.col(f"p.{c}").alias(c))
    return joined.select(*out_cols)


def write_csv_backup(df: DataFrame, path: str) -> None:
    """K6: CSV backup sink (newsflow_scraper.py:384-386)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
