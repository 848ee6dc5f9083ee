"""Bucketed-table layout for co-located joins (SCALING.md join story).

At 100 TB, the repeated stock_data ⋈ stock_rankings / fact ⋈ fact joins
should never reshuffle both sides per query. Writing both tables bucketed
by the join key (same bucket count) lets Spark plan a shuffle-free
SortMergeJoin: each task reads matching bucket files from both sides.

This is the managed-table counterpart of ``ParquetTable`` — use it for
the big co-joined pairs; `ParquetTable` remains the MERGE surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   *, buckets: int = 32, sort: bool = True) -> None:
    """Save as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
