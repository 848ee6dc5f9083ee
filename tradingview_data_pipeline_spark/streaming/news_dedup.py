"""Streaming news ingestion with exactly-once-per-key dedup (SURVEY K5/J4,
M6; reference: newsflow_scraper.py:243-327).

The reference fetches ALL existing article URLs into a Python set per run
(newsflow_scraper.py:243-272) — unbounded state that grows with history.
The stream replaces it with:

- ``dropDuplicatesWithinWatermark`` on the synthetic key within the
  stream: unlike plain ``dropDuplicates`` (which only evicts state when
  the event-time column is part of the key subset), this operator evicts
  per-key state once the watermark on ``posted_at`` passes, so state is
  genuinely bounded by the watermark horizon;
- an idempotent ``append_dedup`` MERGE sink, which also de-dups against
  rows already in the table (covers keys older than the watermark
  horizon at a cost proportional to the table, not the history scan the
  reference does per run).

Derived columns reproduce the reference's record shape
(newsflow_scraper.py:296-309): md5-prefix tweet_id (F11), 500-char
truncation (F12), provider prefix strip (F13), URL composition (F16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions.cleaning import (
    compose_url, hash_id, strip_prefix, truncate_str,
)
from tradingview_data_pipeline_spark.operators.merge import ParquetTable


def normalize_news(df: DataFrame) -> DataFrame:
    """Raw scraped rows -> news table shape (works on batch or stream)."""
    url = compose_url(F.col("article_url"))
    return df.select(
        hash_id(url).alias("tweet_id"),
        truncate_str(strip_prefix(F.col("article_title")), 500).alias("article_title"),
        truncate_str(F.col("article_description"), 500).alias("article_description"),
        url.alias("article_url"),
        F.col("username"),
        F.col("posted_at").cast("timestamp").alias("posted_at"),
        F.coalesce(F.col("is_critical"), F.lit(False)).alias("is_critical"),
    ).where(
        # P7: skip premium teasers (newsflow_scraper.py:184-189)
        ~F.coalesce(F.col("article_description"), F.lit(""))
        .contains("Sign in to read exclusive")
    )


def stream_news_to_table(
    raw_stream: DataFrame,
    table: ParquetTable,
    checkpoint_dir: str,
    *,
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """normalize -> watermark -> in-stream dedup -> MERGE append_dedup."""
    normalized = normalize_news(raw_stream).withWatermark("posted_at", watermark)
    # Spark 3.5+: state for a key is dropped once the watermark passes its
    # event time. Plain dropDuplicates(["tweet_id"]) would keep state forever
    # because the event-time column is not part of the dedup key.
    deduped = normalized.dropDuplicatesWithinWatermark(["tweet_id"])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.append_dedup(batch_df)

    writer = deduped.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_neardup_candidates(
    doc_stream: DataFrame,
    index,      # dedup.IncrementalNearDupIndex / IncrementalSimHashIndex
    pairs_table: ParquetTable,              # / similarity.IncrementalEmbeddingIndex
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Streaming near-duplicate detection: each micro-batch registers its
    documents with the incremental index and appends the NEW candidate
    pairs (new-member-only — nothing is re-reported) to a keyed pairs
    table. Work per trigger is O(batch × collision rate): the signature
    table carries the whole corpus history, the stream never re-reads
    it. Restart-safe end-to-end: the checkpoint replays an
    unacknowledged batch, ``add_and_find`` re-upserts the same
    signatures (idempotent MERGE), and the pairs sink dedups on the
    pair key.

    Works with every incremental index family — all expose
    ``add_and_find(batch, id_col, content_col)`` returning (a, b) pair
    columns: MinHash/SimHash over text, hyperplane LSH over embeddings
    (pass ``text_col="embedding"``; pair columns differ in name only,
    so the key is derived from whatever the index returns)."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        pairs = index.add_and_find(batch_df, id_col, text_col)
        ca, cb = pairs.columns[:2]
        pairs_table.append_dedup(
            pairs.withColumn("pair_key", F.concat_ws(":", ca, cb)))

    writer = doc_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
