"""Streaming corpus ingestion: document arrivals -> incremental
corpus maintenance.

Wires ``plans.corpus_pipeline.IncrementalCorpusBuilder`` into a
Structured Streaming sink: each micro-batch of documents is
quality-gated, exact- and near-deduped against everything previously
seen (persisted seen store + MinHash signature index — O(batch) work
per trigger, the stream never re-reads corpus history), split, and
appended to the manifest-committed corpus table.

Restart safety is the composition of two idempotence layers: the
checkpoint replays an unacknowledged micro-batch, and the builder is
replay-idempotent (a replayed batch's content hashes are already in the
seen store, so nothing is re-appended and re-upserted signatures MERGE
to the same rows). Run ``builder.compact()`` at maintenance cadence to
bound file counts.

This closes the loop for the streaming story: file-arrival ingest
(``file_ingest``), streaming near-dup candidates (``news_dedup``), and
now the full corpus build — the three stages a continuously-fed
training-data pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_corpus_build(
    doc_stream: DataFrame,
    builder,            # plans.corpus_pipeline.IncrementalCorpusBuilder
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Start a streaming query feeding ``builder`` one micro-batch at a
    time. ``doc_stream`` must carry (doc_id, text)."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        builder.add_batch(batch_df.select("doc_id", "text"))

    writer = doc_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
