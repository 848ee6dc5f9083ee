"""End-to-end training-corpus preparation job.

The training-data counterpart of the reference's scoring DAGs (§3): one
composable pipeline from raw documents to sharded, split, deduplicated,
quality-gated training shards — every stage an operator this engine
already oracle- or pytest-verifies individually, composed here the way
a production corpus build runs them:

    documents
      -> exact dedup            (dedup.drop_exact_duplicates)
      -> near-dup clustering    (dedup.dedup_clusters; keepers only)
      -> quality gate           (text.quality_score threshold)
      -> PII redaction          (text.redact_pii)
      -> leakage-safe split     (sampling.cluster_safe_split on the
                                 SAME clustering that drove dedup)
      -> token accounting       (text.token_count)
      -> sharded export         (export.write_training_shards per split)

Scale shape: two corpus-sized shuffles (content-hash dedup, LSH band
join), everything else map-side or keyed joins against the small
cluster frame. The near-dup clustering output is localCheckpointed and
reused for BOTH keeper selection and the leakage-safe split — one LSH
pass, two consumers (the q28/q42/q59 sharing pattern).

The composition is pytest-verified end-to-end (no exact dups in the
output, no cluster split across train/test, shards on disk, metric
arithmetic consistent) and benched as ``pipeline_corpus_prep`` next to
the three reference pipelines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import dedup as dd
from tradingview_data_pipeline_spark.operators import export as ex
from tradingview_data_pipeline_spark.operators import sampling as sp
from tradingview_data_pipeline_spark.operators import text as tx


def run_corpus_prep(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    quality_min: float = 25.0,
    jaccard_threshold: float = 0.5,
    n_shards: int = 8,
) -> dict:
    """Run the full corpus-prep pipeline; returns a metrics dict (the
    per-stage row accounting a production corpus build logs)."""
    n_input = docs.count()

    # exact dedup is recomputed by the clustering build and the export
    # pass below; a production build would persist it as a table between
    # stages (merge.ParquetTable) — inline recompute keeps this job
    # self-contained and it is one md5 hash-agg either way
    exact = dd.drop_exact_duplicates(docs, "text", "doc_id")

    # one LSH/clustering pass, reused by keeper-selection AND the split;
    # checkpointed, so its row count (= post-exact-dedup corpus) is free
    clusters = dd.dedup_clusters(
        exact, "doc_id", "text",
        jaccard_threshold=jaccard_threshold).localCheckpoint(eager=True)
    n_exact = clusters.count()
    kept = exact.join(
        clusters.where(F.col("is_keeper")).select("doc_id"),
        "doc_id", "left_semi")

    gated = kept.where(
        (tx.quality_score(F.col("text")) >= F.lit(quality_min))
        & (tx.token_count(F.col("text")) > 0))

    redacted = gated.withColumn("text", tx.redact_pii(F.col("text")))

    # cluster_safe_split joins the cluster frame in itself — no second
    # corpus join; cluster_id rides along as provenance in the shards
    final = (sp.cluster_safe_split(
        redacted, "doc_id", clusters.select("doc_id", "cluster_id"))
        .drop("split_bucket")
        .withColumn("n_tokens", tx.token_count(F.col("text"))))

    # ONE pass writes every split (hive split=/shard= layout); output
    # metrics are then read from what actually landed on disk — the
    # "verify what you shipped" accounting, and it spares a second
    # computation of the dedup->quality->split chain
    ex.write_training_shards(final, out_dir, "doc_id", n_shards,
                             partition_cols=["split"])
    # an all-filtered corpus writes only _SUCCESS; reading that back
    # raises UNABLE_TO_INFER_SCHEMA — report zero-row metrics instead
    has_files = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(out_dir) for f in files)
    per_split = {} if not has_files else {
        r["split"]: r for r in
        spark.read.parquet(out_dir).groupBy("split").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tokens")).collect()}

    return {
        "input_rows": n_input,
        "after_exact_dedup": n_exact,
        "after_near_dedup_and_quality": sum(
            r["rows"] for r in per_split.values()),
        **{f"{name}_rows": (per_split[name]["rows"] if name in per_split else 0)
           for name in ("train", "val", "test")},
        "total_tokens": int(sum(r["tokens"] for r in per_split.values())),
        "n_shards": n_shards,
    }
