"""Measured evidence for the ShardedContainmentIndex lever (SCALING.md
addendum 30; VERDICT r10 next-round #8).

Seeds the SAME corpus into (a) one unsharded IncrementalContainmentIndex
and (b) a ShardedContainmentIndex keyed on the corpus ``source`` column
(the driver generator round-robins src0..src19 — 20 shards), then times
one single-source 500-doc add_and_find trigger against each.

The claim under test: the unsharded trigger's floor is the FULL
stored-gram columnar read, while the sharded trigger reads only the
touched shard (~1/20 of the gram mass here), so per-trigger cost tracks
docs-per-touched-shard, not store size — the mechanism that holds the
trigger flat past the ~50M-doc read cliff the unsharded index
documents.

Usage: python tools/containment_shard_bench.py SF_DIR [out.jsonl]
SF_DIR must carry documents.parquet with (doc_id, text, source).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1]
OUT = sys.argv[2] if len(sys.argv) > 2 else "CONTAINMENT_SHARD_BENCH_r11.jsonl"
BATCH_DOCS = 500
STORE_ROOT = os.environ.get("SHARD_BENCH_STORE", "/tmp/shard_bench_store")


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import corpus as cp
    from tradingview_data_pipeline_spark.operators import dedup as dd
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("containment-shard-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    sources = sorted(r[0] for r in docs.select("source").distinct().collect())

    def seed_rows(sub):
        agg = (cp.span_gram_counts(sub, "doc_id", "text", n=8)
               .groupBy("doc_id")
               .agg(F.collect_list("h").alias("grams"),
                    F.count(F.lit(1)).alias("n_grams")))
        return (sub.select("doc_id").distinct()
                .join(agg, "doc_id", "left")
                .select("doc_id",
                        F.coalesce(F.col("grams"),
                                   F.expr("CAST(array() AS array<bigint>)"))
                        .alias("grams"),
                        F.coalesce(F.col("n_grams"), F.lit(0))
                        .cast("bigint").alias("n_grams")))

    out = open(OUT, "a")

    def emit(row):
        print(json.dumps(row))
        out.write(json.dumps(row) + "\n")
        out.flush()

    # --- unsharded store -----------------------------------------------
    flat = dd.IncrementalContainmentIndex(
        spark, os.path.join(STORE_ROOT, "flat"), buckets=32)
    if flat.table.row_count() < n_docs:
        t0 = time.perf_counter()
        flat.table.overwrite(seed_rows(docs))
        emit({"phase": "seed_flat", "docs": n_docs,
              "sec": round(time.perf_counter() - t0, 2)})

    # --- sharded store (one shard per source) --------------------------
    sharded = dd.ShardedContainmentIndex(
        spark, os.path.join(STORE_ROOT, "sharded"),
        shard_col="source", buckets=32)
    if sharded.shard(sources[0]).table.row_count() == 0:
        t0 = time.perf_counter()
        for s in sources:
            sharded.shard(s).table.overwrite(
                seed_rows(docs.where(F.col("source") == s)))
        emit({"phase": "seed_sharded", "docs": n_docs,
              "shards": len(sources),
              "sec": round(time.perf_counter() - t0, 2)})

    # --- one single-source 500-doc trigger against each ----------------
    off = 10_000_000
    batch = (docs.where(F.col("source") == sources[0]).limit(BATCH_DOCS)
             .select((F.col("doc_id") + off).alias("doc_id"),
                     "text", "source")
             .localCheckpoint(eager=True))

    t0 = time.perf_counter()
    n_pairs_flat = flat.add_and_find(
        batch.drop("source"), "doc_id", "text").count()
    sec_flat = round(time.perf_counter() - t0, 2)
    emit({"phase": "trigger_flat", "stored_docs": n_docs,
          "batch_docs": BATCH_DOCS, "pairs": n_pairs_flat,
          "sec": sec_flat})

    t0 = time.perf_counter()
    n_pairs_sh = sharded.add_and_find(batch, "doc_id", "text").count()
    sec_sh = round(time.perf_counter() - t0, 2)
    emit({"phase": "trigger_sharded", "stored_docs": n_docs,
          "shards": len(sources), "touched_shards": 1,
          "batch_docs": BATCH_DOCS, "pairs": n_pairs_sh,
          "sec": sec_sh, "speedup_vs_flat": round(sec_flat / sec_sh, 2)})
    out.close()
    spark.stop()


if __name__ == "__main__":
    main()
