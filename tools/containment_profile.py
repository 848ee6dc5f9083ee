"""Phase-by-phase profile of one IncrementalContainmentIndex trigger at a
given store scale — the round-10 instrument for the decade-4 'store-scan
bound' diagnosis. Seeds ONCE into a reusable dir (--store=PATH kept across
runs), then times each phase of add_and_find separately."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    store = sys.argv[2]
    probe = sys.argv[3] if len(sys.argv) > 3 else "scan"
    buckets = int(os.environ.get("INCR_BUCKETS", "32"))

    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import corpus as cp
    from tradingview_data_pipeline_spark.operators import dedup as dd
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("containment-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    off = int(os.environ.get("BATCH_OFFSET", "10000000"))
    batch = (docs.limit(500)
             .select((F.col("doc_id") + off).alias("doc_id"), "text")
             .localCheckpoint(eager=True))

    idx = dd.IncrementalContainmentIndex(spark, store, buckets=buckets,
                                         probe=probe)
    if not idx.table.exists() or idx.table.row_count() < 100:
        t0 = time.perf_counter()
        agg = (cp.span_gram_counts(docs, "doc_id", "text", n=8)
               .groupBy("doc_id")
               .agg(F.collect_list("h").alias("grams"),
                    F.count(F.lit(1)).alias("n_grams")))
        idx.table.overwrite(
            docs.select("doc_id").distinct()
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("grams"),
                               F.expr("CAST(array() AS array<bigint>)"))
                    .alias("grams"),
                    F.coalesce(F.col("n_grams"), F.lit(0))
                    .cast("bigint").alias("n_grams")))
        print(json.dumps({"seed_sec": round(time.perf_counter() - t0, 1),
                          "rows": idx.table.row_count()}), flush=True)

    # --- phases (mirrors add_and_find's structure) ---
    ph = {}

    def tick(name, t0):
        ph[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    b = batch.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    dup = (b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
           .where(F.col("c") > 1).limit(1).collect())
    assert not dup
    tick("dup_check", t0)

    t0 = time.perf_counter()
    agg = (cp.span_gram_counts(b, "doc_id", "text", n=idx.n)
           .groupBy("doc_id")
           .agg(F.collect_list("h").alias("grams"),
                F.count(F.lit(1)).alias("n_grams")))
    new_rows = (b.select("doc_id").distinct()
                .join(agg, "doc_id", "left")
                .select("doc_id",
                        F.coalesce(F.col("grams"),
                                   F.expr("CAST(array() AS array<bigint>)"))
                        .alias("grams"),
                        F.coalesce(F.col("n_grams"), F.lit(0))
                        .cast("bigint").alias("n_grams"))
                .localCheckpoint(eager=True))
    tick("batch_grams", t0)

    new_ids = new_rows.select("doc_id")
    new_g = new_rows.select("doc_id", F.explode("grams").alias("h"))

    t0 = time.perf_counter()
    if probe == "arrow":
        stored_g = idx._arrow_probe(new_rows)
    else:
        stored_g = (idx.table.read()
                    .join(F.broadcast(new_ids), "doc_id", "left_anti")
                    .select("doc_id", F.explode("grams").alias("h")))
    raw = dd._batch_vs_stored_pairs(new_g, stored_g, ["h"], "doc_id",
                                    idx.max_gram_docs)
    shared = (raw.groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("shared"))
              .localCheckpoint(eager=True))
    tick("probe_pairs", t0)

    t0 = time.perf_counter()
    directed = shared.unionByName(
        shared.select(F.col("id_b").alias("id_a"),
                      F.col("id_a").alias("id_b"), "shared"))
    partners = directed.select(F.col("id_a").alias("doc_id")).distinct()
    sizes = (new_rows.select("doc_id", "n_grams").unionByName(
        idx.table.read_matching(partners)
        .join(F.broadcast(partners), "doc_id", "left_semi")
        .join(F.broadcast(new_ids), "doc_id", "left_anti")
        .select("doc_id", "n_grams")))
    out = (directed
           .join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
           .withColumn("containment",
                       F.col("shared").cast("double")
                       / F.col("n_grams").cast("double"))
           .where(F.col("containment") >= F.lit(idx.threshold))
           .select(F.col("id_a").alias("doc_id"),
                   F.col("id_b").alias("partner_doc_id"),
                   "shared", "n_grams", "containment")
           .localCheckpoint(eager=True))
    tick("sizes_out", t0)

    t0 = time.perf_counter()
    idx.table.merge_upsert(new_rows)
    tick("upsert", t0)

    n_pairs = out.count()
    print(json.dumps({"probe": probe, "buckets": buckets,
                      "stored": idx.table.row_count() - 500,
                      "pairs": n_pairs, "phases": ph,
                      "total": round(sum(ph.values()), 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
