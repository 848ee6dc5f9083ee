"""Incremental-index scale curve: add_and_find at FIXED batch size as
the stored index grows 10x / 100x (VERDICT r7 task 1's "Done" bar).

The round-8 join-shape fix makes each micro-batch's PLAN O(batch): the
stored signature table streams under broadcast joins instead of being
shuffled per trigger. This bench is the curve that would have caught
the old shape — seed each index with the gen corpus at three decades
(5k / 50k / 500k docs), then time one add_and_find of the SAME
500-doc batch against each. Flat (per calibration drift) = fixed; a
decade-over-decade ratio near 10x = O(index) regression.

Seeding goes through the table handle's bulk ``overwrite`` (one job)
rather than thousands of add_and_find calls — the measurement is the
per-batch marginal cost, not index construction.

    python tools/incremental_bench.py .scale/gen_sf0.1 .scale/gen_sf1 \
        .scale/gen_sf10

Prints one JSON line per (index, scale); append to SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# INCR_BATCH / INCR_BUCKETS environment knobs (round 9): the banded
# store's read pruning is governed by (batch x bands) / bucket_count —
# the crossover run uses a small batch + many buckets so touched-
# directory pruning actually has something to prune (at batch 500 x
# 4 bands over 32 buckets every directory is touched and "pruned"
# reads degenerate to full scans, NOTES 34).
BATCH_DOCS = int(os.environ.get("INCR_BATCH", "500"))
BATCH_VECS = int(os.environ.get("INCR_BATCH", "500"))
BUCKETS = int(os.environ.get("INCR_BUCKETS", "32"))


def main() -> None:
    # --indexes=a,b,c restricts the run (e.g. the gen_sf100 banded-vs-
    # scan crossover run only needs minhash+minhash_banded)
    only = None
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--indexes="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            args.append(a)
    sf_dirs = [os.path.abspath(d) for d in args] or [
        os.path.abspath(f".scale/gen_sf{s}") for s in ("0.1", "1", "10")]

    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import dedup as dd
    from tradingview_data_pipeline_spark.operators import similarity as sim
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("incremental-bench")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n_docs, n_vecs = docs.count(), vecs.count()
        # the batch: real corpus texts/vectors re-keyed past the corpus,
        # so collisions against the stored side genuinely occur
        doc_batch = (docs.limit(BATCH_DOCS)
                     .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                             "text").localCheckpoint(eager=True))
        vec_batch = (vecs.limit(BATCH_VECS)
                     .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                             "embedding").localCheckpoint(eager=True))

        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)") \
            .collect()
        calibration = round(time.perf_counter() - t0, 3)

        with tempfile.TemporaryDirectory() as tmp:
            runs = []
            want = lambda n: only is None or n in only  # noqa: E731
            sig = None
            if want("minhash") or want("minhash_banded"):
                # one signature computation seeds BOTH modes
                sig = dd._minhash_agg(docs, "doc_id", "text", 8) \
                    .localCheckpoint(eager=True)
            if want("minhash"):
                mh = dd.IncrementalNearDupIndex(
                    spark, os.path.join(tmp, "mh"), buckets=BUCKETS)
                mh.table.overwrite(sig)
                runs.append(("minhash", mh, doc_batch, n_docs))
            if want("minhash_banded"):
                # banded-store mode: seed the signature table, then the
                # public migration path builds the membership store
                mb = dd.IncrementalNearDupIndex(
                    spark, os.path.join(tmp, "mb"), buckets=BUCKETS,
                    banded_store=True)
                mb.table.overwrite(sig)
                mb.rebuild_store()
                runs.append(("minhash_banded", mb, doc_batch, n_docs))
            if want("simhash"):
                sh = dd.IncrementalSimHashIndex(
                    spark, os.path.join(tmp, "sh"), buckets=BUCKETS)
                sh.table.overwrite(dd.simhash_table(docs, "doc_id", "text",
                                                    bits=sh.bits))
                runs.append(("simhash", sh, doc_batch, n_docs))
            if want("embedding"):
                em = sim.IncrementalEmbeddingIndex(
                    spark, os.path.join(tmp, "em"), buckets=BUCKETS)
                em.table.overwrite(em._wide(vecs, "vec_id", "embedding"))
                runs.append(("embedding", em, vec_batch, n_vecs))
            cx_modes = [m for m in ("containment", "containment_scan",
                                    "containment_arrow") if want(m)]
            if cx_modes:
                from tradingview_data_pipeline_spark.operators import (
                    corpus as cp)
                # seed with the SAME register-empty contract as
                # add_and_find: sub-8-word docs get an empty-set row,
                # so stored_rows truly equals n_docs
                agg = (cp.span_gram_counts(docs, "doc_id", "text", n=8)
                       .groupBy("doc_id")
                       .agg(F.collect_list("h").alias("grams"),
                            F.count(F.lit(1)).alias("n_grams")))
                seed = (docs.select("doc_id").distinct()
                        .join(agg, "doc_id", "left")
                        .select("doc_id",
                                F.coalesce(F.col("grams"), F.expr(
                                    "CAST(array() AS array<bigint>)"))
                                .alias("grams"),
                                F.coalesce(F.col("n_grams"), F.lit(0))
                                .cast("bigint").alias("n_grams"))
                        .localCheckpoint(eager=True))
                for m in cx_modes:
                    probe = {"containment": "auto",
                             "containment_scan": "scan",
                             "containment_arrow": "arrow"}[m]
                    cx = dd.IncrementalContainmentIndex(
                        spark, os.path.join(tmp, f"cx_{probe}"),
                        buckets=BUCKETS, probe=probe)
                    cx.table.overwrite(seed)
                    runs.append((m, cx, doc_batch, n_docs))

            for name, idx, batch, stored in runs:
                t0 = time.perf_counter()
                pairs = idx.add_and_find(batch)
                n_pairs = pairs.count()
                secs = round(time.perf_counter() - t0, 3)
                print(json.dumps({
                    "index": name, "sf_dir": sf_dir, "stored_rows": stored,
                    "batch_rows": BATCH_DOCS, "buckets": BUCKETS, "pairs": n_pairs,
                    "add_and_find_sec": secs,
                    "calibration_sec": calibration}), flush=True)

            if not want("lines_store"):
                continue
            # the builder's line-prevalence store: seed (lh, doc) pairs
            # from the whole corpus, then time ONE _global_line_stage +
            # pair commit on the fixed batch — the same flat-at-10x/100x
            # bar as the indexes (read is bucket-pruned on the batch's
            # line hashes, so cost must track the batch, not the store)
            from pyspark.sql import types as T

            from tradingview_data_pipeline_spark.operators.merge import (
                ParquetTable)
            from tradingview_data_pipeline_spark.plans.corpus_pipeline import (
                IncrementalCorpusBuilder)

            lines_t = ParquetTable(
                spark, os.path.join(tmp, "lines"),
                T.StructType([T.StructField("lh", T.LongType()),
                              T.StructField("doc", T.LongType())]),
                "lh", buckets=BUCKETS)
            txt = F.coalesce(F.col("text"), F.lit(""))
            lines_t.overwrite(
                docs.select(F.col("doc_id").alias("doc"),
                            F.explode(F.split(txt, "\n")).alias("l"))
                .where(F.translate(F.col("l"), " \t\f\r\x0b", "") != "")
                .select("doc", F.xxhash64("l").alias("lh")).distinct())
            stub = type("S", (), {})()
            stub.dedupe_global_lines, stub.lines = 2, lines_t
            t0 = time.perf_counter()
            cleaned, new_pairs, n_hot = \
                IncrementalCorpusBuilder._global_line_stage(stub, doc_batch)
            cleaned.write.format("noop").mode("overwrite").save()
            lines_t.merge_with(
                new_pairs, lambda tgt, src: tgt.unionByName(
                    src.join(tgt, ["lh", "doc"], "left_anti")))
            print(json.dumps({
                "index": "lines_store", "sf_dir": sf_dir,
                "stored_rows": n_docs, "batch_rows": BATCH_DOCS, "buckets": BUCKETS,
                "hot_lines": n_hot,
                "add_and_find_sec": round(time.perf_counter() - t0, 3),
                "calibration_sec": calibration}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
