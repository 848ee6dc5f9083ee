"""SemDeDup decade curve at the PRODUCTION clustering shape.

q77 pins correctness with the oracle-checkable 10-label clustering, but
real SemDeDup (Abbas et al. 2023 §3) scales k WITH the corpus so the
per-cluster pairwise stays bounded — at a fixed k the within-cluster
join is (n/k)² per cluster and the ``max_bucket`` guard eventually
blanks it (by design: "re-cluster with a finer quantizer").  This tool
measures that production path: per scale it

1. seeds k = max(10, n // TARGET) clusters by hashing the vec id,
2. runs ONE Lloyd iteration (group_centroids_quantized →
   with_nearest_centroid → recompute) to turn the random cells into
   geometry-respecting ones,
3. times ``semantic_dedup`` end-to-end through the noop sink, and
4. counts duplicate groups + dropped rows (the generator plants a
   cos≈0.98 near-dup every 40th vector, so the expected drop count is
   ~n/40 — a visible recall signal, not just a timing).

Also times the two assignment backends head-to-head per scale: the
expression-fold (`with_nearest_centroid`, oracle path) is O(k·d)
INTERPRETED work per row and became the pipeline bottleneck as k grew
with the corpus (at k=800 the decade-3 fold run had not finished after
35 min and was killed); `with_nearest_centroid_blas` replaces it with
one numpy matmul per Arrow batch.  The dedup runs use the BLAS path —
the production configuration.

Usage:  python tools/semdedup_bench.py [sf_dir ...]
Appends one JSON line per scale; default dirs are the .scale decades.
Set SEMDD_SKIP_FOLD=1 to skip the fold-assignment timing at scales
where it is already known to be prohibitive.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET = 250            # target cluster population
THRESHOLD = 0.9         # planted pairs are cos~0.98; random 64-dim pairs ~N(0, 1/64)


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import similarity as sim
    from tradingview_data_pipeline_spark.session import get_spark

    sf_dirs = [os.path.abspath(d) for d in sys.argv[1:]] or [
        os.path.abspath(f".scale/gen_sf{s}") for s in ("0.1", "1", "10")]
    spark = get_spark("semdedup-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n = e.count()
        k = max(10, n // TARGET)

        t0 = time.perf_counter()
        seeded = e.withColumn("__b", F.pmod(F.hash("vec_id"), F.lit(k)))
        c0 = sim.group_centroids_quantized(seeded, "__b", "embedding") \
                .localCheckpoint()
        a1 = sim.with_nearest_centroid_blas(e, "embedding", c0, "__b")
        c1 = sim.group_centroids_quantized(a1, "assigned", "embedding") \
                .localCheckpoint()
        cluster_sec = time.perf_counter() - t0

        rec = {"sf_dir": os.path.basename(sf_dir), "n_vecs": n, "k": k,
               "cluster_sec": round(cluster_sec, 2),
               "planted_expected": n // 40}

        # assignment backends head-to-head (one noop write each)
        t0 = time.perf_counter()
        sim.with_nearest_centroid_blas(e, "embedding", c1, "assigned") \
            .write.format("noop").mode("overwrite").save()
        rec["assign_blas_sec"] = round(time.perf_counter() - t0, 2)
        # round-9 exact-integer backend (with_nearest_centroid_int —
        # the oracle-checkable large-k path q77 registers): same numpy
        # matmul shape as BLAS but int64 — the price of bit-stability
        t0 = time.perf_counter()
        ci = sim.group_centroids_int(a1, "assigned", "embedding") \
            .localCheckpoint()
        sim.with_nearest_centroid_int(e, "embedding", ci, "assigned") \
            .write.format("noop").mode("overwrite").save()
        rec["assign_int_sec"] = round(time.perf_counter() - t0, 2)
        if not os.environ.get("SEMDD_SKIP_FOLD"):
            t0 = time.perf_counter()
            sim.with_nearest_centroid(e, "embedding", c1, "assigned") \
                .write.format("noop").mode("overwrite").save()
            rec["assign_fold_sec"] = round(time.perf_counter() - t0, 2)

        for probes in (1, 2):
            t0 = time.perf_counter()
            out = sim.semantic_dedup(e, "vec_id", "embedding", c1,
                                     "assigned", threshold=THRESHOLD,
                                     probes=probes, assign_method="blas")
            out.write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            agg = out.agg(
                F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("dropped")
            ).collect()[0]
            rec[f"p{probes}_sec"] = round(sec, 2)
            rec[f"p{probes}_dropped"] = agg["dropped"]

        # round-9 PCA pre-step leg: project 64→SEMDD_PCA_DIM (uncentered,
        # cosine-preserving for near-identical pairs), re-cluster in the
        # reduced space, dedup at probes=2.  Timed end-to-end INCLUDING
        # the fit/projection — the honest comparison against p2_sec;
        # pca_dropped vs planted_expected is the recall signal (lower-d
        # cosines are noisier, so candidate verification still gates).
        pca_dim = int(os.environ.get("SEMDD_PCA_DIM", "16"))
        if pca_dim:
            t0 = time.perf_counter()
            pm = sim.pca_fit(e, "embedding", pca_dim, center=False)
            pe = sim.pca_project(e, "embedding", pm).localCheckpoint()
            seeded_p = pe.withColumn(
                "__b", F.pmod(F.hash("vec_id"), F.lit(k)))
            pc0 = sim.group_centroids_quantized(seeded_p, "__b",
                                                "embedding") \
                .localCheckpoint()
            pa1 = sim.with_nearest_centroid_blas(pe, "embedding", pc0,
                                                 "__b")
            pc1 = sim.group_centroids_quantized(pa1, "assigned",
                                                "embedding") \
                .localCheckpoint()
            out = sim.semantic_dedup(pe, "vec_id", "embedding", pc1,
                                     "assigned", threshold=THRESHOLD,
                                     probes=2, assign_method="blas",
                                     verify_vectors=e,
                                     candidate_threshold=THRESHOLD - 0.1)
            out.write.format("noop").mode("overwrite").save()
            rec["pca_dim"] = pca_dim
            rec["pca_p2_sec"] = round(time.perf_counter() - t0, 2)
            rec["pca_p2_dropped"] = out.agg(
                F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            ).collect()[0][0]
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
