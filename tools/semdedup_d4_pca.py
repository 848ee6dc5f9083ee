"""Decade-4 point for the verified projected-space SemDeDup composition
(SCALING addendum 25's table, extended to 2M vectors / k=8000).

Runs ONLY the two rows that matter at this scale — full-d probes=2 vs
PCA-16 + full-d verification — plus the shared clustering; the
assignment-backend micro-benches already have four decades of rows.

Usage:  python tools/semdedup_d4_pca.py [sf_dir]   (default gen_sf100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET = 250
THRESHOLD = 0.9
PCA_DIM = 16


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import pins
    from tradingview_data_pipeline_spark.operators import similarity as sim
    from tradingview_data_pipeline_spark.session import get_spark

    sf_dir = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                             else ".scale/gen_sf100")
    spark = get_spark("semdedup-d4")
    spark.sparkContext.setLogLevel("ERROR")
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
    rec = {"sf_dir": os.path.basename(sf_dir), "n_vecs": n, "k": k,
           "cluster_sec": round(time.perf_counter() - t0, 2),
           "planted_expected": n // 40, "pca_dim": PCA_DIM}

    t0 = time.perf_counter()
    out = sim.semantic_dedup(e, "vec_id", "embedding", c1, "assigned",
                             threshold=THRESHOLD, probes=2,
                             assign_method="blas")
    out.write.format("noop").mode("overwrite").save()
    rec["p2_sec"] = round(time.perf_counter() - t0, 2)
    rec["p2_dropped"] = out.agg(
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))).collect()[0][0]
    pins.release_all()

    t0 = time.perf_counter()
    pm = sim.pca_fit(e, "embedding", PCA_DIM, center=False)
    pe = sim.pca_project(e, "embedding", pm).localCheckpoint()
    seeded_p = pe.withColumn("__b", F.pmod(F.hash("vec_id"), F.lit(k)))
    pc0 = sim.group_centroids_quantized(seeded_p, "__b", "embedding") \
        .localCheckpoint()
    pa1 = sim.with_nearest_centroid_blas(pe, "embedding", pc0, "__b")
    pc1 = sim.group_centroids_quantized(pa1, "assigned", "embedding") \
        .localCheckpoint()
    out = sim.semantic_dedup(pe, "vec_id", "embedding", pc1, "assigned",
                             threshold=THRESHOLD, probes=2,
                             assign_method="blas", verify_vectors=e,
                             candidate_threshold=THRESHOLD - 0.1)
    out.write.format("noop").mode("overwrite").save()
    rec["pca_p2_sec"] = round(time.perf_counter() - t0, 2)
    rec["pca_p2_dropped"] = out.agg(
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))).collect()[0][0]
    pins.release_all()
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
