"""Decade curves for the round-9 learned-filter additions.

* ``logreg_train`` — the fastText-style quality filter.  Label: doc
  contains the near-dup marker token "dup" (the gen corpora plant it in
  ~5% of docs — a real, learnable, corpus-wide signal).  Records
  featurize+train wall time, per-iteration time (the featurized corpus
  is pinned, so each iteration is one map-only scan + a vocabulary-
  bounded gradient shuffle — the per-iteration curve IS the scale
  claim), and first/last loss (the model must actually learn).
* ``pca_fit`` + ``pca_project`` over the embeddings table — the
  one-pass exact-moment fit (only moment cells move) and the map-only
  projection, timed separately.

Usage:  python tools/logreg_pca_bench.py [sf_dir ...]
Appends one JSON line per scale; defaults to the .scale gen decades.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 5
PCA_DIM = 16


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import classify as cl
    from tradingview_data_pipeline_spark.operators import similarity as sim
    from tradingview_data_pipeline_spark.session import get_spark

    sf_dirs = [os.path.abspath(d) for d in sys.argv[1:]] or [
        os.path.abspath(f".scale/gen_sf{s}") for s in ("0.1", "1", "10")]
    spark = get_spark("logreg-pca-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        labeled = docs.withColumn(
            "y", F.array_contains(F.split(F.col("text"), r"\s+"), "dup"))
        n_docs = labeled.count()
        rec = {"sf_dir": os.path.basename(sf_dir), "n_docs": n_docs,
               "iters": ITERS}

        t0 = time.perf_counter()
        model = cl.logreg_train(labeled, "text", "y",
                                iters=ITERS, lr=1.0)
        total = time.perf_counter() - t0
        rec["logreg_total_sec"] = round(total, 2)
        rec["logreg_sec_per_iter"] = round(total / ITERS, 2)
        rec["loss_first"] = round(model.history[0], 4)
        rec["loss_last"] = round(model.history[-1], 4)
        rec["nonzero_weights"] = model.weights.count()

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        rec["n_vecs"] = emb.count()
        t0 = time.perf_counter()
        pm = sim.pca_fit(emb, "embedding", PCA_DIM, center=False)
        rec["pca_fit_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        sim.pca_project(emb, "embedding", pm) \
            .write.format("noop").mode("overwrite").save()
        rec["pca_project_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
