"""End-to-end corpus-prep pipeline scale curve (VERDICT r7 task 7).

Runs ``plans.corpus_pipeline.run_corpus_prep`` — the full
dedup -> cluster -> gate -> redact -> split -> shard composition — at
each given sf dir and prints wall time plus the per-stage row
accounting the job returns, so the end-to-end composition (two
corpus-sized shuffles: content-hash dedup and the LSH band join;
everything else keyed or map-side) is MEASURED across decades, not
argued per-operator.

    python tools/corpus_prep_bench.py .scale/gen_sf0.1 .scale/gen_sf1 \
        .scale/gen_sf10

One JSON line per scale; append to SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = [os.path.abspath(d) for d in sys.argv[1:]] or [
        os.path.abspath(f".scale/gen_sf{s}") for s in ("0.1", "1", "10")]

    from tradingview_data_pipeline_spark.plans.corpus_pipeline import (
        run_corpus_prep,
    )
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("corpus-prep-bench")
    spark.sparkContext.setLogLevel("ERROR")

    lsh_k = int(os.environ.get("CORPUS_PREP_LSH_K", "16"))
    # 'N,SEQ' -> also run the tokenize-and-pack stage (N merges, SEQ-id
    # sequences); its wall time is reported separately so the stage's
    # own decade ratio is visible next to the dedup-bound pipeline's
    tok_spec = os.environ.get("CORPUS_PREP_TOKENIZE")
    tok_pack = tuple(int(x) for x in tok_spec.split(",")) if tok_spec \
        else None
    # CORPUS_PREP_LINES=1 -> also run the line-cleaning stages
    # (within-doc dedupe_lines + corpus-global dedupe_lines_global at
    # min_docs=2), so the full text-rewrite cascade is measured
    lines_on = os.environ.get("CORPUS_PREP_LINES") == "1"
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)") \
            .collect()
        calibration = round(time.perf_counter() - t0, 3)
        out = tempfile.mkdtemp(prefix="corpus_prep_bench_")
        try:
            t0 = time.perf_counter()
            metrics = run_corpus_prep(
                spark, docs, out, lsh_k=lsh_k,
                dedupe_repeated_lines=lines_on,
                dedupe_global_lines=2 if lines_on else None)
            secs = round(time.perf_counter() - t0, 3)
            tok_secs = None
            if tok_pack:
                from tradingview_data_pipeline_spark.plans.corpus_pipeline \
                    import _tokenize_and_pack
                t0 = time.perf_counter()
                metrics.update(_tokenize_and_pack(
                    spark, out, "doc_id", tok_pack, None,
                    has_train=metrics["train_rows"] > 0))
                tok_secs = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out + "_sequences", ignore_errors=True)
            shutil.rmtree(out + "_tokenizer", ignore_errors=True)
        print(json.dumps({"sf_dir": sf_dir, "lsh_k": lsh_k,
                          "lines": lines_on,
                          "pipeline_sec": secs,
                          "tokenize_pack_sec": tok_secs,
                          "calibration_sec": calibration, **metrics}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
