"""BPE training at realistic merge counts (VERDICT r7 task 5's real
"Done" bar: n_merges=500+).

The gen corpora can't exercise this — their ~200-word synthetic
vocabulary exhausts the merge space at ~105 merges. This bench builds a
corpus with a REALISTIC vocabulary: ``n_words`` distinct syllable-built
words (Zipf-ranked frequencies, like natural text), sampled into docs.
Training cost is then measured at growing merge counts and batch
sizes:

  * per-iteration cost is corpus-size-INDEPENDENT (the word-frequency
    table is the working set) — the corpus only pays one word-count;
  * the driver round-trip per action is the binding cost, so
    ``pair_batch`` is the lever: merges/action is reported so the
    batching-efficiency claim (plateau regimes batch well) is measured,
    not argued.

    python tools/bpe_bench.py            # default sweep
    python tools/bpe_bench.py 2000 32    # n_merges pair_batch

Prints one JSON line per configuration; append results to SCALING.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_WORDS = 30_000
N_DOCS = 20_000
WORDS_PER_DOC = 120


def build_corpus(spark):
    """Zipf-vocabulary corpus: 30k distinct syllable words, doc word
    choice Zipf-ranked (rank-1 word ~2000x the rank-30000 word) — the
    frequency shape BPE plateaus actually come from."""
    rng = random.Random(42)
    syll = [c + v for c in "bcdfghjklmnprstvz" for v in "aeiou"]
    words = list({
        "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
        for _ in range(int(N_WORDS * 1.3))})[:N_WORDS]
    words.sort()
    rng.shuffle(words)
    # zipf sampling via cumulative weights once (python-side, cheap)
    weights = [1.0 / (r + 1) for r in range(len(words))]
    docs = [(i, " ".join(rng.choices(words, weights, k=WORDS_PER_DOC)))
            for i in range(N_DOCS)]
    return spark.createDataFrame(docs, "doc_id long, text string")


def main() -> None:
    from tradingview_data_pipeline_spark.operators import bpe
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("bpe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).localCheckpoint(eager=True)
    n_distinct = bpe.word_freq_table(docs, "text").count()

    if len(sys.argv) > 2:
        sweep = [(int(sys.argv[1]), int(sys.argv[2]),
                  sys.argv[3] if len(sys.argv) > 3 else "auto")]
    else:
        # round 9: the driver-side merge loop (mode='local'/auto) is the
        # production path — measure it at REALISTIC vocabulary sizes
        # (5k/10k/25k merges); keep one distributed point as the
        # comparison baseline (its 0.107 s/merge floor is the measured
        # r8 result the local path exists to remove)
        sweep = [(5000, 1, "local"), (10000, 1, "local"),
                 (25000, 1, "local"), (500, 32, "distributed")]

    for n_merges, pair_batch, mode in sweep:
        stats: dict = {}
        t0 = time.time()
        # checkpoint_every stays SMALL even for big batches: the word
        # table is tiny (one localCheckpoint is cheap) while a deep
        # un-truncated _merge_pair expression chain is evaluated for
        # every word row per action — measured: 500 merges at batch=32
        # with checkpoint_every=32 ran 1.6x SLOWER than batch=8/ckpt=8
        merges = bpe.bpe_train(docs, "text", n_merges=n_merges,
                               pair_batch=pair_batch, mode=mode,
                               stats_out=stats)
        dt = time.time() - t0
        print(json.dumps({
            "bench": "bpe_train", "n_docs": N_DOCS,
            "distinct_words": n_distinct, "n_merges_asked": n_merges,
            "n_merges_got": len(merges), "pair_batch": pair_batch,
            "path": stats.get("path"),
            "sec": round(dt, 2),
            "sec_per_merge": round(dt / max(1, len(merges)), 4),
            "n_actions": stats.get("n_actions"),
            "merges_per_action": round(
                stats.get("merges_per_action", 0.0), 2),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
