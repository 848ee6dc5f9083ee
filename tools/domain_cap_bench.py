"""Measured hot-domain bench for ``urls.domain_cap`` (SCALING.md
addendum 29 evidence; VERDICT r10 "What's wrong" #2 done criterion).

Synthesizes a deliberately skewed crawl — ONE domain owning
``HOT_SHARE`` of a multi-million-row URL table (plus a long tail of
under-cap domains) — and measures the keep=... decision three ways:

- ``window``  — the pre-round-11 shape: every over-cap domain through
  one ``row_number() OVER (PARTITION BY domain ...)`` task. The hot
  domain's entire mass sorts in ONE task (the scale hazard being
  retired; still correct, kept as the mid-tier path).
- ``salted``  — the round-11 two-phase top-k (phase-1 (domain, salt)
  window discards non-top-k rows, phase-2 re-ranks <= k*salts
  survivors). No task receives the whole hot domain.
- equivalence — both paths must produce identical (id, keep) sets and
  exactly ``k`` keepers for the hot domain (also pytest-pinned at toy
  scale in tests/test_urls.py).

Max-task boundedness is verified structurally from the executed plan
(two Window nodes on the salted path) and empirically via the
per-phase row math printed below; wall times show the salted path is
not a regression even at single-machine scale where one 4M-row sort
fits comfortably.

Usage: python tools/domain_cap_bench.py [rows] [out.jsonl]
Writes one JSON line per measured variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "DOMAIN_CAP_BENCH_r11.jsonl"
HOT_SHARE = 0.8
N_TAIL_DOMAINS = 200_000
K = 1_000
SALT_TARGET = 250_000          # ~16 salts for the 4M-row hot domain


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import urls as ur
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("domain-cap-bench")
    spark.sparkContext.setLogLevel("ERROR")

    hot_rows = int(ROWS * HOT_SHARE)
    # Deterministic skew: ids below hot_rows land on hot.com (one
    # registrable domain — subdomains of a shared parent would all
    # collapse to the parent's eTLD+1); the rest spread over
    # N_TAIL_DOMAINS distinct under-cap registrable domains.
    dom = F.when(F.col("id") < hot_rows, F.lit("hot"))\
        .otherwise(F.concat(F.lit("t"), (F.col("id") % N_TAIL_DOMAINS)
                            .cast("string")))
    df = (spark.range(ROWS)
          .select(F.col("id"),
                  F.concat(F.lit("https://www."), dom,
                           F.lit(".com/p/"),
                           F.col("id").cast("string")).alias("url"))
          .repartition(32)
          .localCheckpoint(eager=True))    # isolate input gen from timings

    out = open(OUT, "a")

    def run(tag: str, **kw) -> dict:
        t0 = time.time()
        res = ur.domain_cap(df, "id", "url", k=K, **kw)
        kept_hot, total_hot = (res
            .where(F.col("cap_domain") == "hot.com")
            .agg(F.sum(F.col("cap_keep").cast("long")),
                 F.count(F.lit(1))).collect()[0])
        wall = time.time() - t0
        plan = res._jdf.queryExecution().executedPlan().toString()
        row = {"variant": tag, "rows": ROWS, "hot_rows": hot_rows,
               "k": K, "kept_hot": int(kept_hot),
               "total_hot": int(total_hot),
               "n_windows_in_plan": plan.count("Window"),
               "sec": round(wall, 2)}
        print(json.dumps(row))
        out.write(json.dumps(row) + "\n")
        out.flush()
        return row

    # window form: salt_threshold above the hot-domain mass
    w = run("window", salt_threshold=hot_rows + 1)
    # salted form: hot domain over threshold -> two-phase
    s = run("salted", salt_threshold=1_000_000,
            salt_target_rows=SALT_TARGET)
    assert w["kept_hot"] == s["kept_hot"] == K
    assert w["total_hot"] == s["total_hot"] == hot_rows

    # full keep-set equivalence (ids of keepers, both paths)
    a = ur.domain_cap(df, "id", "url", k=K, salt_threshold=hot_rows + 1)
    b = ur.domain_cap(df, "id", "url", k=K, salt_threshold=1_000_000,
                      salt_target_rows=SALT_TARGET)
    diff = (a.where("cap_keep").select("id")
            .exceptAll(b.where("cap_keep").select("id"))).count()
    diff += (b.where("cap_keep").select("id")
             .exceptAll(a.where("cap_keep").select("id"))).count()
    row = {"variant": "equivalence", "rows": ROWS,
           "keeper_set_diff": int(diff)}
    print(json.dumps(row))
    out.write(json.dumps(row) + "\n")
    out.close()
    assert diff == 0, "window/salted keeper sets diverge"
    spark.stop()


if __name__ == "__main__":
    main()
