"""Measured skew-mitigation bench (SCALING.md §"Skew" evidence).

Synthesizes a deterministically skewed workload — one hot key owning
``HOT_SHARE`` of a multi-million-row fact — and measures the three
claims the engine makes about it:

1. **Skewed algebraic groupBy is a NON-problem**: map-side partial
   aggregation collapses each partition to one row per key before the
   shuffle, so the hot key costs the reducer one row per map task.
   ``salted_aggregate`` is expected ~equal to plain here (it exists for
   the hash-agg-fallback regime: very high per-partition key
   cardinality spilling the partial agg, combined with reduce skew).
2. **Skewed sort-merge join IS a problem without mitigation**: with AQE
   skew-split disabled, the hot key's entire fact slice lands on one
   reduce task (straggler = ~HOT_SHARE of the join in one thread).
3. **Two mitigations fix it**: AQE's skew-join split (runtime re-plan,
   session default) and ``salted_broadcast_left`` (replicate-dim +
   salt, the static fix when AQE can't see the skew — e.g. the skewed
   side feeds a co-partitioned downstream op AQE won't re-split).

Broadcast is disabled for the join comparisons to model a dimension
above the broadcast threshold (at 100 TB the interesting dims don't
broadcast); the bench prints it as the trivial fast path it is.

Usage: python tools/skew_bench.py [rows] [out.jsonl]
Writes one JSON line per measured variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "SKEW_BENCH_r6.jsonl"
HOT_SHARE = 0.5
N_KEYS = 200_000


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators.skew import (
        salted_aggregate, salted_broadcast_left,
    )
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Deterministic skew: even ids -> key 0 (the hot key), odd ids spread
    # uniformly over N_KEYS. No rand(): repeatable across runs.
    fact = (spark.range(ROWS)
            .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                     .otherwise(F.col("id") % N_KEYS).alias("k"),
                    (F.col("id") % 997).cast("double").alias("v"))
            ).localCheckpoint(eager=True)   # isolate gen cost from measurements
    dim = (spark.range(N_KEYS)
           .select(F.col("id").alias("k"),
                   F.concat(F.lit("name_"), F.col("id")).alias("name"))
           ).localCheckpoint(eager=True)

    results = []

    def timed(tag: str, build, conf: dict[str, str] | None = None,
              n: int = 3) -> None:
        saved = {}
        for k, v in (conf or {}).items():
            saved[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        try:
            best = None
            for _ in range(n):
                t0 = time.monotonic()
                build().write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            rows = build().count()          # un-timed: output size context
            rec = {"variant": tag, "rows_out": rows, "best_sec": round(best, 3),
                   "fact_rows": ROWS, "hot_share": HOT_SHARE, "conf": conf or {}}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    # -- 1. algebraic groupBy: plain vs salted (expect ~equal) -------------
    aggs = {"n": "count", "s": "sum:v", "mx": "max:v"}
    timed("groupby_plain",
          lambda: fact.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                        F.sum("v").alias("s"),
                                        F.max("v").alias("mx")))
    timed("groupby_salted", lambda: salted_aggregate(fact, "k", aggs,
                                                     buckets=32))

    # -- 2/3. skewed join: straggler vs AQE split vs salted ---------------
    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    timed("join_sortmerge_no_mitigation",
          lambda: fact.join(dim, "k"),
          conf={**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"})
    timed("join_sortmerge_aqe_skew_split",
          lambda: fact.join(dim, "k"),
          conf={**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                    "8m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"})
    timed("join_salted_replicated_dim",
          lambda: salted_broadcast_left(fact, dim, "k", buckets=32,
                                        how="inner"),
          conf={**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"})
    # reference point: the trivial path when the dim CAN broadcast
    timed("join_broadcast_dim",
          lambda: fact.join(F.broadcast(dim), "k"))

    with open(OUT, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
