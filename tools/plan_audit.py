"""Executed-plan audit across the whole query registry.

For every ``queries()`` entry, builds the plan against a sf dir and
counts the structural features that matter at 100 TB: exchanges
(shuffles), broadcast joins, sort-merge joins, broadcast nested loops
(legitimate only for tiny broadcast probes), cartesian products (never
legitimate — exit 1), parquet scans, and WholeStageCodegen spans.
Usage:

    python tools/plan_audit.py [sf_dir] [query ...]

Prints one line per query plus a summary; write the output next to
BENCH artifacts when auditing a round.

Caveat: plans are audited BEFORE execution, so with AQE the string is
the un-finalized adaptive plan — ``codegen`` spans typically read 0
(they materialize per-stage at runtime) and broadcast decisions may
still improve adaptively. The cartesian/shuffle/scan counts — the
structural hazards — are already decided at this point.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = {
    "exch": "Exchange ",
    "bcast": "BroadcastExchange",
    "smj": "SortMergeJoin",
    "bhj": "BroadcastHashJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "scan": "Scan parquet",
    "codegen": "WholeStageCodegen",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    bad = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            print(f"ERR   {name}: {type(e).__name__}: {e}"[:200])
            bad += 1
            continue
        counts = {k: plan.count(v) for k, v in FEATURES.items()}
        flag = ""
        if counts["cartesian"]:
            flag = "  <-- CARTESIAN"
            bad += 1
        print("  ".join([f"{name:28s}"]
                        + [f"{k}={counts[k]}" for k in FEATURES]) + flag)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
