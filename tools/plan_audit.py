"""Executed-plan audit across the whole query registry.

For every ``queries()`` entry, EXECUTES the query through the built-in
``noop`` sink, then audits the FINALIZED adaptive plan — the one AQE
actually ran, not the pre-execution sketch. Counts the structural
features that matter at 100 TB: exchanges (shuffles), exchange REUSE,
broadcast joins, sort-merge joins, broadcast nested loops (legitimate
only for tiny broadcast probes), cartesian products (never legitimate —
exit 1), parquet scans, and whole-stage-codegen spans.

Usage:

    python tools/plan_audit.py [sf_dir] [query ...]

Prints one line per query plus a summary; write the output next to
BENCH artifacts when auditing a round.

Post-execution the ``AdaptiveSparkPlan`` prints with
``isFinalPlan=true``: codegen spans appear as ``*(n)`` stage markers
(counted as DISTINCT ids) and runtime decisions (AQE broadcast
upgrades, ReusedExchange dedup) are visible — pre-execution these read
0 and the audit was blind to them.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = {
    "exch": "Exchange ",
    "reuse": "ReusedExchange",
    "bcast": "BroadcastExchange",
    "smj": "SortMergeJoin",
    "bhj": "BroadcastHashJoin",
    "bnlj": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "scan": "Scan parquet",
}


def audit_plan(plan: str) -> dict:
    # a finalized AdaptiveSparkPlan prints "<final plan> == Initial Plan ==
    # <initial>" — count only the plan that ran
    plan = plan.split("== Initial Plan ==")[0]
    counts = {k: plan.count(v) for k, v in FEATURES.items()}
    # executedPlan.toString renders each whole-stage-codegen span as a
    # "*(n)" prefix on its member operators — distinct ids = span count
    counts["codegen"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    counts["final"] = int("isFinalPlan=true" in plan
                          or "AdaptiveSparkPlan" not in plan)
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tradingview_data_pipeline_spark.operators import pins
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    pins.CAPTURE_PLANS = True   # capture is opt-in (r13: unbounded growth)
    cols = list(FEATURES) + ["codegen", "final"]
    bad = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        stale = pins.drain_substrate_plans()   # don't attribute stale captures
        if stale:
            print(f"  (discarded {len(stale)} stale substrate captures)")
        try:
            df = fn(spark, sf_dir)
            t0 = time.monotonic()
            # execute the frame's OWN QueryExecution so ITS adaptive plan
            # finalizes (a noop-sink write spawns a separate execution and
            # leaves df's plan un-finalized); results are discarded
            df.collect()
            secs = time.monotonic() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            print(f"ERR   {name}: {type(e).__name__}: {e}"[:200])
            bad += 1
            continue
        rows = [(name, plan)]
        # r12 (VERDICT r11 "what's wrong" #4): eager checkpoints truncate
        # lineage, hiding everything upstream of a pin from the audit.
        # pins.checkpoint records each substrate's own finalized plan;
        # audit those too so q28/q83/q84-style pipelines show their REAL
        # scan/exchange counts and a cartesian above a pin cannot hide.
        rows += [(f"{name}[sub{i}:{lbl}]", p) for i, (lbl, p)
                 in enumerate(pins.drain_substrate_plans())]
        pins.release_all()
        pins.release_checkpoints()
        for rname, rplan in rows:
            counts = audit_plan(rplan)
            flag = ""
            if counts["cartesian"]:
                flag = "  <-- CARTESIAN"
                bad += 1
            # substrate rows share the parent's execution — print the
            # timing only on the parent row (r13 advisor catch)
            sec = f"  sec={secs:.2f}" if rname == name else "  sec=-"
            print("  ".join([f"{rname:28s}"]
                            + [f"{k}={counts[k]}" for k in cols])
                  + sec + flag)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
