"""Dump ``.explain("formatted")`` for registry queries into a directory.

Used by the optimization rounds to snapshot plan shapes before/after a
change (plans/r<N>/<query>_<tag>.txt). Pre-execution plans (cheap: no
action run), so AQE prints the initial sketch — structural features
(Exchange count, join strategy, PushedFilters, ReadSchema,
Batch/ArrowEvalPython) are all visible at this stage.

Usage:

    python tools/plan_dump.py <out_dir> <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]

    os.makedirs(out_dir, exist_ok=True)

    from tradingview_data_pipeline_spark.session import get_spark
    from tradingview_data_pipeline_spark.operators import pins
    import __spark_entry__ as entrymod

    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    if names:
        queries = {n: queries[n] for n in names}

    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        finally:
            pins.release_all()
            pins.release_checkpoints()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
