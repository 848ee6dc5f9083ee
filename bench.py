"""Benchmark harness: runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the three
reference pipeline jobs at the REFERENCE'S OWN data scale (1,384-row CSV
upload, 1,643-row composite/fundamental scoring — BASELINE.md rows 1,3,7)
for a direct apples-to-apples comparison. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"sf": ...}.

Queries are materialized with the noop sink (full execution, no driver
collect); pipeline jobs include their real table writes (the upsert is
part of the baseline numbers being compared against).
"""

from __future__ import annotations

import csv
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tradingview_data_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402  (imports register all plan modules)
from tradingview_data_pipeline_spark.plans import analytics  # noqa: E402


def _write_technical_csv(path: str, n: int = 1384) -> None:
    """Deterministic 1,384-row × 49-col technical CSV (baseline row 1 shape)."""
    from tradingview_data_pipeline_spark import schemas
    rng = random.Random(42)
    headers = [h for h in schemas.TECHNICAL_HEADER_MAP if not h.endswith(".1")]
    sectors = [f"Sector{i}" for i in range(20)]
    industries = [f"Industry{i}" for i in range(119)]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(headers)
        for i in range(n):
            row = []
            for h in headers:
                c = schemas.TECHNICAL_HEADER_MAP[h]
                if c == "symbol":
                    row.append(f"SYM{i:05d}")
                elif c == "sector":
                    row.append(sectors[i % 20])
                elif c == "industry":
                    row.append(industries[i % 119])
                elif c == "market_capitalization":
                    row.append(str(rng.randint(10**8, 2 * 10**13)))
                elif c == "analyst_rating":
                    row.append(rng.choice(["Strong Buy", "Buy", "Hold", "Sell", ""]))
                elif c in schemas._STRING_COLS:
                    row.append(f"s{i % 7}")
                elif rng.random() < 0.05:
                    row.append("")                      # null-rate parity
                else:
                    row.append(f"{rng.uniform(-100, 100):.3f}")
            w.writerow(row)


def _bench_pipelines(spark, timings: dict[str, float]) -> None:
    from tradingview_data_pipeline_spark import schemas
    from tradingview_data_pipeline_spark.sources.csv_adapter import ingest_newest
    from tradingview_data_pipeline_spark.operators.merge import ParquetTable
    from tradingview_data_pipeline_spark.plans import composite_score as cs
    from tradingview_data_pipeline_spark.plans import fundamental_score as fs

    work = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        csv_path = os.path.join(work, "Technicals_bench.csv")
        _write_technical_csv(csv_path)
        sch = schemas.stock_data_schema()
        stock = ParquetTable(spark, os.path.join(work, "stock_data"), sch, "symbol")

        # baseline row 1: CSV load + clean + upsert, 1,384 × 49 -> 21.3 s
        t0 = time.perf_counter()
        df = ingest_newest(spark, work, "Technicals",
                           schemas.TECHNICAL_HEADER_MAP, sch)
        stock.merge_upsert(df)
        timings["pipeline_technical_upload"] = round(time.perf_counter() - t0, 3)

        # grow to the scoring universe size (baseline rows 3/7: 1,643 symbols)
        extra = stock.read().limit(259).selectExpr(
            "concat('EXT', symbol) as symbol",
            *[c for c in stock.read().columns if c != "symbol"])
        stock.merge_upsert(extra)

        rankings = ParquetTable(spark, os.path.join(work, "stock_rankings"),
                                schemas.STOCK_RANKINGS_SCHEMA, "symbol")

        # baseline row 3: composite-score job end-to-end, 1,643 stocks -> 12.9 s
        t0 = time.perf_counter()
        scored = cs.composite_scores(stock.read())
        rankings.merge_upsert(cs.rankings_output(scored))
        timings["pipeline_composite_score"] = round(time.perf_counter() - t0, 3)

        # baseline row 7: fundamental-score job end-to-end, 1,643 stocks -> 6.7 s
        t0 = time.perf_counter()
        fscored = fs.fundamental_ranks(
            fs.fundamental_scores(stock.read(),
                                  size_hint_rows=stock.row_count()),
            rankings.read().select("symbol", "market_cap_category"))
        rankings.merge_upsert(fs.rankings_output(fscored))
        timings["pipeline_fundamental_score"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _bench_corpus_pipeline(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """End-to-end training-corpus build over the sf documents table
    (dedup -> near-dup clustering -> quality gate -> PII redaction ->
    leakage-safe split -> sharded export), including its real writes —
    the training-data counterpart of the three reference pipelines."""
    from tradingview_data_pipeline_spark.plans import corpus_pipeline

    work = tempfile.mkdtemp(prefix="bench_corpus_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        corpus_pipeline.run_corpus_prep(spark, docs, os.path.join(work, "out"))
        timings["pipeline_corpus_prep"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/JIT + parquet footer caches, not counted
    analytics.QUERIES["q1_grouped_aggs"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Calibration (reworked round 10 — VERDICT r9 "what's missing" #3):
    # the old single scalar range-sum job measured pure-JVM loop speed,
    # which does NOT track the suite's scan+shuffle+codegen mix — its
    # round-to-round drift (0.80 -> 0.59 s) imposed a uniform fake ~1.35x
    # on every normalized entry, including untouched map-only scans.
    # Now: the calibration probe IS a suite-shaped query (q1: parquet
    # scan + hash aggregate + sort) on the warm session, timed several
    # times with the MEDIAN reported; the individual runs are recorded
    # so readers can see the noise band. bench_compare flags a query
    # only when raw AND normalized both move beyond the threshold.
    cal_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        analytics.QUERIES["q1_grouped_aggs"](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        cal_runs.append(round(time.perf_counter() - t0, 3))
    calibration = sorted(cal_runs)[len(cal_runs) // 2]

    # Per-query isolation: one broken query must never zero the whole
    # artifact (round-4 lesson — a single analysis error erased 39 healthy
    # timings). Failures are recorded under "errors" and excluded from the
    # total; the final JSON line always prints.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    from tradingview_data_pipeline_spark.operators import pins
    for name, fn in analytics.QUERIES.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — harness must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        # release operator DISK_ONLY pins between queries — a 50-query
        # session otherwise accumulates them into tens of GB of
        # block-manager spill (pins are performance artifacts; results
        # stay correct if one is ever released early)
        pins.release_all()
        pins.release_checkpoints()   # media-substrate checkpoint blocks

    try:
        _bench_pipelines(spark, timings)
    except Exception as exc:  # noqa: BLE001
        errors["pipelines"] = f"{type(exc).__name__}: {exc}"[:500]

    try:
        _bench_corpus_pipeline(spark, sf_dir, timings)
    except Exception as exc:  # noqa: BLE001
        errors["pipeline_corpus_prep"] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(timings.values()), 3)
    # Substrate attribution (additive, r13 — VERDICT r12 task 9): the
    # session-shared LSH scored-pairs frame is built once, inside the
    # FIRST consumer's timed region (registry order: q28), and q42/q70
    # then ride the checkpointed frame. This field states how many of
    # the first toucher's seconds were the shared build, so per-query
    # comparisons across rounds aren't misled by first-toucher order.
    from tradingview_data_pipeline_spark.plans import training_queries as tq
    substrates = {
        name: {"sec": sec, "charged_to": "q28_lsh_near_dup",
               "consumers": ["q28_lsh_near_dup", "q42_dedup_graph",
                             "q70_leakage_safe_split"]}
        for name, sec in tq.SUBSTRATE_BUILD_SEC.items()}
    print(json.dumps({
        "metric": "declared_queries_plus_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration_sec": calibration,
        "calibration_runs": cal_runs,
        **({"substrates": substrates} if substrates else {}),
        **({"errors": errors} if errors else {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
