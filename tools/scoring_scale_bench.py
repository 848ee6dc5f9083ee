"""Decade curve for the two flagship scoring pipelines (VERDICT r8
task 7): composite (3-granularity z-score tree, composite_score.py) and
fundamental (melted 3-window percentile plan, fundamental_score.py)
were benched only at the reference universe (~1.6k symbols); SURVEY §6
claims the same plans scale without algorithm changes. This measures
that claim at 1x / 100x / 1000x synthetic stock universes.

Generation is Spark-side (deterministic xxhash64-derived values, ~5%
nulls to match the reference CSV's null rate, 20 sectors × 119
industries so peer-group populations GROW with the universe — the shape
a bigger real market would have), eagerly checkpointed so generation
cost never pollutes the timings.

Composite runs bucket_by_global_rank in BOTH modes at the base size
(parity = the reference-exact single-partition window, documented W1
exception) but scale mode only at 100x/1000x — the parity window is the
known, documented non-scale path.

    python tools/scoring_scale_bench.py [sizes...]

Prints one JSON line per size; append to SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [1_643, 164_300, 1_643_000]


def build_universe(spark, n: int):
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark import schemas

    sch = schemas.stock_data_schema()
    base = spark.range(n).withColumnRenamed("id", "__i")
    cols = []
    for f in sch.fields:
        name, i = f.name, F.col("__i")
        h = F.xxhash64(i, F.lit(name))
        if name == "symbol":
            cols.append(F.format_string("SYM%08d", i).alias(name))
        elif name == "sector":
            cols.append(F.concat(F.lit("sec"), (i % 20).cast("string"))
                        .alias(name))
        elif name == "industry":
            # industries nest under sectors (119 per sector shape-wise)
            cols.append(F.concat(F.lit("ind"),
                                 ((i % 20) * 119 + F.pmod(h, F.lit(119)))
                                 .cast("string")).alias(name))
        elif name == "analyst_rating":
            cols.append(F.element_at(
                F.array(*[F.lit(s) for s in
                          ("Strong Buy", "Buy", "Hold", "Sell", "")]),
                (F.pmod(h, F.lit(5)) + 1).cast("int")).alias(name))
        elif name in schemas._STRING_COLS:
            cols.append(F.concat(F.lit("s"), (i % 7).cast("string"))
                        .alias(name))
        elif name in schemas._LONG_COLS:
            cols.append((F.pmod(h, F.lit(2 * 10 ** 13 - 10 ** 8))
                         + F.lit(10 ** 8)).alias(name))
        elif name == "last_modified_date":
            cols.append(F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                        .alias(name))
        else:  # doubles, ~5% null like the reference CSVs
            v = (F.pmod(h, F.lit(200_000)).cast("double") / 1000.0 - 100.0)
            cols.append(F.when(F.pmod(F.xxhash64(i, F.lit(name + "_n")),
                                      F.lit(100)) < 5, F.lit(None))
                        .otherwise(v).alias(name))
    return base.select(*cols)


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from tradingview_data_pipeline_spark.plans import composite_score as cs
    from tradingview_data_pipeline_spark.plans import fundamental_score as fs
    from tradingview_data_pipeline_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or SIZES
    # zstd shuffle/spill compression for the decade runs: the
    # fundamental job retains ~3 wide symbol-join shuffles plus the
    # melted-frame exchanges on disk simultaneously — lz4's ratio blew
    # the container disk at 16.4M rows ('No space left on device'
    # during spill); zstd roughly halves the on-disk shuffle volume
    spark = get_spark("scoring-scale-bench",
                      extra_conf={"spark.io.compression.codec": "zstd"})
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    for n in sizes:
        # decade-sized shuffle width (the addendum-22 rule, applied to
        # the scoring family after the 16.4M GC-death): the melted
        # fundamental frame is 18 x n rows and the composite windows
        # carry ~100-col rows, so a fixed 32-wide shuffle puts ~500 MB
        # sorts on one task at this decade. ~64k wide-rows per task
        # keeps the sort in-budget; small decades keep the session
        # default. Runtime-settable: spark.sql.shuffle.partitions is
        # read at planning time, and AQE coalesces any over-split
        # small stage.
        width = max(32, n // 64_000)
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        if n <= 2_000_000:
            df = build_universe(spark, n).repartition(32) \
                .localCheckpoint(eager=True)
        else:
            # decade-4 harness safety: a localCheckpoint would park the
            # ~8 GB generated universe deserialized in the same heap the
            # pipelines' sorts need — write-through parquet instead
            # (generation still excluded from the timings)
            path = tempfile.mkdtemp(prefix="scoring_universe_") + "/u"
            # 32 MB row groups (default 128 MB): the vectorized reader
            # buffers one row group's projected column chunks per task,
            # and 32 concurrent tasks x 115 columns x 128 MB groups was
            # itself a measured decade-4 OOM site
            build_universe(spark, n).repartition(64) \
                .write.option("parquet.block.size", 32 * 1024 * 1024) \
                .mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 % 7)") \
            .collect()
        calibration = round(time.perf_counter() - t0, 3)

        rec = {"universe_rows": n, "calibration_sec": calibration}

        modes = ["scale"] if n > SIZES[0] else ["parity", "scale"]
        scored = None
        for mode in modes:
            t0 = time.perf_counter()
            scored = cs.composite_scores(df, bucket_mode=mode)
            scored.write.format("noop").mode("overwrite").save()
            rec[f"composite_{mode}_sec"] = round(time.perf_counter() - t0, 3)
            print(json.dumps({"phase": f"composite_{mode}", "universe_rows": n,
                              "sec": rec[f"composite_{mode}_sec"]}), flush=True)
        if n <= 2_000_000:
            cats = scored.select("symbol", "market_cap_category") \
                .localCheckpoint(eager=True)
        else:
            # same decade-4 rule as the universe: park on disk, not heap
            cpath = tempfile.mkdtemp(prefix="scoring_cats_") + "/c"
            scored.select("symbol", "market_cap_category") \
                .write.mode("overwrite").parquet(cpath)
            cats = spark.read.parquet(cpath)

        t0 = time.perf_counter()
        fscored = fs.fundamental_ranks(
            fs.fundamental_scores(df, size_hint_rows=n), cats,
            rank_mode="scale" if n > 2_000_000 else "window")
        if n > 2_000_000:
            # measure the PRODUCTION job shape (jobs.py ships
            # rankings_output's 8-column projection into the MERGE):
            # Catalyst then column-prunes the ~90 passthrough columns
            # out of every join/shuffle end-to-end. Materializing all
            # 115 input columns through three symbol SMJs instead
            # retains more simultaneous shuffle than the container
            # disk holds at this decade ('No space left on device') —
            # and is work the real job never does.
            fscored = fs.rankings_output(fscored)
        fscored.write.format("noop").mode("overwrite").save()
        rec["fundamental_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"phase": "fundamental", "universe_rows": n,
                          "sec": rec["fundamental_sec"]}), flush=True)
        print(json.dumps(rec), flush=True)
        # decade universes are ~5 GB each — clean as we go or repeated
        # runs fill the disk (the round-10 'No space left on device'
        # during a window spill was exactly this)
        if n > 2_000_000:
            import shutil
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
            shutil.rmtree(os.path.dirname(cpath), ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
