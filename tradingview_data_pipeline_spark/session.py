"""SparkSession factory with local / cluster profiles.

The reference runs a single eager pandas process per cron job
(`/root/reference/run_technical.sh:13`); our engine is a long-lived Spark
application. Local profile is used by tests and bench; the cluster profile
documents the settings we'd ship to a 1000-executor deployment (AQE on,
shuffle partitions sized by data volume, Arrow enabled for the few
Pandas-UDF operators).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession


def _install_jvm_function_cache() -> None:
    """Memoize PySpark's per-call JVM function lookup (guide §7.3 — the
    plan-construction Python boundary).

    ``pyspark.sql.functions.builtin._get_jvm_function`` resolves
    ``getattr(sc._jvm, "org.apache.spark.sql.functions")`` and then the
    named static method on EVERY ``F.*`` call — two py4j reflection
    round trips (JVMView.__getattr__ / JavaClass.__getattr__ both send a
    REFLECTION_COMMAND, py4j java_gateway.py) before the actual CALL
    command. The returned static ``JavaMember`` is stable for the life
    of the gateway, so caching it per (SparkContext, name) removes 2 of
    the 3 round trips each expression node costs. Measured: ``F.lit``
    0.87 -> 0.31 ms/call; fundamental_scores plan construction
    2.25 -> 1.3 s. Executed plans are byte-identical — this touches only
    how the driver LOOKS UP the JVM-side functions object.

    Keyed weakly on the SparkContext: a stopped/rebuilt session drops
    its entries (a fresh context owns a fresh gateway, so stale members
    can never leak across sessions). Version-guarded: if the private
    helper moves, the engine silently runs at stock speed.
    """
    try:
        from pyspark.sql.functions import builtin as _builtin
        orig = _builtin._get_jvm_function
    except (ImportError, AttributeError):      # layout changed — stock speed
        return
    if getattr(orig, "__jvm_fn_cache__", False):
        return                                 # already installed
    cache: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()

    def cached(name, sc):
        try:
            per_ctx = cache[sc]
        except KeyError:
            per_ctx = cache[sc] = {}
        fn = per_ctx.get(name)
        if fn is None:
            fn = per_ctx[name] = orig(name, sc)
        return fn

    cached.__jvm_fn_cache__ = True
    _builtin._get_jvm_function = cached


_install_jvm_function_cache()

# Defaults chosen for the harness container (local[N], 128 GiB, tiny data).
# At the 100 TB design point, spark.sql.shuffle.partitions is instead sized
# ~ (input bytes / 128 MiB) and AQE coalesces the tail.
_LOCAL_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # NOTE (round 10, measured): planning every shuffle wide via
    # adaptive.coalescePartitions.initialPartitionNum=512 and letting
    # AQE coalesce was tried as the session-wide width fix and
    # REGRESSED the sf0.1 suite ~2x (bench 100 -> 196 s) — local-mode
    # map-output overhead on hundreds of tiny shuffles is not free, and
    # AQE's coalescing does not recover it. Width therefore stays a
    # per-decade knob: callers running decade-scale jobs size
    # spark.sql.shuffle.partitions ~ input bytes / 128 MiB at session
    # build (SPARK_GRAFT_CPUS env or extra_conf), the posture the
    # module docstring documents for the 1000-executor profile.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # r12 (guide §2.1/§2.2 — shuffle file machinery): thread-dump
    # sampling during the q72 containment leg showed the hot executor
    # stacks in BypassMergeSortShuffleWriter's file plumbing
    # (DiskBlockObjectWriter.initialize, copyFileStreamNIO), not in
    # compute — the bypass writer opens one temp file PER REDUCE
    # PARTITION per map task (32x32 per exchange on this profile) and
    # then concatenates them. Threshold 1 routes every multi-partition
    # shuffle through the sort writer (ONE spill file per map task).
    # Measured (cgroup-CPU, min-of-4, interleaved with base): q72
    # 35->20 s CPU / 10.6->2.5 s wall, q74 13->6.4 s CPU, q42/q80/q10
    # each ~10-20% CPU down. Scale-aligned, not a local trick: shuffles
    # wider than the 200-partition default never bypassed anyway, so
    # production plans are unchanged; this only aligns the narrow-
    # shuffle path with the same single-file-per-map-task behavior.
    "spark.shuffle.sort.bypassMergeThreshold": "1",
    # r12 NEGATIVE RESULT (guide §2.2), measured then REVERTED: an 8 MB
    # coalescePartitions.minPartitionSize floor cut exchange-machinery
    # CPU on the tiny-shuffle dedup queries (q72 20->16 s, q74
    # 9.6->8.0 s cgroup-CPU) but serialized every window/Arrow stage
    # whose real per-row work needs the parallelism: q63 1.35->3.58 s,
    # q20 0.82->2.76 s, q18 0.81->1.97 s, q60 1.12->2.98 s wall
    # (interleaved min-of-4). Parallelism-first coalescing stays.
    # zstd over default snappy: ~30-40% smaller parquet at comparable
    # speed — at the 100 TB design point scan bytes are the dominant
    # cost, and every maintained table (MERGE/rollup/SCD2/export) is
    # written through this session. Runtime bloom-filter join pruning
    # is already on by default in Spark 4.
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r12 (guide §4/§7.3 — the Python boundary at PLAN-BUILD time):
    # PySpark 4 wraps every DataFrame/Column op to capture the user call
    # site for error context; each wrapped op costs ~4 extra py4j round
    # trips (conf.get + PySparkCurrentOrigin.set/clear) plus a Python
    # stack walk. Measured on composite_scores plan construction:
    # 2.8 s -> 1.2 s with capture off. Pure driver-side overhead — the
    # executed plan is byte-identical; only error messages lose the
    # "user code line" enrichment.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # wide scoring plans chain one WindowExec per (partition, order) spec;
    # the default 1m thread stack overflows around ~40 chained operators
    "spark.driver.extraJavaOptions": "-Xss32m",
    "spark.executor.extraJavaOptions": "-Xss32m",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def get_spark(app_name: str = "tradingview-data-pipeline-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    tests, bench, and the driver share one profile. On a real cluster the
    caller passes ``master=None`` with ``spark.master`` set by the submitter
    and overrides shuffle partitions to match data volume.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_LOCAL_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables from ``sf_dir`` as a dict of DataFrames."""
    names = names or ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings"]
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}
