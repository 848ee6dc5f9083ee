"""Mergeable approximate sketches for corpus/stream profiling at scale.

At 100 TB, exact profiling answers (distinct users per day, value
quantiles per segment, heavy-hitter frequencies) are either a full
shuffle per question or a sketch. These operators build **mergeable**
sketch tables once — per partition/day/segment — and answer any later
range or rollup question by merging kilobyte-sized sketch blobs instead
of re-scanning the fact:

- ``hll_profile`` / ``hll_merge`` / ``hll_estimate`` — Apache
  DataSketches HLL via Spark's built-in ``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate`` (JVM-side, no UDFs).
  Build per-group sketches, roll them up along any coarser grouping
  later; a merged estimate equals the estimate the coarser build would
  have produced (same deterministic sketch state).
- ``cms_build`` / ``cms_estimate`` — count-min frequency sketch
  (``F.count_min_sketch``); point-frequency estimates are read on the
  driver from the bounded-size serialized sketch (the sketch is a few
  KB by construction — ``eps``/``confidence`` fix its width/depth —
  so the driver read is not a scale hazard).
- ``grouped_quantiles_approx`` — per-group quantiles in one pass via
  ``approx_percentile`` (Greenwald-Khanna; ``accuracy`` trades memory
  for error).

Exactness policy: sketches answer with engine-defined approximation
error, so they are pytest-bounded against exact answers
(tests/test_sketch.py) rather than oracle-hashed — DuckDB's
approx_count_distinct is a different estimator and would never
hash-match. The exact counterparts (COUNT DISTINCT, exact group
quantiles) remain oracle-verified via q35/q40.

Reference parity: the reference has no profiling layer; this extends
SURVEY §2.4's aggregate family with the sketch tier a training-data
pipeline uses for corpus stats dashboards and pre-join cardinality
estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DataSketches HLL: log2 of the number of registers (lgConfigK). 12 →
# 4096 registers, ~1.6% relative standard error, ~4 KB per sketch.
DEFAULT_LGK = 12


def hll_profile(df: DataFrame, keys: list[str], cols: list[str], *,
                lgk: int = DEFAULT_LGK) -> DataFrame:
    """Per-``keys`` group, one HLL sketch per column in ``cols``.

    Output: keys + ``<col>_hll`` binary columns. Persist this next to
    the fact (it is tiny) and answer distinct-count rollups from it.
    """
    aggs = [F.hll_sketch_agg(F.col(c), F.lit(lgk)).alias(f"{c}_hll")
            for c in cols]
    return df.groupBy(*keys).agg(*aggs)


def hll_merge(sketches: DataFrame, keys: list[str],
              cols: list[str]) -> DataFrame:
    """Roll a sketch table up to a coarser grouping by merging blobs.

    ``keys`` is the coarser key set (may be empty for a global rollup);
    ``cols`` are the base column names (without the ``_hll`` suffix).
    """
    aggs = [F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll")
            for c in cols]
    if keys:
        return sketches.groupBy(*keys).agg(*aggs)
    return sketches.agg(*aggs)


def hll_estimate(sketches: DataFrame, cols: list[str]) -> DataFrame:
    """Replace each ``<col>_hll`` blob with ``<col>_distinct`` estimate
    (one projection; pass-through for every non-sketch column)."""
    blob_cols = {f"{c}_hll" for c in cols}
    keep = [c for c in sketches.columns if c not in blob_cols]
    ests = [F.hll_sketch_estimate(F.col(f"{c}_hll")).alias(f"{c}_distinct")
            for c in cols]
    return sketches.select(*keep, *ests)


def cms_build(df: DataFrame, col: str, *, eps: float = 0.001,
              confidence: float = 0.99, seed: int = 42) -> bytes:
    """Serialized count-min sketch of ``col`` (bounded size: width
    ``ceil(2/eps)`` × depth ``ceil(ln(1/(1-confidence)))`` counters)."""
    row = df.agg(F.count_min_sketch(
        F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
    ).alias("cms")).head()
    return bytes(row["cms"])


def cms_estimate(spark: SparkSession, sketch: bytes, items: list) -> dict:
    """Point-frequency estimates (never under-counts) from a serialized
    count-min sketch, read via the JVM sketch library on the driver."""
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    out = {}
    for it in items:
        out[it] = cms.estimateCount(it)
    return out


def grouped_quantiles_approx(df: DataFrame, keys: list[str], col: str,
                             probs: list[float], *,
                             accuracy: int = 10_000) -> DataFrame:
    """Per-group approximate quantiles in one aggregation pass.

    Output: keys + ``q_<prob>`` columns (dots replaced so the names are
    safe to reference unquoted).
    """
    arr = F.approx_percentile(
        F.col(col),
        F.array(*[F.lit(p) for p in probs]),
        F.lit(accuracy)).alias("__qs")
    out = df.groupBy(*keys).agg(arr)
    for i, p in enumerate(probs):
        out = out.withColumn(f"q_{str(p).replace('.', '_')}",
                             F.col("__qs")[i])
    return out.drop("__qs")
