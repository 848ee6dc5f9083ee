"""Declared analytics queries + matching DuckDB oracle SQL.

Each query demonstrates one operator family from SURVEY.md §2 on the
driver's TPC-H-ish tables, implemented Spark-first with the engine's
operator/function library. ``QUERIES[name](spark, sf_dir)`` returns a
DataFrame; ``ORACLE[name]`` is ANSI SQL DuckDB runs over the same parquet.

Cross-engine determinism policy (so value hashes match exactly):
- Sums/averages of doubles go through DECIMAL accumulators
  (``_dsum``): per-row double arithmetic is IEEE-deterministic, decimal
  summation is order-independent, and the final cast back to double is
  identical in both engines. Plain double SUM would differ in the last ulp
  depending on aggregation order.
- Rank/count-based statistics (percentiles, row_number buckets) are exact
  integers — no float risk.
- Ties in any rank/limit are broken by a unique key so both engines pick
  identical rows.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions import cleaning as fx
from tradingview_data_pipeline_spark.operators import scoring as ops

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


_TABLE_DF_MEMO: dict[tuple[int, str, float], tuple[SparkSession, DataFrame]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Base-table reader, memoized per (session, path, newest-mtime).

    ``spark.read.parquet`` costs ~100 ms per call on this container
    (driver-side file listing + footer schema read), and a bench pass
    issues ~100 of them. The memo returns the SAME lazy DataFrame — an
    immutable logical plan, not a result: every action still scans the
    parquet files, so no result caching is introduced. The mtime key
    invalidates on in-place regeneration (the table_rows memo rule);
    the identity check drops entries from a stopped session."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (id(spark), path, _table_mtime(path))
    hit = _TABLE_DF_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    for k in [k for k in _TABLE_DF_MEMO if k[1] == path]:
        del _TABLE_DF_MEMO[k]          # superseded mtime / dead session
    df = spark.read.parquet(path)
    _TABLE_DF_MEMO[key] = (spark, df)
    return df


def spread_small_scan(spark: SparkSession, df: DataFrame,
                      path: str, rows_per_task: int | None = None) -> DataFrame:
    """Scale-adaptive scan widening (guide §2.6/§6) for MAP-DOMINANT
    plans only. A parquet input smaller than
    ``spark.sql.files.maxPartitionBytes`` arrives as ONE scan split, so
    every map-side operator above it runs single-threaded while the
    rest of the session idles. Round-robin repartition to session width
    when the file cannot split wide enough on its own; at production
    scale inputs arrive in >= cores splits and this is a NO-OP by
    construction (the gate reads the file size and the session's own
    maxPartitionBytes, not a tuned constant).

    MEASURED NEGATIVE as a blanket ``_t`` policy (r12): applying it to
    every scan moved the sf0.1 bench 84.9 -> 114.2 s — for any query
    with downstream exchanges, the extra stage + 32-way task scheduling
    overhead exceeds the single-task map cost at local data sizes, and
    only the zero-shuffle per-row profile queries (q23, q75) won. It is
    therefore OPT-IN for exactly those plan shapes: heavy per-row
    expression work with no or one downstream exchange. Results are
    layout-independent by the engine's determinism policy, so the
    repartition never changes what a query computes."""
    try:
        if os.path.isdir(path):
            size = sum(os.path.getsize(os.path.join(r, f))
                       for r, _, fs in os.walk(path)
                       for f in fs if f.endswith(".parquet"))
        else:
            size = os.path.getsize(path)
    except OSError:
        return df
    try:
        max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes")
                     .lower().removesuffix("b"))
    except Exception:
        max_pb = 128 * 1024 * 1024
    cores = spark.sparkContext.defaultParallelism
    if max(1, -(-size // max_pb)) >= cores:
        return df
    width = cores
    if rows_per_task is not None:
        # WORK-proportional width for Python-boundary stages (r12,
        # guide §4): each mapInPandas task costs ~0.2 s of worker CPU +
        # ~0.4 s of JVM runner overhead regardless of batch size, so
        # once the per-row work is batch-vectorized, session-width
        # spreading of a tiny input is pure overhead. Width sweep on
        # q84 (5k docs, interleaved min-of-4): width 32 = 2.1 s wall /
        # 26 s CPU, width 4-8 = 1.5 s wall / 6-7 s CPU, width 1 =
        # 5.4 s wall. At production sizes the file splits naturally
        # and this whole branch is a no-op.
        from tradingview_data_pipeline_spark.operators.merge import (
            parquet_footer_rows,
        )
        try:
            n_rows = parquet_footer_rows(
                [os.path.join(path, f) for f in os.listdir(path)
                 if f.endswith(".parquet")] if os.path.isdir(path)
                else [path])
        except OSError:
            return df.repartition(width)
        width = max(1, min(cores, -(-n_rows // rows_per_task)))
        if width == 1:
            return df
    return df.repartition(width)


def _t_wide(spark: SparkSession, sf_dir: str, name: str,
            rows_per_task: int | None = None) -> DataFrame:
    """``_t`` + ``spread_small_scan`` — the opt-in reader for the
    map-dominant zero/one-exchange queries named above."""
    return spread_small_scan(spark, _t(spark, sf_dir, name),
                             os.path.join(sf_dir, f"{name}.parquet"),
                             rows_per_task=rows_per_task)


_TABLE_ROWS_MEMO: dict[tuple[str, str, float], int] = {}


def _table_mtime(path: str) -> float:
    """Newest mtime under a parquet path (file or directory) — the memo
    freshness token. A regenerated/overwritten table gets a new mtime,
    so stale footer counts can never keep serving (round-11 advisor
    catch: the q29/q72/q73 shuffle-width hints would otherwise silently
    stay sized for the old decade in a long-lived session — the exact
    OOM class the hint exists to prevent). os.stat of a handful of
    entries, still zero Spark actions."""
    try:
        if os.path.isdir(path):
            times = [os.path.getmtime(path)]
            for root, _, names in os.walk(path):
                times += [os.path.getmtime(os.path.join(root, n))
                          for n in names if n.endswith(".parquet")]
            return max(times)
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def table_rows(sf_dir: str, name: str) -> int:
    """EXACT base-table row count from parquet footers, memoized per
    (sf_dir, table, newest-mtime) — replaces the per-query ``df.count()``
    Spark action several plans used purely to size partition hints
    (advisor catch, round 9: each such action re-scanned the corpus even
    at scales where the hint is then discarded). Footer reads are
    driver-side metadata only, O(files); exact because these are
    unfiltered base tables. The mtime in the key invalidates the memo
    when the table is regenerated in-place (round-11 advisor catch)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (sf_dir, name, _table_mtime(path))
    if key not in _TABLE_ROWS_MEMO:
        from tradingview_data_pipeline_spark.operators.merge import (
            parquet_footer_rows,
        )
        # drop superseded entries for the same table so the memo stays
        # O(tables), not O(regenerations)
        for k in [k for k in _TABLE_ROWS_MEMO if k[:2] == (sf_dir, name)]:
            del _TABLE_ROWS_MEMO[k]
        _TABLE_ROWS_MEMO[key] = parquet_footer_rows([path])
    return _TABLE_ROWS_MEMO[key]


def _dsum(c, scale="25,6"):
    """Order-independent sum of doubles: decimal accumulate, double out.

    Only safe on columns whose doubles are exactly N-dp values (the driver's
    metric columns are all 2-dp): both engines round the cast to the same
    decimal. For sums of *products*, cast the factors to decimal first
    (``_dec``) and multiply exactly — casting a double product would hit
    engine-specific rounding (Spark goes through Java's shortest-repr
    ``BigDecimal.valueOf``; DuckDB rounds the exact binary expansion).
    """
    return F.sum(c.cast(f"decimal({scale})")).cast("double")


def _dsum_over(c, w, scale="25,6"):
    return F.sum(c.cast(f"decimal({scale})")).over(w).cast("double")


def _dec(c, scale="12,2"):
    """Exact decimal image of a 2-dp double column."""
    return c.cast(f"decimal({scale})")


# ---------------------------------------------------------------------------
# q1 — grouped aggregates, tagged union (round-8 consolidation #14, the
# COVERAGE.md-predocumented q1+q4 merge; frees a driver slot for
# q77_semantic_dedup while keeping both operator families verified):
#   'pricing' — the flagship grouped multi-aggregate over the fact table
#               (A1/A5/F15; reference per-group mean/count pattern at
#               calcompositescore.py:246-270; formerly standalone q1).
#   'enrich'  — broadcast dimension-enrich joins + grouped agg (J2;
#               calcompositescore.py:357-368 stock⟕sector⟕industry
#               analog; formerly standalone q4).
# Shared schema (kind, k1, k2, n, v1..v6): pricing maps n=count_order,
# v1..v6 = sum_qty, sum_base_price, sum_disc_price, sum_charge,
# avg_qty, avg_price; enrich maps n=num_customers, v1=total_acctbal.
# Each leg keeps its own scan subtree (pushdown intact).
# ---------------------------------------------------------------------------

@register("q1_grouped_aggs", oracle="""
SELECT 'pricing' AS kind, l_returnflag AS k1, l_linestatus AS k2,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS v1,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS v2,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS v3,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS v4,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS v5,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS v6
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
UNION ALL
SELECT 'enrich' AS kind, r_name AS k1, n_name AS k2,
       COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS v1,
       CAST(NULL AS DOUBLE) AS v2, CAST(NULL AS DOUBLE) AS v3,
       CAST(NULL AS DOUBLE) AS v4, CAST(NULL AS DOUBLE) AS v5,
       CAST(NULL AS DOUBLE) AS v6
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""")
def q1_grouped_aggs(spark, sf_dir):
    nd = F.lit(None).cast("double")
    pricing = _q1_pricing_summary(spark, sf_dir).select(
        F.lit("pricing").alias("kind"),
        F.col("l_returnflag").alias("k1"), F.col("l_linestatus").alias("k2"),
        F.col("count_order").alias("n"),
        F.col("sum_qty").alias("v1"), F.col("sum_base_price").alias("v2"),
        F.col("sum_disc_price").alias("v3"), F.col("sum_charge").alias("v4"),
        F.col("avg_qty").alias("v5"), F.col("avg_price").alias("v6"))
    enrich = _q4_join_enrich(spark, sf_dir).select(
        F.lit("enrich").alias("kind"),
        F.col("r_name").alias("k1"), F.col("n_name").alias("k2"),
        F.col("num_customers").alias("n"),
        F.col("total_acctbal").alias("v1"),
        nd.alias("v2"), nd.alias("v3"), nd.alias("v4"),
        nd.alias("v5"), nd.alias("v6"))
    return pricing.unionByName(enrich)


def _q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc = _dec(F.col("l_extendedprice")) * (one - _dec(F.col("l_discount"), "4,2"))
    charge = disc * (one + _dec(F.col("l_tax"), "4,2"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


# ---------------------------------------------------------------------------
# q2 — scan shapes, tagged union (round-7 consolidation of q2+q3; see
# COVERAGE.md headroom map): the 'filter' leg is scan + predicate +
# projection (S1/P2/P4/P8; pushdown-verified via _q2_scan_filter in
# test_plan_shapes), the 'topk' leg is top-k with deterministic
# tie-break (W7/O1; TakeOrderedAndProject, no global sort — reference
# nlargest at calcompositescore.py:396-399). Each leg keeps its own
# scan subtree so predicate pushdown / the limit pushdown stay intact.
# ---------------------------------------------------------------------------

@register("q2_scan_shapes", oracle="""
SELECT 'filter' AS kind, l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2,
       l_quantity AS v1, l_extendedprice AS v2, l_shipdate AS ts
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 45
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
UNION ALL
SELECT 'topk' AS kind, o_orderkey AS k1, o_custkey AS k2,
       CAST(NULL AS DOUBLE) AS v1, o_totalprice AS v2,
       CAST(NULL AS TIMESTAMP) AS ts
FROM (SELECT * FROM orders
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
      LIMIT 10)
""")
def q2_scan_shapes(spark, sf_dir):
    filt = _q2_scan_filter(spark, sf_dir).select(
        F.lit("filter").alias("kind"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        F.col("l_quantity").alias("v1"),
        F.col("l_extendedprice").alias("v2"),
        F.col("l_shipdate").alias("ts"))
    topk = _q3_topk_orders(spark, sf_dir).select(
        F.lit("topk").alias("kind"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("k2"),
        F.lit(None).cast("double").alias("v1"),
        F.col("o_totalprice").alias("v2"),
        F.lit(None).cast("timestamp").alias("ts"))
    return filt.unionByName(topk)


def _q2_scan_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") > 45)
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
    )


def _q3_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return ops.top_k(o, "o_totalprice", 10, tie_break="o_orderkey").select(
        "o_orderkey", "o_custkey", "o_totalprice")


# ---------------------------------------------------------------------------
# q4 — dimension-enrich broadcast joins + grouped agg (J2): the 'enrich'
# leg of q1_grouped_aggs since the round-8 consolidation.
# ---------------------------------------------------------------------------

def _q4_join_enrich(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("num_customers"),
             _dsum(F.col("c_acctbal")).alias("total_acctbal"))
    )


# ---------------------------------------------------------------------------
# q5 — per-customer order activity: full-outer join with key coalesce
# (J1; sectormerged_improved.py:433-468 overview⟗performance merge
# analog) UNIONed with the anti-join complement — customers with no
# orders at all (J4; newsflow_scraper.py:281-293 "skip URLs already in
# the table" as a left-anti join instead of a collected set).
# Consolidates the former q5 + q6.
# ---------------------------------------------------------------------------

@register("q5_order_activity", oracle="""
WITH o AS (SELECT o_custkey AS k, COUNT(*) AS open_orders
           FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
     f AS (SELECT o_custkey AS k, COUNT(*) AS closed_orders
           FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
SELECT 'counts' AS kind,
       COALESCE(o.k, f.k) AS custkey,
       COALESCE(open_orders, 0) AS open_orders,
       COALESCE(closed_orders, 0) AS closed_orders
FROM o FULL OUTER JOIN f ON o.k = f.k
UNION ALL
SELECT 'no_orders', c_custkey, NULL::BIGINT, NULL::BIGINT
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def q5_order_activity(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    open_ = (o.where(F.col("o_orderstatus") == "O")
             .groupBy(F.col("o_custkey").alias("k"))
             .agg(F.count(F.lit(1)).alias("open_orders")))
    closed = (o.where(F.col("o_orderstatus") == "F")
              .groupBy(F.col("o_custkey").alias("k"))
              .agg(F.count(F.lit(1)).alias("closed_orders")))
    counts = (
        open_.join(closed, open_.k == closed.k, "full_outer")
        .select(
            F.lit("counts").alias("kind"),
            F.coalesce(open_.k, closed.k).alias("custkey"),
            F.coalesce(F.col("open_orders"), F.lit(0)).alias("open_orders"),
            F.coalesce(F.col("closed_orders"), F.lit(0)).alias("closed_orders"),
        )
    )
    no_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("no_orders").alias("kind"),
                F.col("c_custkey").alias("custkey"),
                F.lit(None).cast("bigint").alias("open_orders"),
                F.lit(None).cast("bigint").alias("closed_orders"))
    )
    return counts.unionByName(no_orders)


# ---------------------------------------------------------------------------
# q7 — per-group window statistics, tagged union (round-8 consolidation
# #10, COVERAGE.md map): 'zscore' — per-group z-score with min-group +
# zero-std gates (W3+A1; calcompositescore.py:222-270), exact-
# deterministic via decimal sums then identical double arithmetic;
# 'rank' — rank within partition (W2; calfundamentalscore.py:339-349
# fundamental_rank per market-cap category). Each leg keeps its own
# single-window plan over customer; the union is plan-free glue.
# ---------------------------------------------------------------------------

@register("q7_group_zscore", oracle="""
WITH b AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) OVER w AS DOUBLE) AS s2,
         COUNT(c_acctbal) OVER w AS n
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey)
)
SELECT 'zscore' AS kind, c_custkey AS custkey,
       CAST(c_nationkey AS VARCHAR) AS grp, c_acctbal,
       CASE WHEN c_acctbal IS NULL OR n < 3 OR sd = 0.0 OR sd IS NULL
            THEN 0.0 ELSE (c_acctbal - mu) / sd END AS z,
       CAST(NULL AS BIGINT) AS rnk
FROM (
  SELECT *, s1 / n AS mu,
         SQRT(GREATEST((s2 - (s1 * s1) / n) / (n - 1), 0.0)) AS sd
  FROM b
)
UNION ALL
SELECT 'rank' AS kind, c_custkey AS custkey, c_mktsegment AS grp,
       c_acctbal, CAST(NULL AS DOUBLE) AS z,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC)
         AS rnk
FROM customer
""")
def q7_group_zscore(spark, sf_dir):
    z = _q7_zscore(spark, sf_dir).select(
        F.lit("zscore").alias("kind"), F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").cast("string").alias("grp"), "c_acctbal",
        F.col("acctbal_z").alias("z"),
        F.lit(None).cast("bigint").alias("rnk"))
    r = _q11_rank_partition(spark, sf_dir).select(
        F.lit("rank").alias("kind"), F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("grp"), "c_acctbal",
        F.lit(None).cast("double").alias("z"),
        F.col("segment_rank").alias("rnk"))
    return z.unionByName(r)


def _q7_zscore(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    v = F.col("c_acctbal")
    s1 = _dsum_over(v, w)
    s2 = F.sum(_dec(v) * _dec(v)).over(w).cast("double")
    n = F.count(v).over(w)
    mu = s1 / n
    sd = F.sqrt(F.greatest((s2 - (s1 * s1) / n) / (n - 1), F.lit(0.0)))
    z = F.when(v.isNull() | (n < 3) | (sd == 0.0) | sd.isNull(), F.lit(0.0)) \
         .otherwise((v - mu) / sd)
    return c.select("c_custkey", "c_nationkey", "c_acctbal", z.alias("acctbal_z"))


# ---------------------------------------------------------------------------
# q8 — peer-relative percentile, count-comparison form (W4/A9;
# calfundamentalscore.py:137-159): pct = 100*#{peers < v}/#peers via
# rank()-1; <2 peers -> 50.0; null -> null. Exact integer arithmetic.
# ---------------------------------------------------------------------------

@register("q8_peer_percentile", oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CASE WHEN c_acctbal IS NULL THEN NULL
            WHEN COUNT(c_acctbal) OVER wg < 2 THEN 50.0
            ELSE (RANK() OVER wr - 1) * 100.0 / COUNT(c_acctbal) OVER wg
       END AS acctbal_pct
FROM customer
WINDOW wr AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC NULLS LAST),
       wg AS (PARTITION BY c_nationkey)
""")
def q8_peer_percentile(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    out = ops.peer_percentile(c, "c_acctbal", ["c_nationkey"], "acctbal_pct")
    return out.select("c_custkey", "c_nationkey", "c_acctbal", "acctbal_pct")


# ---------------------------------------------------------------------------
# q9 — hierarchical peer-group fallback (W5;
# calfundamentalscore.py:162-180): stat at (brand,type) if the group has
# >= 5 members, elif brand-level if >= 5, else global. Counts include all
# rows (the reference gates on group membership, not valid values).
# ---------------------------------------------------------------------------

@register("q9_hier_fallback", oracle="""
WITH b AS (
  SELECT p_partkey, p_brand, p_type, p_retailprice,
         COUNT(*) OVER w2 AS n2,
         COUNT(*) OVER w1 AS n1,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(25,6))) OVER w2 AS DOUBLE) / COUNT(p_retailprice) OVER w2 AS mu2,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(25,6))) OVER w1 AS DOUBLE) / COUNT(p_retailprice) OVER w1 AS mu1,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(25,6))) OVER () AS DOUBLE) / COUNT(p_retailprice) OVER () AS mu0
  FROM part
  WINDOW w2 AS (PARTITION BY p_brand, p_type), w1 AS (PARTITION BY p_brand)
)
SELECT p_partkey, p_brand, p_type, p_retailprice,
       CASE WHEN n2 >= 5 THEN mu2 WHEN n1 >= 5 THEN mu1 ELSE mu0 END AS peer_avg_price,
       CASE WHEN n2 >= 5 THEN 'brand_type' WHEN n1 >= 5 THEN 'brand' ELSE 'all' END AS peer_level
FROM b
""")
def q9_hier_fallback(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    v = F.col("p_retailprice")
    w2 = Window.partitionBy("p_brand", "p_type")
    w1 = Window.partitionBy("p_brand")
    n2, n1 = F.count(F.lit(1)).over(w2), F.count(F.lit(1)).over(w1)
    mu2 = _dsum_over(v, w2) / F.count(v).over(w2)
    mu1 = _dsum_over(v, w1) / F.count(v).over(w1)
    # global mean via 1-row agg + broadcast cross join — not an
    # empty-partition window (which would hold the whole table in one task)
    g = p.agg((_dsum(v) / F.count(v)).alias("mu0"))
    df = p.crossJoin(F.broadcast(g)) \
          .select("p_partkey", "p_brand", "p_type", "p_retailprice",
                  n2.alias("n2"), n1.alias("n1"),
                  mu2.alias("mu2"), mu1.alias("mu1"), "mu0")
    pick = F.when(F.col("n2") >= 5, F.col("mu2")) \
            .when(F.col("n1") >= 5, F.col("mu1")).otherwise(F.col("mu0"))
    level = F.when(F.col("n2") >= 5, F.lit("brand_type")) \
             .when(F.col("n1") >= 5, F.lit("brand")).otherwise(F.lit("all"))
    return df.select("p_partkey", "p_brand", "p_type", "p_retailprice",
                     pick.alias("peer_avg_price"), level.alias("peer_level"))


# ---------------------------------------------------------------------------
# q10 — global ordinal rank bucketing (W1; calcompositescore.py:206-218
# market-cap categories; parity mode: single window at test scale): the
# 'bucket' leg of q10_rank_relational (plans/relational_extra.py) since
# the round-8 consolidation.
# ---------------------------------------------------------------------------

def _q10_rank_bucket(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    out = ops.bucket_by_global_rank(
        o, "o_totalprice", out_col="price_category", tie_break="o_orderkey")
    return out.select("o_orderkey", "o_totalprice", "price_category")


# ---------------------------------------------------------------------------
# q11 — rank within partition: the 'rank' leg of q7_group_zscore since
# the round-8 consolidation (W2; calfundamentalscore.py:339-349).
# ---------------------------------------------------------------------------

def _q11_rank_partition(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    out = ops.rank_within(c, ["c_mktsegment"], "c_acctbal",
                          out_col="segment_rank", tie_break="c_custkey")
    return out.select("c_custkey", "c_mktsegment", "c_acctbal",
                      F.col("segment_rank").cast("bigint").alias("segment_rank"))


# ---------------------------------------------------------------------------
# q12 — horizontal weighted scores, both reference blends in one pass
# over the fact table (A6+A7; calcompositescore.py:161-198 null-as-zero
# weighted sum, calfundamentalscore.py:206-228 weight-renormalized mean).
# Per-row IEEE arithmetic, identical association order in both engines;
# nulls manufactured via NULLIF so the renormalization path is exercised.
# ---------------------------------------------------------------------------

@register("q12_weighted_scores", oracle="""
WITH m AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         NULLIF(l_discount, 0.0) AS m_disc,
         NULLIF(l_tax, 0.0) AS m_tax,
         NULLIF(l_quantity, 1.0) AS m_qty
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       COALESCE(l_quantity, 0.0) * 0.2
         + COALESCE(l_extendedprice, 0.0) * 0.5
         + COALESCE(l_discount, 0.0) * 0.2
         + COALESCE(l_tax, 0.0) * 0.1 AS line_score,
       CASE WHEN (CASE WHEN m_disc IS NOT NULL THEN 0.5 ELSE 0.0 END
                + CASE WHEN m_tax IS NOT NULL THEN 0.3 ELSE 0.0 END
                + CASE WHEN m_qty IS NOT NULL THEN 0.2 ELSE 0.0 END) > 0
       THEN (CASE WHEN m_disc IS NOT NULL THEN m_disc * 0.5 ELSE 0.0 END
           + CASE WHEN m_tax IS NOT NULL THEN m_tax * 0.3 ELSE 0.0 END
           + CASE WHEN m_qty IS NOT NULL THEN m_qty * 0.2 ELSE 0.0 END)
          / (CASE WHEN m_disc IS NOT NULL THEN 0.5 ELSE 0.0 END
           + CASE WHEN m_tax IS NOT NULL THEN 0.3 ELSE 0.0 END
           + CASE WHEN m_qty IS NOT NULL THEN 0.2 ELSE 0.0 END)
       END AS blended
FROM m
""")
def q12_weighted_scores(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    m = li.select(
        "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("m_disc"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).alias("m_tax"),
        F.nullif(F.col("l_quantity"), F.lit(1.0)).alias("m_qty"),
    )
    score = ops.weighted_sum({"l_quantity": 0.2, "l_extendedprice": 0.5,
                              "l_discount": 0.2, "l_tax": 0.1})
    blended = ops.weighted_mean_renormalized({"m_disc": 0.5, "m_tax": 0.3, "m_qty": 0.2})
    return m.select("l_orderkey", "l_linenumber",
                    score.alias("line_score"), blended.alias("blended"))


# ---------------------------------------------------------------------------
# q14 — min-max normalization per group with all-equal guard (A2/F9;
# sectorscore.py:72-78). min/max are exact (no summation). Merged into
# q35_grouped_aggregates as its 'minmax' leg (round-8 consolidation #12,
# COVERAGE.md map); fx.minmax_normalize keeps its own pytest coverage.
# ---------------------------------------------------------------------------

def q14_minmax_norm(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    mn, mx = F.min("o_totalprice").over(w), F.max("o_totalprice").over(w)
    norm = fx.minmax_normalize(F.col("o_totalprice"), mn, mx)
    return o.select("o_orderkey", "o_orderpriority", "o_totalprice",
                    norm.alias("price_norm"))


# ---------------------------------------------------------------------------
# q15 — scalar cleaning functions in one projection: unit-string parsing
# (F3; sectorscore.py:64-70 — unicode minus / '%' / thousands separators
# round-trip to doubles) plus hash ids + truncation (F11/F12;
# newsflow_scraper.py:296-303).
# ---------------------------------------------------------------------------

@register("q15_scalar_funcs", oracle="""
SELECT doc_id,
       '−' || format('{:,}', n_chars) || '%' AS raw,
       CAST(REPLACE(REPLACE(REPLACE(REPLACE('−' || format('{:,}', n_chars) || '%',
            '−', '-'), '%', ''), ',', ''), '+', '') AS DOUBLE) AS parsed,
       'tv_' || substr(md5(text), 1, 20) AS fingerprint_id,
       substr(text, 1, 120) AS title
FROM documents
""")
def q15_scalar_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(F.lit("−"), F.format_number(F.col("n_chars"), 0), F.lit("%"))
    return d.select(
        "doc_id", raw.alias("raw"),
        fx.parse_unit_string(raw).alias("parsed"),
        fx.hash_id(F.col("text")).alias("fingerprint_id"),
        fx.truncate_str(F.col("text"), 120).alias("title"),
    )


# ---------------------------------------------------------------------------
# q17 — exact deduplication by content hash (training-data op; scale path:
# hash-groupBy shuffles only the 32-byte digest + key, not the payload).
# Merged into q46_corpus_prep as its 'dedup' leg (round-8 consolidation
# #11, COVERAGE.md map); the underlying operator keeps its own pytest
# coverage via operators/dedup.exact_dedup.
# ---------------------------------------------------------------------------

def q17_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("copies"))
    )
