"""Approximate sketches (operators/sketch): error bounds vs exact, and
the mergeability contract that makes them useful at scale."""

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import sketch as sk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_estimate_within_rse(spark, events):
    got = sk.hll_estimate(
        sk.hll_profile(events, ["event_type"], ["user_id"]),
        ["user_id"])
    exact = {r["event_type"]: r["n"] for r in
             events.groupBy("event_type")
                   .agg(F.countDistinct("user_id").alias("n")).collect()}
    for r in got.collect():
        e = exact[r["event_type"]]
        # lgk=12 → ~1.6% RSE; allow 5 sigma
        assert abs(r["user_id_distinct"] - e) <= max(3, 0.08 * e)


def test_hll_merge_equals_direct_build(spark, events):
    """Merging per-(type, user-bucket) sketches to per-type must yield
    the SAME estimate as building per-type directly — sketch state is
    deterministic, so rollups from the sketch table are trustworthy."""
    fine = sk.hll_profile(
        events.withColumn("b", F.col("user_id") % 7),
        ["event_type", "b"], ["user_id"])
    merged = sk.hll_estimate(
        sk.hll_merge(fine, ["event_type"], ["user_id"]), ["user_id"])
    direct = sk.hll_estimate(
        sk.hll_profile(events, ["event_type"], ["user_id"]), ["user_id"])
    m = {r["event_type"]: r["user_id_distinct"] for r in merged.collect()}
    d = {r["event_type"]: r["user_id_distinct"] for r in direct.collect()}
    assert m == d


def test_hll_global_rollup_no_keys(spark, events):
    fine = sk.hll_profile(events, ["event_type"], ["user_id"])
    g = sk.hll_estimate(sk.hll_merge(fine, [], ["user_id"]), ["user_id"])
    exact = events.select("user_id").distinct().count()
    got = g.head()["user_id_distinct"]
    assert abs(got - exact) <= max(3, 0.08 * exact)


def test_cms_never_undercounts_and_is_tight_here(spark, events):
    blob = sk.cms_build(events, "user_id", eps=0.0001)
    exact = {r["user_id"]: r["c"] for r in
             events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
                   .orderBy(F.desc("c")).limit(5).collect()}
    est = sk.cms_estimate(spark, blob, list(exact))
    n = events.count()
    for k, c in exact.items():
        assert est[k] >= c                       # CMS never under-counts
        assert est[k] <= c + 0.0002 * n + 1      # eps * n over-count bound


def test_grouped_quantiles_within_rank_error(spark, events):
    got = sk.grouped_quantiles_approx(events, ["event_type"], "value",
                                      [0.5, 0.9], accuracy=10_000)
    for r in got.collect():
        vals = sorted(v["value"] for v in events
                      .where(F.col("event_type") == r["event_type"])
                      .select("value").collect())
        n = len(vals)
        for p, col in ((0.5, "q_0_5"), (0.9, "q_0_9")):
            # GK guarantees rank error <= n/accuracy; allow a +-2-rank pad
            lo = vals[max(0, int(p * n) - n // 10_000 - 2)]
            hi = vals[min(n - 1, int(p * n) + n // 10_000 + 2)]
            assert lo <= r[col] <= hi
