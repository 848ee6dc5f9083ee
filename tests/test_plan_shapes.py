"""Physical-plan regression tests: predicate pushdown, column pruning,
and join strategies are part of the engine contract (SCALING.md), so a
change that silently breaks them should fail here, not in a bench run."""

from tradingview_data_pipeline_spark.plans import analytics

SF = "/root/testdata/sf0.001"


def _mode(df):
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")


def explain(df) -> str:
    return df._jdf.queryExecution().explainString(_mode(df))


def test_scan_filter_pushdown_and_pruning(spark):
    p = explain(analytics.QUERIES["q2_scan_filter"](spark, SF))
    assert "PushedFilters" in p
    assert "EqualTo(l_returnflag,R)" in p
    assert "GreaterThan(l_quantity,45.0)" in p
    # column pruning: projection of 5 output + 1 filter col, not all 11
    schema_line = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "l_tax" not in schema_line and "l_discount" not in schema_line


def test_dim_joins_are_broadcast(spark):
    p = explain(analytics.QUERIES["q4_join_enrich"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_is_take_ordered(spark):
    p = explain(analytics.QUERIES["q3_topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in p     # no global sort


def test_aggregate_is_partial_then_final(spark):
    p = explain(analytics.QUERIES["q1_pricing_summary"](spark, SF))
    # map-side combine: at least two HashAggregate levels around the exchange
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_no_cartesian_products_anywhere(spark):
    for name, fn in analytics.QUERIES.items():
        p = explain(fn(spark, SF))
        assert "CartesianProduct" not in p, name
