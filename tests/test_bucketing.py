"""Bucketed co-located join: two tables bucketed on the join key must
join without shuffling either side."""

from tradingview_data_pipeline_spark.operators.bucketing import bucketed, write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.createDataFrame([(i, f"a{i}") for i in range(1000)], "k long, va string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(0, 1000, 2)], "k long, vb string")
    write_bucketed(a, "bk_a", "k", buckets=4)
    write_bucketed(b, "bk_b", "k", buckets=4)

    # hint forces SortMergeJoin (tiny test tables would otherwise broadcast,
    # which proves nothing about the bucketed layout)
    joined = bucketed(spark, "bk_a").hint("merge").join(
        bucketed(spark, "bk_b").hint("merge"), "k")
    jvm = joined.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = joined._jdf.queryExecution().explainString(mode)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the whole point: no exchange feeding the join
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 500
