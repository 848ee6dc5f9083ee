"""S4 integration: partitioned-parallel JDBC scan against an embedded
Apache Derby database (bundled with Spark — no external service).

The reference pages through PostgREST sequentially, 1,000 rows per
request (calcompositescore.py:50-74); `jdbc_partitioned_scan` expresses
the same table read as a range-partitioned JDBC source. This test proves
the helper end-to-end: write -> partitioned read -> one task per range
split -> predicate pushdown into the database."""

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.sources.csv_adapter import jdbc_partitioned_scan

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_partitioned_scan_roundtrip(spark, derby_url):
    src = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 2.0).alias("val"))
    (src.write.format("jdbc")
        .option("url", derby_url).option("dbtable", "T")
        .option("driver", DRIVER).save())

    out = jdbc_partitioned_scan(spark, derby_url, "T", "id", 0, 100,
                                num_partitions=4, driver=DRIVER)
    # the range split must become real parallel scan tasks
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100
    assert out.agg(F.sum("val")).collect()[0][0] == 9900.0


def test_jdbc_scan_pushes_predicates(spark, derby_url):
    src = spark.range(0, 50).select(F.col("id").cast("int").alias("id"))
    (src.write.format("jdbc")
        .option("url", derby_url).option("dbtable", "P")
        .option("driver", DRIVER).save())

    out = jdbc_partitioned_scan(spark, derby_url, "P", "id", 0, 50,
                                num_partitions=3, driver=DRIVER)
    filtered = out.where(F.col("id") >= 30)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual" in plan, plan
    assert filtered.count() == 20
