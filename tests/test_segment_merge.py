"""J1 overview⟗performance merge, P5 validity filter, S3 sniffing, K6 sink."""

from tradingview_data_pipeline_spark.plans.segment_merge import (
    merge_overview_performance, valid_segment_rows, write_csv_backup,
)
from tradingview_data_pipeline_spark.sources.csv_adapter import sniff_delimiter


def test_valid_segment_rows_filters_junk(spark):
    df = spark.createDataFrame(
        [("Technology",), ("Sector",), ("2026-01-01 analysis",),
         ("Strengths: big growth potential in the sector ahead",),
         ("",), ("   ",), (None,), ("x" * 51,)],
        "sector string")
    out = [r["sector"] for r in valid_segment_rows(df, "sector").collect()]
    assert out == ["Technology"]


def test_merge_overview_performance(spark):
    overview = spark.createDataFrame(
        [("Tech", "2.5T INR", "120"), ("Energy", "800B INR", "80"),
         ("Sector", "x", "y")],                      # header echo dropped
        "sector string, market_cap string, stocks string")
    performance = spark.createDataFrame(
        [("Tech", "5.0"), ("Util", "1.0"),           # Util only in perf
         ("Tech ", None)],                      # nbsp -> merges into Tech? normalized to 'Tech'
        "sector string, perf_3m string")
    out = {r["sector"]: r for r in
           merge_overview_performance(overview, performance, "sector").collect()}
    assert set(out) == {"Tech", "Energy", "Util"}
    assert out["Tech"]["market_cap"] == "2.5T INR"
    assert out["Tech"]["perf_3m"] == "5.0"
    assert out["Energy"]["perf_3m"] is None          # full outer, left only
    assert out["Util"]["market_cap"] is None         # full outer, right only


def test_sniff_delimiter(tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("a;b;c\n1;2;3\n")
    assert sniff_delimiter(str(p)) == ";"
    q = tmp_path / "comma.csv"
    q.write_text("a,b,c\n1,2,3\n")
    assert sniff_delimiter(str(q)) == ","
    assert sniff_delimiter("/no/such/file") == ","


def test_write_csv_backup(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = tmp_path / "backup"
    write_csv_backup(df, str(out))
    back = spark.read.option("header", True).csv(str(out))
    assert back.count() == 2 and set(back.columns) == {"id", "v"}
