"""SCD2 dimension maintenance: version history, current view, and
point-in-time reconstruction across three snapshots."""

import datetime as dt

from tradingview_data_pipeline_spark.operators.scd import Scd2Table


def test_scd2_versions_current_and_time_travel(spark, tmp_path):
    scd = Scd2Table(spark, str(tmp_path / "dim"), "symbol",
                    ["sector", "rating"], buckets=4)
    t1 = dt.datetime(2026, 1, 1)
    t2 = dt.datetime(2026, 2, 1)
    t3 = dt.datetime(2026, 3, 1)

    snap = lambda rows: spark.createDataFrame(
        rows, "symbol string, sector string, rating string")

    scd.apply_snapshot(snap([("AAA", "tech", "buy"),
                             ("BBB", "energy", "hold")]), t1)
    scd.apply_snapshot(snap([("AAA", "tech", "sell"),      # changed
                             ("BBB", "energy", "hold"),    # unchanged
                             ("CCC", "finance", "buy")]), t2)  # new
    scd.apply_snapshot(snap([("AAA", "tech", "sell"),      # unchanged
                             ("BBB", "utilities", "hold"),  # changed
                             ("CCC", "finance", "buy")]), t3)

    hist = scd.history().collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["symbol"], []).append(r)
    # AAA: 2 versions; BBB: 2; CCC: 1
    assert {k: len(v) for k, v in by_key.items()} == \
        {"AAA": 2, "BBB": 2, "CCC": 1}

    # unchanged key keeps its original valid_from through later snapshots
    bbb_first = min(by_key["BBB"], key=lambda r: r["valid_from"])
    assert bbb_first["valid_from"] == t1 and bbb_first["valid_to"] == t3

    cur = {(r["symbol"], r["sector"], r["rating"])
           for r in scd.current().collect()}
    assert cur == {("AAA", "tech", "sell"), ("BBB", "utilities", "hold"),
                   ("CCC", "finance", "buy")}

    # time travel: state as of mid-January / mid-February
    at_jan = {(r["symbol"], r["rating"])
              for r in scd.version_at(dt.datetime(2026, 1, 15)).collect()}
    assert at_jan == {("AAA", "buy"), ("BBB", "hold")}
    at_feb = {(r["symbol"], r["sector"], r["rating"])
              for r in scd.version_at(dt.datetime(2026, 2, 15)).collect()}
    assert at_feb == {("AAA", "tech", "sell"), ("BBB", "energy", "hold"),
                      ("CCC", "finance", "buy")}
    # exclusive upper bound: at exactly t2 the new AAA version is live
    at_t2 = {(r["symbol"], r["rating"])
             for r in scd.version_at(t2).collect()}
    assert ("AAA", "sell") in at_t2 and ("AAA", "buy") not in at_t2
