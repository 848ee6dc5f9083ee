"""Quality-gate expectations (operators/quality.py): one-pass check,
raise / quarantine enforcement, tolerance thresholds, uniqueness."""

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import quality as q


def _df(spark):
    return spark.createDataFrame(
        [("A", 10.0, "a@x.com"),
         ("B", -5.0, "b@x.com"),        # price out of range
         ("C", 20.0, None),             # email null (allowed by matches)
         (None, 30.0, "bad-email"),     # null key + malformed email
         ("A", 40.0, "a2@x.com")],      # duplicate key
        "symbol string, price double, email string")


def _rules():
    return [q.not_null("symbol"),
            q.in_range("price", 0.0, 1000.0),
            q.matches("email", r"^[^@\s]+@[^@\s]+\.[A-Za-z]{2,}$")]


def test_check_counts_and_verdict(spark):
    rep = q.check(_df(spark), _rules(), unique_key="symbol")
    assert rep["rows"] == 5 and not rep["passed"]
    assert rep["violations"] == {"symbol_not_null": 1, "price_in_range": 1,
                                 "email_matches": 1, "symbol_unique": 1}
    assert set(rep["failed"]) == {"symbol_not_null", "price_in_range",
                                  "email_matches", "symbol_unique"}


def test_tolerance_threshold(spark):
    # 1 bad of 5 rows = 20%: passes at 25% tolerance, fails at 10%
    df = _df(spark).where(F.col("symbol").isNotNull())   # 4 rows, 1 bad price
    lax = [q.Expect("price_ok", (F.col("price") >= 0), 0.25)]
    strict = [q.Expect("price_ok", (F.col("price") >= 0), 0.10)]
    assert q.check(df, lax)["passed"]
    assert not q.check(df, strict)["passed"]


def test_enforce_raise_attaches_report(spark):
    with pytest.raises(q.QualityGateError, match="price_in_range") as ei:
        q.enforce(_df(spark), _rules(), mode="raise")
    assert ei.value.report["violations"]["price_in_range"] == 1
    clean = _df(spark).where("symbol = 'A' AND price = 10.0")
    out, rep = q.enforce(clean, _rules(), mode="raise")
    assert rep["passed"] and out.count() == 1


def test_enforce_quarantine_splits_exactly(spark):
    good, rep = q.enforce(_df(spark), _rules(), mode="quarantine")
    kept = {r["symbol"] for r in good.collect()}
    assert kept == {"A", "C"}            # B: range, NULL-key row, bad email
    assert good.count() == 3             # two A rows + C
    assert rep["violations"]["price_in_range"] == 1


def test_empty_batch_passes(spark):
    empty = _df(spark).limit(0)
    rep = q.check(empty, _rules(), unique_key="symbol")
    assert rep["rows"] == 0 and rep["passed"]


def test_duplicate_expectation_names_rejected(spark):
    # two in_range rules on one column derive the same alias — one
    # count would silently shadow the other, so check() must refuse
    dup = [q.in_range("price", 0.0, 1000.0), q.in_range("price", 5.0, 50.0)]
    with pytest.raises(ValueError, match="price_in_range"):
        q.check(_df(spark), dup)
    # explicit names disambiguate
    ok = [q.in_range("price", 0.0, 1000.0),
          q.Expect("price_tight", (F.col("price") >= 5.0)
                   & (F.col("price") <= 50.0))]
    rep = q.check(_df(spark), ok)
    assert rep["violations"]["price_tight"] >= 1


def test_reserved_expectation_names_rejected(spark):
    with pytest.raises(ValueError, match="__n"):
        q.check(_df(spark), [q.Expect("__n", F.col("price") >= 0)])
    with pytest.raises(ValueError, match="symbol_unique"):
        q.check(_df(spark), [q.Expect("symbol_unique", F.col("price") >= 0)],
                unique_key="symbol")
