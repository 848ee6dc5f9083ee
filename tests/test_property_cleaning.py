"""Property-based tests (SURVEY §5 item 4): random unit-suffixed numeric
strings must round-trip through the engine's cleaning expressions to the
same values the reference's pandas code produces.

Each hypothesis example generates a batch of strings and makes ONE Spark
round trip (per-example Spark jobs would dominate runtime)."""

import math

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.functions import cleaning as fx


def reference_clean_and_convert(value):
    """Transcription of sectorscore.py:64-70."""
    if isinstance(value, str):
        cleaned = (value.replace("−", "-").replace("%", "").replace(",", "")
                   .replace("T INR", "").replace("B INR", "").replace("+", "")
                   .strip())
        return pd.to_numeric(cleaned, errors="coerce")
    return value


num = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                allow_infinity=False).map(lambda x: round(x, 3))
fmt = st.sampled_from(["{}", "{}%", "+{}", "−{}", "{} T INR", "{} B INR",
                       "{}T INR", "{}B INR", " {} "])
garbage = st.sampled_from(["garbage", "", "  ", "N/A", "--", "1.2.3"])
unit_string = st.one_of(
    st.tuples(num, fmt).map(lambda t: t[1].format(t[0])),
    garbage,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(unit_string, min_size=1, max_size=60))
def test_parse_unit_string_matches_pandas(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    got = [r["out"] for r in
           df.select(fx.parse_unit_string(F.col("x")).alias("out")).collect()]
    for v, g in zip(values, got):
        expect = reference_clean_and_convert(v)
        if expect is None or (isinstance(expect, float) and math.isnan(expect)):
            assert g is None, (v, g)
        else:
            # "−12.5 T INR".replace drops 'T INR' but leaves a space;
            # engine trims identically
            assert g == pytest.approx(float(expect), rel=1e-12), (v, g, expect)


small_doubles = st.one_of(
    st.floats(min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False),
    st.just(float("nan")), st.just(float("inf")), st.just(float("-inf")),
    st.none(),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(small_doubles, min_size=1, max_size=60))
def test_clean_value_matches_pandas_round2(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r["out"] for r in
           df.select(fx.clean_value(F.col("x")).alias("out")).collect()]
    for v, g in zip(values, got):
        if v is None or math.isnan(v) or math.isinf(v):
            assert g is None, (v, g)
        else:
            # reference: round(float(v), 2) — python banker's rounding vs
            # Spark HALF_UP differ only at exact .005 boundaries, which
            # cannot be hit by arbitrary binary doubles
            assert g == pytest.approx(round(v, 2), abs=5e-3), (v, g)
