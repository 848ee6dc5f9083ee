"""applyInPandas grouped-map operator (robust scaling) vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from tradingview_data_pipeline_spark.operators.grouped import robust_scale


def test_robust_scale_matches_pandas(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "g": ["a"] * 50 + ["b"] * 30 + ["c"] * 3,
        "v": np.round(rng.normal(100, 20, 83), 2),
    })
    pdf.loc[80:, "v"] = 7.0          # group c: constant -> MAD 0 -> NULL
    df = spark.createDataFrame(pdf)
    out = robust_scale(df, ["g"], "v").toPandas()

    for g, grp in pdf.groupby("g"):
        med = grp["v"].median()
        mad = (grp["v"] - med).abs().median()
        got = out[out.g == g].sort_index()
        if mad == 0:
            assert got["robust_z"].isna().all()
        else:
            expect = (grp["v"].to_numpy() - med) / (1.4826 * mad)
            np.testing.assert_allclose(
                np.sort(got["robust_z"].to_numpy(dtype=float)),
                np.sort(expect), rtol=1e-9)


def test_robust_scale_schema_preserved(spark):
    df = spark.createDataFrame([("a", 1.0, "x"), ("a", 2.0, "y"), ("a", 3.0, "z")],
                               "g string, v double, tag string")
    out = robust_scale(df, ["g"], "v")
    assert out.columns == ["g", "v", "tag", "robust_z"]
    mid = {r["tag"]: r["robust_z"] for r in out.collect()}
    assert mid["y"] == pytest.approx(0.0)
