"""Grouped-map escape hatch: ``applyInPandas`` for per-group logic that
native expressions can't express cleanly (SURVEY §2.10 policy: native
first, Arrow-batched pandas second, never row-at-a-time Python).

``robust_scale`` is the worked example: per-group median/MAD
standardization — medians are order statistics, so the native-expression
alternative is a sort per group anyway; the grouped pandas kernel does it
in one vectorized pass per group. Each group must fit in one executor's
memory (Arrow batch) — fine for peer groups (10²-10⁴ rows); for
pathological groups pre-split with a salt.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def robust_scale(df: DataFrame, group_cols: list[str], value_col: str,
                 out_col: str = "robust_z") -> DataFrame:
    """Per-group (x - median) / (1.4826 * MAD); NULL where MAD == 0 or
    value missing. Output schema = input + out_col."""
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in df.schema.fields) + f", `{out_col}` double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        med = v.median()
        mad = (v - med).abs().median()
        scale = 1.4826 * mad
        pdf[out_col] = (v - med) / scale if scale and scale > 0 else pd.NA
        pdf[out_col] = pdf[out_col].astype("Float64")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(kernel, schema=out_schema)
