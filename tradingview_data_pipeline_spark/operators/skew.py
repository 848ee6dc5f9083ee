"""Skew-handling primitives for hot keys (SURVEY §4 / scale design).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session defaults). These
helpers cover the two patterns AQE does not:

- ``salted_aggregate``: two-phase aggregation for skewed groupBy keys —
  partial aggregate over (key, salt) spreads a hot key over N reducers,
  then a cheap final aggregate over the partials. Works for any algebraic
  aggregate (sum/count/min/max, and mean via sum+count).
- ``salted_broadcast_left``: replicate-and-salt for joining a skewed fact
  against a dimension too big to broadcast: the dim is exploded ×N on a
  salt column, the fact picks a random-but-deterministic salt per row, so
  one hot key's rows land on N different reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets) — hash of the full row id
    would need a unique col; xxhash64 of the key + a uniform spread via
    monotonically_increasing_id keeps determinism within a task layout."""
    return (F.xxhash64(col, F.monotonically_increasing_id()) % buckets
            + buckets) % buckets


def salted_aggregate(df: DataFrame, key: str, aggs: dict[str, str],
                     *, buckets: int = 16) -> DataFrame:
    """Two-phase groupBy for skewed keys.

    ``aggs``: output name -> 'sum:col' | 'count' | 'min:col' | 'max:col'.
    """
    salted = df.withColumn("__salt", _salt(F.col(key), buckets))
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            partial_exprs.append(getattr(F, op)(col).alias(f"__p_{out}"))
            outer = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            final_exprs.append(outer(f"__p_{out}").alias(out))
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, key: str,
                          *, buckets: int = 8, how: str = "left") -> DataFrame:
    """Join a skewed fact to a dimension by replicating the dim ×buckets
    and salting the fact side — each hot-key burst spreads over
    ``buckets`` reducers instead of one."""
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    fact_s = fact.withColumn("__salt", _salt(F.col(key), buckets).cast("int"))
    out = fact_s.join(dim_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")
