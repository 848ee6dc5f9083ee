"""Incremental rollup maintenance: keep a pre-aggregated table current
under append batches at O(delta) cost, never O(table).

The reference recomputes its summary tables from scratch on every daily
run (full scan + full rewrite).  The scalable shape is *mergeable
aggregate state*: count / decimal-sum / min / max combine associatively,
so a new batch only needs (1) a partial aggregate of the batch itself
and (2) a combine against the existing state rows whose keys the batch
touches.  Backed by the hash-bucketed ``ParquetTable`` layout, step (2)
reads and rewrites only the touched buckets — the same file-pruning
story a Delta/Iceberg MERGE would give, in plain parquet.

Derived measures (avg) are computed at read time from the exact state
(decimal sum / count — IEEE division, deterministic), so they are always
consistent with the state and never need to merge themselves.

100 TB: the state table is |distinct groups| rows regardless of fact
volume; batch maintenance shuffles only the batch's partial aggregate
(map-side combined) plus the touched bucket slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tradingview_data_pipeline_spark.operators.merge import ParquetTable

_SEP = "\x1f"


class IncrementalRollup:
    """Maintains count/sum/min/max per group for one measure column.

    ``group_keys`` may be any arity; a derived composite key column
    ``rk`` (unit-separator join) is the table's merge/bucket key so the
    bucket pruning machinery stays single-key.
    """

    def __init__(self, spark: SparkSession, path: str,
                 group_keys: list[str], value_col: str, *,
                 buckets: int | None = 16, sum_scale: str = "25,6"):
        self.spark = spark
        self.group_keys = list(group_keys)
        self.value_col = value_col
        self.sum_scale = sum_scale
        fields = [T.StructField("rk", T.StringType(), False)]
        fields += [T.StructField(k, T.StringType()) for k in self.group_keys]
        p, s = (int(x) for x in sum_scale.split(","))
        fields += [
            T.StructField("cnt", T.LongType()),
            T.StructField("vsum", T.DecimalType(p, s)),
            T.StructField("vmin", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
        ]
        self.schema = T.StructType(fields)
        self.table = ParquetTable(spark, path, self.schema, "rk",
                                  buckets=buckets)

    # -- state construction --------------------------------------------------

    def _rk(self):
        return F.concat_ws(_SEP, *[F.col(k).cast("string")
                                   for k in self.group_keys])

    def partial_state(self, batch: DataFrame) -> DataFrame:
        """Aggregate one batch to mergeable state rows (map-side
        combined partial aggregate — the only shuffle of batch data)."""
        v = F.col(self.value_col)
        return (
            batch.withColumn("rk", self._rk())
            .groupBy("rk", *[F.col(k).cast("string").alias(k)
                             for k in self.group_keys])
            .agg(F.count(v).alias("cnt"),
                 F.sum(v.cast(f"decimal({self.sum_scale})")).alias("vsum"),
                 F.min(v.cast("double")).alias("vmin"),
                 F.max(v.cast("double")).alias("vmax"))
        )

    @staticmethod
    def _combine(tgt: DataFrame, src: DataFrame) -> DataFrame:
        keys = [c for c in tgt.columns
                if c not in ("cnt", "vsum", "vmin", "vmax")]
        return (
            tgt.unionByName(src)
            .groupBy(*keys)
            .agg(F.sum("cnt").alias("cnt"), F.sum("vsum").alias("vsum"),
                 F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))
        )

    # -- maintenance / read --------------------------------------------------

    def update(self, batch: DataFrame) -> None:
        """Fold one append batch into the rollup (O(delta))."""
        self.table.merge_with(self.partial_state(batch), self._combine)

    def read(self) -> DataFrame:
        """Current rollup with the derived average (exact: decimal sum /
        count, correctly-rounded IEEE division)."""
        st = self.table.read().drop("rk")
        return st.withColumn(
            "vavg",
            F.when(F.col("cnt") > 0,
                   F.col("vsum").cast("double") / F.col("cnt")))
