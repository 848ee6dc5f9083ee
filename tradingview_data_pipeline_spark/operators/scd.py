"""SCD Type-2 dimension maintenance: versioned history under periodic
snapshots, set-based.

The reference overwrites dimension-ish tables (industry/sector segment
lists) on every scrape, losing history.  The warehouse-standard answer
is slowly-changing-dimension type 2: when a tracked attribute changes,
close the old version (``valid_to`` = snapshot time) and open a new one
(``valid_from`` = snapshot time, ``valid_to`` NULL).  Point-in-time
reads then reconstruct any past state — which is also what makes
training-data joins time-travel-correct (the as-of join in
``operators/asof.py`` against a dimension needs versioned rows to avoid
future leakage).

Set-based plan per snapshot: ONE join of the snapshot against current
versions decides changed/new keys; closed + opened rows flow through the
bucket-pruned MERGE (``ParquetTable``), so maintenance cost is
O(changed keys), not O(history).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tradingview_data_pipeline_spark.operators.merge import ParquetTable

_SEP = "\x1f"


class Scd2Table:
    """Versioned dimension keyed by ``key`` tracking ``attrs`` columns.

    Storage key is (key, valid_from) — closing a version updates its row
    in place; opening one inserts. Both ride one ``merge_upsert``.
    """

    def __init__(self, spark: SparkSession, path: str, key: str,
                 attrs: list[str], *, buckets: int | None = 8):
        self.spark = spark
        self.key = key
        self.attrs = list(attrs)
        fields = [T.StructField("vk", T.StringType(), False),
                  T.StructField(key, T.StringType())]
        fields += [T.StructField(a, T.StringType()) for a in self.attrs]
        fields += [T.StructField("valid_from", T.TimestampType()),
                   T.StructField("valid_to", T.TimestampType()),
                   T.StructField("is_current", T.BooleanType())]
        self.schema = T.StructType(fields)
        self.table = ParquetTable(spark, path, self.schema, "vk",
                                  buckets=buckets)

    # -- maintenance ---------------------------------------------------------

    def apply_snapshot(self, snapshot: DataFrame, as_of: dt.datetime) -> None:
        """Fold one full snapshot in: unchanged keys untouched, changed
        keys close+reopen, new keys open.  (Keys absent from the
        snapshot are left open — deletions are modeled upstream as a
        tombstone attribute if needed.)"""
        snap = snapshot.select(
            F.col(self.key).cast("string").alias(self.key),
            *[F.col(a).cast("string").alias(a) for a in self.attrs],
        ).dropDuplicates([self.key]).where(F.col(self.key).isNotNull())

        cur = self.table.read().where(F.col("is_current")).select(
            F.col(self.key).alias("__k"),
            F.col("valid_from").alias("__vf"),
            *[F.col(a).alias(f"__t_{a}") for a in self.attrs])

        j = snap.join(cur, snap[self.key] == cur["__k"], "left")
        changed = F.lit(False)
        for a in self.attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.col(f"__t_{a}"))
        is_new = F.col("__k").isNull()

        lit_ts = F.lit(as_of)
        opened = (
            j.where(is_new | changed)
            .select(
                F.concat_ws(_SEP, F.col(self.key),
                            F.date_format(lit_ts, "yyyy-MM-dd HH:mm:ss"))
                .alias("vk"),
                self.key, *self.attrs,
                lit_ts.alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"))
        )
        closed = (
            j.where(changed & ~is_new)
            .select(
                F.concat_ws(_SEP, F.col("__k"),
                            F.date_format(F.col("__vf"), "yyyy-MM-dd HH:mm:ss"))
                .alias("vk"),
                F.col("__k").alias(self.key),
                *[F.col(f"__t_{a}").alias(a) for a in self.attrs],
                F.col("__vf").alias("valid_from"),
                lit_ts.alias("valid_to"),
                F.lit(False).alias("is_current"))
        )
        self.table.merge_upsert(opened.unionByName(closed),
                                update_only_source_columns=False)

    # -- reads ---------------------------------------------------------------

    def history(self) -> DataFrame:
        return self.table.read().drop("vk")

    def current(self) -> DataFrame:
        return self.history().where(F.col("is_current")) \
            .select(self.key, *self.attrs)

    def version_at(self, ts: dt.datetime) -> DataFrame:
        """Point-in-time state: versions valid at ``ts`` (inclusive
        from, exclusive to)."""
        t = F.lit(ts)
        return self.history().where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        ).select(self.key, *self.attrs, "valid_from", "valid_to")
