"""Keyed-table maintenance: MERGE upsert, overwrite, append-with-dedup
(SURVEY K1-K5).

The reference upserts via PostgREST ``upsert(batch, on_conflict=key)`` in
hand-chunked batches with per-row retry (uploadtodb.py:159-198). In this
engine a table is a parquet directory (production target: Delta/Iceberg,
where ``merge_upsert`` maps 1:1 onto ``MERGE INTO``) and maintenance ops
are set-based:

- ``merge_upsert``  = MERGE: matched rows take the source's non-null
  column values (column-wise coalesce — the technical and fundamental
  pipelines update disjoint column subsets of the same row, K1/J5),
  unmatched source rows are inserted.
- ``overwrite``     = truncate-and-load (K3).
- ``append_dedup``  = insert only keys not already present (K5/J4).

Scale notes: the merge join shuffles on the key — at 100 TB the target
would be bucketed/partitioned by the same key so the join is co-located;
with Delta/Iceberg, file-level pruning plus deletion vectors avoid the
full rewrite this parquet fallback performs. Writes go through a temp
directory + atomic rename so readers never see partial state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project onto the declared schema: missing columns -> typed NULLs,
    extra columns dropped, types cast (tolerant sink alignment,
    sectormerged_improved.py:655-680)."""
    exprs = []
    for f in schema.fields:
        if f.name in df.columns:
            exprs.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*exprs)


class ParquetTable:
    """A keyed table stored as parquet with atomic replace-on-write."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType,
                 key: str):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.key = key

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(n.endswith(".parquet")
                                             for n in os.listdir(self.path)))

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(self.path)

    # -- write primitives ---------------------------------------------------

    def _replace_with(self, df: DataFrame) -> None:
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        align_to_schema(df, self.schema).write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def overwrite(self, df: DataFrame) -> None:
        """K3 truncate-and-load."""
        self._replace_with(df)

    def merge_upsert(self, source: DataFrame, *,
                     update_only_source_columns: bool = True) -> None:
        """K1/K2 MERGE on the key.

        Matched rows: for every non-key column, take the source value when
        the source actually carries that column and it is non-null,
        else keep the target's (so a technical-only upsert never nulls out
        fundamental columns — the reference achieves the same by sending
        only its own column subset per request).
        Unmatched: insert (with NULLs for columns the source lacks).
        Source rows with NULL key are dropped (P4, uploadtodb.py:171-174).
        """
        source_cols = set(source.columns)
        src = align_to_schema(source, self.schema) \
            .where(F.col(self.key).isNotNull()) \
            .dropDuplicates([self.key])
        if not self.exists():
            self._replace_with(src)
            return
        tgt = self.read()
        # join on the key name (USING semantics): Spark emits one coalesced
        # key column for full-outer, exactly the J1 key-coalesce behavior
        joined = tgt.alias("t").join(src.alias("s"), on=self.key, how="full_outer")
        out_cols = [F.col(self.key)]
        for f in self.schema.fields:
            if f.name == self.key:
                continue
            t_c, s_c = F.col(f"t.{f.name}"), F.col(f"s.{f.name}")
            if update_only_source_columns and f.name not in source_cols:
                out_cols.append(t_c.alias(f.name))
            else:
                out_cols.append(F.coalesce(s_c, t_c).alias(f.name))
        self._replace_with(joined.select(*out_cols))

    def append_dedup(self, source: DataFrame) -> None:
        """K5: insert only rows whose key is not already present
        (left-anti join — the set-based form of the reference's
        fetch-all-URLs-then-skip loop, newsflow_scraper.py:243-293)."""
        src = align_to_schema(source, self.schema) \
            .where(F.col(self.key).isNotNull()) \
            .dropDuplicates([self.key])
        if not self.exists():
            self._replace_with(src)
            return
        tgt = self.read()
        fresh = src.join(tgt.select(self.key), on=self.key, how="left_anti")
        self._replace_with(tgt.unionByName(fresh))

    def update_where(self, updates: DataFrame) -> None:
        """K4 as MERGE (matched-update only): never per-row round trips."""
        src = align_to_schema(updates, self.schema).dropDuplicates([self.key])
        tgt = self.read()
        src_cols = set(updates.columns)
        joined = tgt.alias("t").join(
            src.alias("s").select(self.key, *[c for c in src_cols if c != self.key]),
            on=self.key, how="left")
        out_cols = [F.col(self.key)]
        for f in self.schema.fields:
            if f.name == self.key:
                continue
            if f.name in src_cols:
                out_cols.append(F.coalesce(F.col(f"s.{f.name}"), F.col(f"t.{f.name}"))
                                .cast(f.dataType).alias(f.name))
            else:
                out_cols.append(F.col(f"t.{f.name}").alias(f.name))
        self._replace_with(joined.select(*out_cols))
