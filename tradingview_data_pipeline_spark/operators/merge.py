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

Scale design — bucket-pruned maintenance: with ``buckets=N`` the table
is laid out as ``path/__bucket=B/`` subdirs, B = pmod(hash(key), N)
(Spark's deterministic murmur3). Every maintenance op then

  1. computes the source's touched buckets (<= N distinct values —
     a bounded collect),
  2. reads ONLY those buckets of the target (partition pruning on the
     ``__bucket`` directory column),
  3. merges and rewrites ONLY those bucket directories (atomic per-bucket
     rename). Untouched buckets' files are never opened or rewritten.

A daily upsert touching K symbols therefore costs O(K/N * table), not
O(table) — the poor-man's file pruning that Delta/Iceberg would provide
transactionally (there the same call sites become ``MERGE INTO`` with
file skipping + deletion vectors). Unbucketed mode (``buckets=None``)
keeps the simple whole-directory atomic swap; the cross-bucket rename
window in bucketed mode is the documented parquet-fallback tradeoff.

At 100 TB: size N so a bucket ~ a few GB (e.g. N=8192 for symbol keys);
the merge join shuffles only the touched slice, and both sides hash on
the same key so AQE plans a co-located join.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET_COL = "__bucket"


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
    """A keyed table stored as parquet with atomic replace-on-write.

    ``buckets=N`` switches to the hash-bucketed layout with bucket-pruned
    maintenance (see module docstring)."""

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType,
                 key: str, *, buckets: int | None = None):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.key = key
        self.buckets = buckets

    # -- read ---------------------------------------------------------------

    def exists(self) -> bool:
        if not os.path.isdir(self.path):
            return False
        names = os.listdir(self.path)
        return ("_SUCCESS" in names
                or any(n.endswith(".parquet") for n in names)
                or any(n.startswith(f"{_BUCKET_COL}=") for n in names))

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return self._read_raw().drop(_BUCKET_COL) if self.buckets else \
            self.spark.read.schema(self.schema).parquet(self.path)

    def repair(self) -> None:
        """Crash recovery for the bucket swap (``_rewrite_touched_buckets``
        renames ``__bucket=B`` -> ``__bucket=B__old_x`` then the new dir
        into place, then removes the old copy).  A crash in that window
        leaves one of two states, both repaired here:

        - old dir present, live dir MISSING (crashed between the two
          renames): restore the old dir — the bucket reverts to its
          pre-merge content and re-running the maintenance op converges
          (MERGE is idempotent).
        - old dir AND live dir present (crashed before cleanup): drop the
          old copy — the new bucket is already live.

        This is a WRITE-path op: it runs at the start of every bucketed
        maintenance op (single-writer context) and may be invoked
        explicitly, but never from ``read()`` — a reader that observed a
        healthy in-flight swap mid-window would otherwise "restore" the
        old dir and abort the writer's rename.  Until the next
        maintenance op runs, a post-crash ``read()`` still returns every
        key exactly once: the stray ``__bucket=B__old_x`` dir surfaces
        through partition discovery (its unparseable partition value
        try_casts to a NULL ``__bucket``), carrying the bucket's
        pre-merge rows.

        Buckets the interrupted op never reached keep their old content —
        reads stay consistent, merely mixed-version until the op is
        re-run."""
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if not name.startswith(f"{_BUCKET_COL}=") or "__old_" not in name:
                continue
            live = os.path.join(self.path, name.split("__old_")[0])
            old = os.path.join(self.path, name)
            if os.path.isdir(live):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, live)

    def _read_raw(self) -> DataFrame:
        """Bucketed read keeping the ``__bucket`` directory column (the
        partition-pruning handle). Read-only — crash repair happens on
        the write path (see ``repair``); crash leftovers are RESOLVED here
        without touching disk: a live ``__bucket=B`` dir always wins, and
        a stray ``__bucket=B__old_x`` dir is read only when its live dir
        is missing (it then carries the bucket's pre-merge rows), so every
        key reads exactly once in every crash state."""
        names = os.listdir(self.path) if os.path.isdir(self.path) else []
        stray = [n for n in names
                 if n.startswith(f"{_BUCKET_COL}=") and "__old_" in n]
        if not stray:
            try:
                df = self.spark.read.parquet(self.path)
            except Exception:                  # empty dir (just _SUCCESS)
                return self.spark.createDataFrame([], self._bucketed_schema())
            if _BUCKET_COL not in df.columns:  # legacy unbucketed layout
                df = df.withColumn(_BUCKET_COL, self._bucket_expr())
            return align_to_schema(df, self._bucketed_schema())
        live = [n for n in names
                if n.startswith(f"{_BUCKET_COL}=") and "__old_" not in n]
        parts = []
        if live:
            parts.append(self.spark.read.option("basePath", self.path)
                         .parquet(*[os.path.join(self.path, n) for n in live]))
        live_set = set(live)
        for n in stray:
            if n.split("__old_")[0] in live_set:
                continue                       # superseded — new dir is live
            parts.append(self.spark.read
                         .parquet(os.path.join(self.path, n))
                         .withColumn(_BUCKET_COL, self._bucket_expr()))
        if not parts:
            return self.spark.createDataFrame([], self._bucketed_schema())
        out = align_to_schema(parts[0], self._bucketed_schema())
        for p in parts[1:]:
            out = out.unionByName(align_to_schema(p, self._bucketed_schema()))
        return out

    def _bucketed_schema(self) -> T.StructType:
        return T.StructType(list(self.schema.fields)
                            + [T.StructField(_BUCKET_COL, T.IntegerType())])

    def _bucket_expr(self):
        return F.pmod(F.hash(F.col(self.key)), F.lit(self.buckets)).cast("int")

    # -- write primitives ---------------------------------------------------

    def _replace_with(self, df: DataFrame) -> None:
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        out = align_to_schema(df, self.schema)
        if self.buckets:
            out.withColumn(_BUCKET_COL, self._bucket_expr()) \
               .write.partitionBy(_BUCKET_COL).mode("overwrite").parquet(tmp)
        else:
            out.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def _rewrite_touched_buckets(self, src: DataFrame, combine) -> None:
        """Bucket-pruned maintenance: read only the buckets the source
        touches, apply ``combine(tgt_slice, src)``, atomically swap only
        those bucket directories. Untouched buckets are never read or
        rewritten."""
        # Repair before reading the touched slice: a stray __old_ dir's
        # rows carry a NULL __bucket and would dodge the isin() pruning
        # filter below — repairing first restores them to their bucket.
        self.repair()
        src = src.withColumn(_BUCKET_COL, self._bucket_expr())
        touched = sorted(r[0] for r in
                         src.select(_BUCKET_COL).distinct().collect())
        if not touched:
            return
        tgt = (self._read_raw()
               .where(F.col(_BUCKET_COL).isin([int(b) for b in touched]))
               .drop(_BUCKET_COL))
        merged = combine(tgt, src.drop(_BUCKET_COL))
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        align_to_schema(merged, self.schema) \
            .withColumn(_BUCKET_COL, self._bucket_expr()) \
            .write.partitionBy(_BUCKET_COL).mode("overwrite").parquet(tmp)
        try:
            for b in touched:
                new_dir = os.path.join(tmp, f"{_BUCKET_COL}={b}")
                dst_dir = os.path.join(self.path, f"{_BUCKET_COL}={b}")
                if not os.path.isdir(new_dir):
                    continue                   # nothing landed in this bucket
                old = f"{dst_dir}__old_{uuid.uuid4().hex[:8]}"
                if os.path.isdir(dst_dir):
                    os.rename(dst_dir, old)
                os.rename(new_dir, dst_dir)
                if os.path.isdir(old):
                    shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def overwrite(self, df: DataFrame) -> None:
        """K3 truncate-and-load."""
        self._replace_with(df)

    # -- merge frames (shared by whole-table and bucket-pruned paths) -------

    def _merge_frames(self, tgt: DataFrame, src: DataFrame,
                      source_cols: set, update_only: bool) -> DataFrame:
        # join on the key name (USING semantics): Spark emits one coalesced
        # key column for full-outer, exactly the J1 key-coalesce behavior
        joined = tgt.alias("t").join(src.alias("s"), on=self.key, how="full_outer")
        out_cols = [F.col(self.key)]
        for f in self.schema.fields:
            if f.name == self.key:
                continue
            t_c, s_c = F.col(f"t.{f.name}"), F.col(f"s.{f.name}")
            if update_only and f.name not in source_cols:
                out_cols.append(t_c.alias(f.name))
            else:
                out_cols.append(F.coalesce(s_c, t_c).alias(f.name))
        return joined.select(*out_cols)

    def _update_frames(self, tgt: DataFrame, src: DataFrame,
                       src_cols: set) -> DataFrame:
        joined = tgt.alias("t").join(
            src.alias("s").select(self.key,
                                  *[c for c in src_cols if c != self.key]),
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
        return joined.select(*out_cols)

    # -- maintenance ops -----------------------------------------------------

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
        combine = lambda tgt, s: self._merge_frames(
            tgt, s, source_cols, update_only_source_columns)
        if self.buckets:
            self._rewrite_touched_buckets(src, combine)
        else:
            self._replace_with(combine(self.read(), src))

    def append_dedup(self, source: DataFrame) -> None:
        """K5: insert only rows whose key is not already present
        (left-anti join — the set-based form of the reference's
        fetch-all-URLs-then-skip loop, newsflow_scraper.py:243-293).
        Bucketed: the anti-join probes only the source's buckets (a key
        can only collide inside its own hash bucket)."""
        src = align_to_schema(source, self.schema) \
            .where(F.col(self.key).isNotNull()) \
            .dropDuplicates([self.key])
        if not self.exists():
            self._replace_with(src)
            return

        def combine(tgt: DataFrame, s: DataFrame) -> DataFrame:
            fresh = s.join(tgt.select(self.key), on=self.key, how="left_anti")
            return tgt.unionByName(fresh)

        if self.buckets:
            self._rewrite_touched_buckets(src, combine)
        else:
            self._replace_with(combine(self.read(), src))

    def merge_with(self, source: DataFrame, combine) -> None:
        """General MERGE with a caller-supplied ``combine(tgt_slice,
        src) -> DataFrame`` (e.g. additive aggregate-state merging for
        incremental rollups, operators/incremental.py).  Bucketed tables
        rewrite only the buckets the source touches — the combine sees
        exactly the target rows that can interact with the source keys."""
        src = align_to_schema(source, self.schema) \
            .where(F.col(self.key).isNotNull())
        if not self.exists():
            self._replace_with(combine(self.spark.createDataFrame([], self.schema), src))
            return
        if self.buckets:
            self._rewrite_touched_buckets(src, combine)
        else:
            self._replace_with(combine(self.read(), src))

    def update_where(self, updates: DataFrame) -> None:
        """K4 as MERGE (matched-update only): never per-row round trips."""
        src = align_to_schema(updates, self.schema).dropDuplicates([self.key]) \
            .where(F.col(self.key).isNotNull())
        src_cols = set(updates.columns)
        if self.buckets and self.exists():
            self._rewrite_touched_buckets(
                src, lambda tgt, s: self._update_frames(tgt, s, src_cols))
        else:
            self._replace_with(self._update_frames(self.read(), src, src_cols))
