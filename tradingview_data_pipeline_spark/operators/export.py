"""Deterministic sharded export: write a corpus as N stable shards.

Training jobs consume fixed shard sets (e.g. 1024 files) with two
requirements plain ``df.write`` doesn't give: (1) a row's shard must be
a pure function of its id — re-exporting a grown corpus moves no
existing row, and any two runs (any cluster layout, any partitioning)
produce identical shard membership; (2) each shard should be one file
with a deterministic row order, so downstream readers can seek/resume
reproducibly.

Implementation: shard = salted-md5(id) % n (map-side expression), then
``repartition(n, shard)`` so each shard value lands in exactly one task,
``sortWithinPartitions`` on the hash for stable in-file order, and
``partitionBy(shard)`` dirs — one file per shard directory.  At 100 TB
the export is one shuffle, and shard skew is bounded by the hash
uniformity (no hot keys: ids are unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators.sampling import hash60

SHARD_COL = "shard"


def assign_shard(df: DataFrame, id_col: str, n_shards: int,
                 salt: str = "shard") -> DataFrame:
    """Attach the deterministic shard id (pure projection)."""
    return df.withColumn(
        SHARD_COL, (hash60(F.col(id_col), salt) % F.lit(int(n_shards)))
        .cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    *,
    fmt: str = "parquet",
    salt: str = "shard",
) -> None:
    """Write ``df`` as ``n_shards`` hash-stable shard directories
    (``shard=K/part-*.{parquet,json}``), one file per shard, rows
    ordered by (row hash, id)."""
    sharded = assign_shard(df, id_col, n_shards, salt)
    out = (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(hash60(F.col(id_col), salt), F.col(id_col))
    )
    writer = out.write.mode("overwrite").partitionBy(SHARD_COL)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
