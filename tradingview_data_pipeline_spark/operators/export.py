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
    partition_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as ``n_shards`` hash-stable shard directories
    (``shard=K/part-*.{parquet,json}``), one file per shard, rows
    ordered by (row hash, id).

    ``partition_cols`` prepends hive partition levels (e.g.
    ``["split"]`` -> ``split=train/shard=K/...``) written in the SAME
    single pass — each shard lives in exactly one task, so every
    (partition, shard) still gets one file, and a multi-split corpus
    export costs one computation of the input instead of one filtered
    pass per split."""
    sharded = assign_shard(df, id_col, n_shards, salt)
    out = (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(hash60(F.col(id_col), salt), F.col(id_col))
    )
    writer = out.write.mode("overwrite").partitionBy(
        *(partition_cols or []), SHARD_COL)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


# ---------------------------------------------------------------------------
# Clustered (sorted) writes + zone-map inspection.
#
# At 100 TB the cheapest scan is the one that never happens: parquet
# row-group min/max statistics ("zone maps") let a range predicate skip
# whole row groups, but only if the layout CLUSTERS the predicate column
# — a hash/arrival layout scatters every value range across every file
# and the stats prune nothing. ``write_clustered`` is the 1-D
# clustering pass (repartitionByRange -> sortWithinPartitions -> write):
# one range shuffle, globally sorted layout, disjoint per-file ranges.
# ``zone_maps``/``prunable_fraction`` read the footers back (pyarrow) so
# the pruning win is MEASURED, not assumed — the same check a table
#-maintenance job would run after an OPTIMIZE-style rewrite.
# ---------------------------------------------------------------------------


def write_clustered(df: DataFrame, path: str, sort_cols: list[str], *,
                    n_files: int = 8, fmt: str = "parquet") -> None:
    """Range-cluster ``df`` on ``sort_cols`` into ``n_files`` sorted
    files (globally sorted layout; ranges across files are disjoint)."""
    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    writer = out.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def zone_maps(path: str, col: str) -> list[tuple]:
    """(min, max) per parquet row group across all files under ``path``
    for ``col``, straight from the footers (no data pages read)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(_os.path.join(path, "**", "*.parquet"),
                               recursive=True)):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                out.append((st.min, st.max))
    return out


def prunable_fraction(zmaps: list[tuple], lo, hi) -> float:
    """Fraction of row groups a ``col BETWEEN lo AND hi`` scan skips
    using only the zone maps (the reader's pruning decision)."""
    if not zmaps:
        return 0.0
    skipped = sum(1 for mn, mx in zmaps if mx < lo or mn > hi)
    return skipped / len(zmaps)


def zorder_value(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of ``len(cols)`` non-negative integer
    columns: bit j of column i lands at position j*n + i. A pure
    shift/mask expression tree (codegen'd, no UDF). Callers quantize
    non-integer columns to ranks/buckets first — Z-order operates on
    the quantized image, like every lakehouse OPTIMIZE ZORDER."""
    n = len(cols)
    z = None
    for i, c in enumerate(cols):
        for j in range(bits):
            term = F.shiftleft(
                F.shiftright(c.cast("bigint"), j).bitwiseAND(F.lit(1)),
                j * n + i)
            z = term if z is None else z + term
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str], *,
                   bits: int = 16, n_files: int = 8,
                   validate: bool = True) -> None:
    """Multi-dimensional clustering: range-partition + sort on the
    Morton value so EVERY listed column gets usable zone maps — the
    2-D answer to ``write_clustered``'s 1-D layout (which prunes one
    column perfectly and the others not at all).

    ``zorder_value`` interleaves only the low ``bits`` bits, so a
    column exceeding that range would silently degenerate into
    low-bit-hash order and prune nothing; ``validate`` (default on)
    spends one tiny min/max aggregate before the (heavyweight) write
    to fail loudly instead. Quantize wide columns to ranks/buckets
    first, as every OPTIMIZE ZORDER does.
    """
    if len(cols) * bits > 63:
        # bit j*n+i must stay below the bigint sign bit: one more and
        # the top interleaved bit flips the SIGN (reversing the order
        # of the high half), and past 64 the shiftleft amount wraps
        # mod 64 — both silently corrupt the clustering.
        raise ValueError(
            f"write_zordered: {len(cols)} columns x bits={bits} = "
            f"{len(cols) * bits} interleaved bits > 63 (bigint sign "
            f"bit); lower bits to <= {63 // len(cols)} or drop columns")
    if validate:
        row = df.agg(*[F.min(c).alias(f"mn_{c}") for c in cols],
                     *[F.max(c).alias(f"mx_{c}") for c in cols]).head()
        for c in cols:
            mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
            if mn is not None and mn < 0:
                raise ValueError(
                    f"write_zordered: column {c!r} has negative value "
                    f"{mn}; quantize to non-negative ints first")
            if mx is not None and mx >= (1 << bits):
                raise ValueError(
                    f"write_zordered: column {c!r} max {mx} needs more "
                    f"than bits={bits}; raise bits or quantize to ranks")
    z = zorder_value([F.col(c) for c in cols], bits)
    out = (df.withColumn("__z", z)
           .repartitionByRange(n_files, F.col("__z"))
           .sortWithinPartitions("__z")
           .drop("__z"))
    out.write.mode("overwrite").parquet(path)
