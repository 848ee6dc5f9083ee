"""Order-independent table fingerprints for cross-system reconciliation.

The 100 TB migration/replication problem: prove two copies of a table
(cluster A vs cluster B, pre- vs post-migration, engine vs oracle) hold
the same rows without shipping or sorting either copy. The classic
answer is a bucketed content checksum:

- canonical row string -> 60-bit md5 row hash (stable across engines;
  same construction as sampling.hash60),
- bucket = row_hash % n_buckets,
- per bucket: row count + two order-independent accumulators (modular
  SUM and XOR of the row hashes — XOR alone is blind to rows appearing
  an even number of times, the modular sum catches those; together with
  the count, any single-row difference flips at least one).

Comparing two tables is then a join of two ``n_buckets``-row frames
(``fingerprint_diff``); only differing buckets need a row-level re-scan
(re-hash filtered to ``pmod(hash, n) IN diff``), so reconciliation cost
is proportional to the DIFFERENCE, not the table.

Caveats (documented, not hidden): the fingerprint covers the canonical
string image of the selected columns — callers pick columns with stable
cross-engine string forms (ints/strings/dates; doubles should be
pre-rounded or formatted). NULL is encoded as a sentinel so
``concat_ws`` cannot silently collapse it into the empty string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators.sampling import hash60

NULL_SENTINEL = "__NULL__"
HASH_MOD = 1 << 60


def canonical_row(cols: list[str]) -> Column:
    """'|'-joined string image of ``cols`` with NULLs made explicit."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
             for c in cols]
    return F.concat_ws("|", *parts)


def row_hash60(cols: list[str]) -> Column:
    """Non-negative 60-bit md5 hash of the canonical row string (the
    single cross-engine hash construction, sampling.hash60)."""
    return hash60(canonical_row(cols))


def table_fingerprint(df: DataFrame, cols: list[str], *,
                      n_buckets: int = 64) -> DataFrame:
    """Per-bucket (bucket, n_rows, sum_mod, xor_hash) content checksum.

    One map pass + one ``n_buckets``-group aggregate; the sum
    accumulates in DECIMAL(38,0) (exact, order-independent) and is
    reduced mod 2^60 so the result stays a BIGINT in any engine.
    """
    h = row_hash60(cols)
    rows = df.select(h.alias("__h"),
                     F.pmod(h, F.lit(n_buckets)).alias("bucket"))
    return (rows.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.sum(F.col("__h").cast("decimal(38,0)"))
                  % F.lit(HASH_MOD)).cast("bigint").alias("sum_mod"),
                 F.bit_xor("__h").alias("xor_hash")))


def fingerprint_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two fingerprints disagree (full-outer, so a bucket
    present on one side only is also reported)."""
    bb = (b.withColumnRenamed("n_rows", "n_rows_b")
           .withColumnRenamed("sum_mod", "sum_mod_b")
           .withColumnRenamed("xor_hash", "xor_hash_b"))
    j = a.join(bb, "bucket", "full_outer")
    differs = (
        F.col("n_rows").eqNullSafe(F.col("n_rows_b")) &
        F.col("sum_mod").eqNullSafe(F.col("sum_mod_b")) &
        F.col("xor_hash").eqNullSafe(F.col("xor_hash_b"))
    ) == F.lit(False)
    return j.where(differs)


def rows_in_buckets(df: DataFrame, cols: list[str], buckets: list[int], *,
                    n_buckets: int = 64) -> DataFrame:
    """The row-level re-scan for differing buckets: original rows whose
    hash lands in ``buckets`` (cost ~ |diff| / n_buckets of the table)."""
    h = row_hash60(cols)
    return df.where(F.pmod(h, F.lit(n_buckets)).isin(buckets))


def changelog_fingerprint_delta(changelog: DataFrame, keys: list[str],
                                cols: list[str], *,
                                n_buckets: int = 64) -> DataFrame:
    """Per-bucket fingerprint delta implied by a ``cdc.snapshot_diff``
    changelog: every accumulator in the triple is invertible (count
    adds, modular sum adds, XOR self-cancels), so a maintained
    fingerprint is updated in O(churn) instead of re-hashing the table.

    Old images (deletes + update-before) contribute (-1, -hash, hash);
    new images (inserts + update-after) contribute (+1, +hash, hash).
    """
    def image(side: str, ops: list[str]):
        sel = [F.col(k) for k in keys] + \
              [F.col(f"{c}_{side}").alias(c) for c in cols]
        img = changelog.where(F.col("op").isin(ops)).select(*sel)
        h = row_hash60(keys + cols)
        sign = -1 if side == "old" else 1
        return img.select(
            F.pmod(h, F.lit(n_buckets)).alias("bucket"),
            F.lit(sign).alias("__dn"),
            (F.lit(sign) * h).cast("decimal(38,0)").alias("__dsum"),
            h.alias("__dxor"))

    both = image("old", ["delete", "update"]) \
        .unionByName(image("new", ["insert", "update"]))
    return (both.groupBy("bucket")
            .agg(F.sum("__dn").alias("d_rows"),
                 F.sum("__dsum").alias("d_sum"),
                 F.bit_xor("__dxor").alias("d_xor")))


def apply_fingerprint_delta(fp: DataFrame, delta: DataFrame) -> DataFrame:
    """New fingerprint = old fingerprint ⊕ changelog delta (64-row join;
    the table itself is never touched). Result rows with n_rows = 0 are
    dropped (bucket emptied). Pinned in pytest: incremental ≡ full
    recompute on the new snapshot."""
    n = F.coalesce(F.col("n_rows"), F.lit(0)) + \
        F.coalesce(F.col("d_rows"), F.lit(0))
    s = F.pmod(F.coalesce(F.col("sum_mod").cast("decimal(38,0)"),
                          F.lit(0).cast("decimal(38,0)"))
               + F.coalesce(F.col("d_sum"),
                            F.lit(0).cast("decimal(38,0)")),
               F.lit(HASH_MOD).cast("decimal(38,0)")).cast("bigint")
    x = F.coalesce(F.col("xor_hash"), F.lit(0)).bitwiseXOR(
        F.coalesce(F.col("d_xor"), F.lit(0)))
    return (fp.join(delta, "bucket", "full_outer")
            .select(F.col("bucket"), n.alias("n_rows"), s.alias("sum_mod"),
                    x.alias("xor_hash"))
            .where(F.col("n_rows") > 0))
