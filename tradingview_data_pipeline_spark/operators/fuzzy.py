"""Fuzzy string matching (record linkage) via blocking + exact edit
distance.

The classic entity-resolution shape a training-data pipeline needs when
merging scraped catalogs: canonicalize near-identical string values
("smal bolt" / "small bolt") without an O(|corpus|²) comparison. Three
scale levers keep it linear-ish at 100 TB:

1. **Vocabulary-first**: distinct values are matched, not rows. A 100 TB
   fact with a few million distinct names compares |V|² in the worst
   case, never |corpus|²; row-level effects come back via an aggregate
   join on the (small) matched-pair frame.
2. **Blocking**: candidate pairs are generated only within a blocking
   key (default: last whitespace token), turning |V|² into
   sum(|block|²). The block function is caller-pluggable (phonetic key,
   sorted-token prefix, ...).
3. **Degenerate-block cap**: template values ('', 'unknown', boilerplate
   suffixes) create one huge block whose self-join is quadratic;
   blocks over ``max_block`` members are dropped BEFORE the join, the
   same guard as the MinHash/SimHash LSH operators (dedup.py).

Cheap pre-filter: ``|len(a) - len(b)| > d`` implies edit distance > d,
so the length band prunes before the O(n·d) distance evaluation; the
Spark side additionally uses the thresholded ``levenshtein(l, r, d)``
form (early-exit, returns -1 past the bound).

Reference parity: the reference has no fuzzy matcher (its symbol joins
are exact); this extends SURVEY §2's join family with the blocked
similarity-join shape used for catalog/entity cleanup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token_block(c: Column) -> Column:
    """Default blocking key: the last whitespace-delimited token."""
    return F.regexp_extract(c, r"(\S+)$", 1)


def blocked_levenshtein_pairs(df: DataFrame, name_col: str, *,
                              max_distance: int = 3,
                              block_fn: Callable[[Column], Column] | None = None,
                              max_block: int = 10_000) -> DataFrame:
    """Candidate near-identical value pairs from a string column.

    Returns ``(blk, name_a, name_b, distance)`` with ``name_a < name_b``
    (each unordered pair appears once), ``distance`` the exact
    Levenshtein distance, over the DISTINCT values of ``name_col``.
    """
    blk_of = block_fn or last_token_block
    v = (df.select(F.col(name_col).alias("name"))
           .where(F.col("name").isNotNull()).distinct()
           .withColumn("blk", blk_of(F.col("name"))))
    # Drop degenerate blocks before the self-join (quadratic guard). The
    # per-block size frame is one row per distinct block — broadcast it.
    sizes = v.groupBy("blk").agg(F.count(F.lit(1)).alias("__bn"))
    v = v.join(F.broadcast(sizes.where(F.col("__bn") <= max_block)),
               "blk").drop("__bn")
    a = v.select("blk", F.col("name").alias("name_a"))
    b = v.select("blk", F.col("name").alias("name_b"))
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.abs(F.length("name_a") - F.length("name_b")) <= max_distance)
        .withColumn("distance",
                    F.levenshtein("name_a", "name_b", max_distance))
        .where(F.col("distance") >= 0)
    )


def fuzzy_match_rollup(df: DataFrame, name_col: str, *,
                       max_distance: int = 3,
                       block_fn: Callable[[Column], Column] | None = None,
                       max_block: int = 10_000) -> DataFrame:
    """Matched value pairs with per-side row counts from the source frame.

    The join-back is an aggregate join: ``df`` is reduced to one count
    row per distinct value first, so the pair frame (small) joins a
    value-count frame (|V| rows), never the raw fact.
    """
    pairs = blocked_levenshtein_pairs(df, name_col,
                                      max_distance=max_distance,
                                      block_fn=block_fn,
                                      max_block=max_block)
    counts = (df.groupBy(F.col(name_col).alias("name"))
                .agg(F.count(F.lit(1)).alias("n")))
    return (
        pairs
        .join(counts.select(F.col("name").alias("name_a"),
                            F.col("n").alias("n_rows_a")), "name_a")
        .join(counts.select(F.col("name").alias("name_b"),
                            F.col("n").alias("n_rows_b")), "name_b")
        .select("blk", "name_a", "name_b", "distance",
                "n_rows_a", "n_rows_b")
    )
