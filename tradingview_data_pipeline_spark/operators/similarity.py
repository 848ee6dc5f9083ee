"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the corpus, per-row fold for the dot product, TakeOrdered per
query. Scale path: coarse quantization (IVF-style) — restrict the search
to the query's bucket/cluster partition, turning the cross join into a
co-partitioned join on bucket id; and/or sign-bit LSH bucketing.

Numeric determinism: dot products are left-to-right folds over
double-cast elements (Spark ``aggregate`` ≡ DuckDB ``list_reduce`` —
verified to produce bit-identical doubles), so rankings are reproducible
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of element products, all in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors per query (self excluded).

    ``queries`` is expected to be small — Spark broadcasts it, so the
    cross join is a map-side nested loop over the corpus (no shuffle of
    the corpus). Ranking ties broken by neighbor id. Norms are
    precomputed per row (not per pair) — the dot product is the only
    per-pair fold.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       F.sqrt(l2_norm_sq(F.col(vec_col))).alias("qn"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      F.sqrt(l2_norm_sq(F.col(vec_col))).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def bucketed_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                  vec_col: str, bucket_col: str, k: int = 3) -> DataFrame:
    """IVF-style approximate top-k: search only within the query's bucket
    (cluster/partition id). The join is an equi-join on bucket id —
    co-partitioned, no cross join; each bucket's candidates stay local.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       F.col(bucket_col).alias("bk"),
                       F.sqrt(l2_norm_sq(F.col(vec_col))).alias("qn"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      F.col(bucket_col).alias("bk"),
                      F.sqrt(l2_norm_sq(F.col(vec_col))).alias("cn"))
    scored = (
        c.join(F.broadcast(q), "bk")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("query_id", "bk", "neighbor_id", "cos", "rk")
    )


def embedding_near_dups(corpus: DataFrame, id_col: str, vec_col: str,
                        bucket_col: str, *, threshold: float = 0.95) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, bucketed to avoid the
    full O(n²): only pairs within the same bucket are compared."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                      F.col(bucket_col).alias("bk"),
                      F.sqrt(l2_norm_sq(F.col(vec_col))).alias("na"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                      F.col(bucket_col).alias("bk"),
                      F.sqrt(l2_norm_sq(F.col(vec_col))).alias("nb"))
    return (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "bk", "cos")
    )
