"""Vector clustering queries over ``embeddings``: exact quantized group
centroids feeding nearest-centroid assignment — one deterministic
Lloyd/k-means iteration (q53).

Determinism: component sums run on a 1e-6 integer grid (associative
BIGINT adds — layout-independent at any scale), divisions and
multiplications are IEEE correctly-rounded, and the distance fold is
left-to-right (Spark ``aggregate`` ≡ DuckDB ``list_reduce``; the 0.0
initial accumulator is exact-neutral for the non-negative squares).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import similarity as sim
from tradingview_data_pipeline_spark.plans.analytics import register, _t

_CENT_SQL = """
  SELECT label, i - 1 AS dim, COUNT(*) AS n,
         CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT))
              AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
  GROUP BY label, i - 1
"""


# ---------------------------------------------------------------------------
# q53 — one deterministic Lloyd/k-means iteration, BOTH halves in one
# query: per-label quantized centroids (the "train" half — long-form
# explode + BIGINT hash-aggregate, shuffling labels x dims rows of
# 8 bytes with full map-side combine; formerly standalone q52) feed the
# nearest-centroid assignment (the "assign" half — centroids pivot to
# arrays and broadcast; each vector scans the k=10 centroids map-side
# with a fold distance, no shuffle of the embedding table).  The output
# `dist` is an exact function of every centroid component, so the
# driver's value hash still pins the centroid math; the centroid table
# itself is additionally pinned in tests/test_vector_ops.py.
# ---------------------------------------------------------------------------

@register("q53_kmeans_assign", oracle=f"""
WITH cent AS ({_CENT_SQL}),
cvecs AS (
  SELECT label AS c_label, list(centroid ORDER BY dim) AS cvec
  FROM cent GROUP BY label
), dists AS (
  SELECT e.vec_id, e.label, c.c_label,
         list_reduce(
           list_transform(range(len(e.embedding)),
             i -> (CAST(e.embedding[i+1] AS DOUBLE) - c.cvec[i+1])
                * (CAST(e.embedding[i+1] AS DOUBLE) - c.cvec[i+1])),
           (a, b) -> a + b) AS dist
  FROM embeddings e CROSS JOIN cvecs c
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, c_label ASC) AS rk
  FROM dists
)
SELECT vec_id, label, c_label AS assigned, dist FROM ranked WHERE rk = 1
""")
def q53_kmeans_assign(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    cent = sim.group_centroids_quantized(e, "label", "embedding")
    out = sim.assign_nearest_centroid(
        e.select("vec_id", "label", "embedding"), "vec_id", "embedding",
        cent.select("label", "dim", "centroid"), "label")
    return out.join(
        e.select("vec_id", "label"), "vec_id"
    ).select("vec_id", "label", "assigned", "dist")


# ---------------------------------------------------------------------------
# q62 — int8-quantized ANN: symmetric per-vector quantization
# (floor(x*127/max|x|), IEEE-exact) then INTEGER dot-product top-k.
# The memory/bandwidth scale path: the quantized corpus is 1/4 the
# bytes and the per-pair score is pure BIGINT arithmetic — both the
# ranking AND the scores hash-match the oracle exactly (no float fold
# to reassociate).
# ---------------------------------------------------------------------------

_QZ_SQL = """
sv AS (SELECT vec_id, embedding,
              list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
       FROM embeddings),
qz AS (SELECT vec_id,
              list_transform(embedding,
                x -> CASE WHEN mx > 0.0
                          THEN CAST(greatest(-127, floor(CAST(x AS DOUBLE) * 127.0 / mx)) AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END) AS qv
       FROM sv)
"""

@register("q62_quantized_ann", oracle=f"""
WITH {_QZ_SQL},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.qv, c.qv), p -> p[1] * p[2]),
                     (x, y) -> x + y) AS qdot
  FROM qz c CROSS JOIN (SELECT * FROM qz WHERE vec_id < 5) q
  WHERE c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, qdot, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY qdot DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 5
""")
def q62_quantized_ann(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return sim.quantized_topk(e, e.where(F.col("vec_id") < 5),
                              "vec_id", "embedding", k=5)


# ---------------------------------------------------------------------------
# q77 — SemDeDup semantic deduplication (Abbas et al. 2023; slot freed
# by the q1+q4 merge): similarity.semantic_dedup — nearest-centroid
# assignment (map-side broadcast fold, zero shuffle), within-cluster
# cosine pairs >= threshold (ONE corpus shuffle keyed by cluster, with
# the max_bucket degenerate-cluster guard mirrored in the oracle),
# connected components over the duplicate pairs, one keeper per group
# (the paper's keep-farthest-from-centroid policy; ties on smaller id).
# The oracle recomputes assignment via the q53 ranked-window CTE,
# cosine with the identical left-to-right list_reduce fold, components
# via a recursive closure, and the keeper window.  Threshold 0.30: the
# synthetic embeddings are near-orthogonal (within-label max cos
# ~0.47), so the paper's 0.95 would make the dedup path vacuous here;
# the semantics are threshold-independent.
# ---------------------------------------------------------------------------

_Q77_COS = """list_reduce(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))"""

@register("q77_semantic_dedup", oracle=f"""
WITH RECURSIVE cent AS ({_CENT_SQL}),
cvecs AS (
  SELECT label AS c_label, list(centroid ORDER BY dim) AS cvec
  FROM cent GROUP BY label
), dists AS (
  SELECT e.vec_id, e.embedding, c.c_label,
         list_reduce(
           list_transform(range(len(e.embedding)),
             i -> (CAST(e.embedding[i+1] AS DOUBLE) - c.cvec[i+1])
                * (CAST(e.embedding[i+1] AS DOUBLE) - c.cvec[i+1])),
           (a, b) -> a + b) AS dist
  FROM embeddings e CROSS JOIN cvecs c
), assigned AS (
  SELECT vec_id, embedding, c_label AS assigned, dist FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, c_label ASC) AS rk
    FROM dists) WHERE rk = 1
), sized AS (
  -- max_bucket mirror: clusters over the cap contribute no pairs
  SELECT * FROM assigned
  QUALIFY COUNT(*) OVER (PARTITION BY assigned) <= 10000
), prs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM sized a JOIN sized b
    ON a.assigned = b.assigned AND a.vec_id < b.vec_id
  WHERE {_Q77_COS} >= 0.30
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION SELECT doc_b, doc_a FROM prs
), walk(vid, reach) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.vid, e.dst FROM walk w JOIN edges e ON e.src = w.reach
), comp AS (SELECT vid, MIN(reach) AS grp FROM walk GROUP BY vid),
ann AS (
  SELECT a.vec_id, a.assigned, a.dist,
         COALESCE(c.grp, a.vec_id) AS sd_group
  FROM assigned a LEFT JOIN comp c ON c.vid = a.vec_id
)
SELECT vec_id, assigned, dist, sd_group,
       CAST(row_number() OVER (PARTITION BY sd_group
                               ORDER BY dist DESC, vec_id ASC) = 1
            AS BIGINT) AS keep
FROM ann
""")
def q77_semantic_dedup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    cent = sim.group_centroids_quantized(e, "label", "embedding")
    out = sim.semantic_dedup(e, "vec_id", "embedding", cent, "label",
                             threshold=0.30, max_bucket=10_000)
    return out.select("vec_id", "assigned", "dist", "sd_group",
                      F.col("keep").cast("bigint").alias("keep"))
