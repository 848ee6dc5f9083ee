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
