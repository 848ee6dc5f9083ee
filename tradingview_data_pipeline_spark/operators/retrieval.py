"""Rank fusion for hybrid retrieval — combining lexical (BM25) and
semantic (embedding-cosine) rankings into one result list.

A training-data pipeline retrieves with BOTH signals: lexical match
finds exact-term evidence (eval-set mining, decontamination probes),
embedding similarity finds paraphrases the term match misses (seed-doc
expansion, topic filtering). Reciprocal-rank fusion (Cormack, Clarke &
Buettcher, SIGIR 2009) is the standard way to combine them without
score calibration: each leg contributes ``1 / (K + rank)`` and docs are
re-ranked by the sum. Rank-based fusion is immune to the legs'
incomparable score scales (BM25 is unbounded, cosine is [-1, 1]).

Cross-engine determinism: contributions are computed in integer
arithmetic — ``scale DIV (K + rank)`` with ``scale = 10^12`` — so the
fused score is an exact BIGINT sum (associative, layout-independent,
and recomputable bit-for-bit by any SQL engine; the same quantization
recipe as the repo's BM25/cosine/SGD kernels). With K = 60 the
contribution gap between adjacent ranks stays >= ~65k scaled units for
ranks < 2000, far above the quantization floor of 1, so fused order is
the true RRF order for any practical leg depth.

Scale: every input leg is a top-k list (bounded per query group by
construction — the expensive part is PRODUCING the legs, which is the
scan-shaped BM25 pass and the broadcast-query ANN pass, both already
shuffle-free over the corpus). The fusion itself unions the bounded
lists, one hash aggregate on (group, id), and a per-group window over
at most ``len(legs) * k`` rows — never a corpus-sized shuffle.

No reference counterpart (the reference has no retrieval surface);
first-class per the training-data extension brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    legs: Sequence[tuple[str, DataFrame]],
    id_cols: Sequence[str],
    rank_col: str = "rk",
    *,
    rrf_k: int = 60,
    scale: int = 10**12,
    topk: int | None = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fuse named ranked lists into one RRF-ordered list.

    ``legs``: (name, frame) pairs; every frame carries ``group_cols``
    + ``id_cols`` + ``rank_col`` (1-based rank within its group).  An
    item absent from a leg simply contributes nothing for that leg
    (standard RRF).  Output: one row per (group, id) seen in any leg
    with a BIGINT ``<name>_rk`` per leg (NULL where absent), the exact
    integer fused score ``rrf_q``, and ``fused_rk`` (ties broken on
    ``id_cols`` ascending), optionally truncated to ``topk``.

    Plan shape: unionByName over the bounded legs -> one hash aggregate
    -> one bounded per-group window. When ``group_cols`` is empty the
    window is single-partition — safe only because the input is top-k
    bounded; multi-query callers MUST pass the query id as a group col.
    """
    if not legs:
        raise ValueError("rrf_fuse: need at least one leg")
    names = [n for n, _ in legs]
    if len(set(names)) != len(names):
        raise ValueError(f"rrf_fuse: duplicate leg names {names}")
    if rrf_k < 1 or scale <= 0:
        # rrf_k >= 1 keeps the divisor positive even for a malformed
        # rank of 0, so Spark's DIV can never hit /0 (NULL, silently
        # dropped from SUM) where DuckDB's // would raise — the ranks
        # themselves are additionally guarded below.
        raise ValueError("rrf_fuse: rrf_k must be >= 1 and scale > 0")
    gcols = list(group_cols)
    icols = list(id_cols)
    tagged = None
    for name, df in legs:
        # loud 1-based-rank guard: a rank < 1 OR NULL is a caller bug
        # and must fail identically in both engines, not skew the fused
        # score (assert_true treats a NULL condition as failure too —
        # a left-joined nullable rank column fails here by design, it
        # must not be silently dropped from the RRF sum)
        rank = F.col(rank_col).cast("bigint")
        part = df.select(
            *gcols, *icols,
            F.lit(name).alias("_leg"),
            F.when(rank >= 1, rank)
             .otherwise(F.assert_true(rank >= 1, F.lit(
                 f"rrf_fuse: leg '{name}' has a rank that is NULL or "
                 "< 1 — ranks must be 1-based and non-null")).cast("bigint"))
             .alias("_rank"))
        tagged = part if tagged is None else tagged.unionByName(part)
    contrib = F.expr(f"DIV({scale}, {rrf_k} + _rank)")
    aggs = [F.sum(contrib).cast("bigint").alias("rrf_q")]
    for name in names:
        aggs.append(
            F.min(F.when(F.col("_leg") == name, F.col("_rank")))
            .cast("bigint").alias(f"{name}_rk"))
    fused = tagged.groupBy(*gcols, *icols).agg(*aggs)
    w = Window.partitionBy(*gcols).orderBy(
        F.col("rrf_q").desc(), *[F.col(c).asc() for c in icols])
    out = fused.withColumn("fused_rk", F.row_number().over(w).cast("bigint"))
    if topk is not None:
        out = out.where(F.col("fused_rk") <= topk)
    return out.select(*gcols, *icols,
                      *[f"{n}_rk" for n in names], "rrf_q", "fused_rk")
