"""Model-based quality filtering — the learned half of the corpus
quality gate (the heuristic half is ``text.quality_score`` /
``corpus.with_repetition_signals``).

Two public families:

* **Token naive-Bayes classifier** (``token_class_weights`` +
  ``nb_score``): the CCNet / GPT-3-reproduction "quality classifier"
  pattern — train a linear model over tokens from a labeled reference
  set (good = curated corpus, bad = raw crawl), score every document,
  keep the high-scoring tail.  Training is ONE corpus pass (explode →
  token hash-aggregate with full map-side combine — no iteration, no
  driver round-trips); the model is a (token, counts) table pruned by
  ``min_df`` so it stays broadcastable; scoring is explode → broadcast
  join → per-doc BIGINT sum, so the corpus shuffles only 8-byte partial
  sums keyed by doc id.

* **DSIR importance weights** (``hashed_ngram_dist`` +
  ``importance_weights``): Xie et al. 2023 ("Data Selection for
  Language Models via Importance Resampling") — hashed n-gram
  bag-of-words likelihood ratio between a target distribution and the
  raw pool, then sample-without-replacement proportional to the
  importance weight (``sampling.weighted_sample_k(log_weights=True)``
  keeps everything in log space).  The two distribution tables are
  ``buckets``-bounded regardless of corpus size, so both sides
  broadcast.

Cross-engine exactness contract (the q49 linear-idf / q53 grid
pattern): the oracle-checked score is the QUANTIZED LINEAR-RATIO sum —
per token, ratio = ((n_pos+1)·(tot_neg+V)) / ((n_neg+1)·(tot_pos+V))
evaluated as exact-integer→double casts, one multiply per side, one
divide, one multiply by 1e6, floor → BIGINT; the per-doc sum is then
associative.  Every step is identical correctly-rounded IEEE in Spark
and DuckDB, so the driver hash pins it bit-for-bit (q78).  The
production log-odds score (``use_log=True``) sums ln(ratio) instead —
``ln`` is not correctly rounded, so that variant is pytest-pinned
against a pure-Python reference, the repo-wide criterion for oracle vs
pytest verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import text as tx

GRID = 1_000_000.0  # the repo-wide 1e-6 quantization grid


def token_class_weights(df: DataFrame, text_col: str, label_col: str, *,
                        min_df: int = 1) -> DataFrame:
    """Train the token NB model: (token, n_pos, n_neg) occurrence counts.

    ``label_col`` is truthy for the positive ("high quality") class.
    ``min_df`` drops tokens with fewer than that many total occurrences
    — the long tail carries little evidence and the pruned table must
    broadcast at scoring time (vocabulary, not corpus, bounds its
    size).  One explode + one hash aggregate; counts are exact
    integers, so training is layout-independent by construction.
    """
    y = F.when(F.col(label_col).cast("boolean"), F.lit(1)).otherwise(F.lit(0))
    tok = df.select(y.alias("__y"),
                    F.explode(tx.tokens(F.col(text_col))).alias("token"))
    cnt = (tok.groupBy("token")
           .agg(F.sum("__y").alias("n_pos"),
                F.sum(F.lit(1) - F.col("__y")).alias("n_neg")))
    if min_df > 1:
        cnt = cnt.where(F.col("n_pos") + F.col("n_neg") >= min_df)
    return cnt


def _ratio(n_pos, n_neg, tot_pos, tot_neg, v):
    """Laplace-smoothed likelihood ratio P(tok|pos)/P(tok|neg), evaluated
    in the exactness-contract order: integer→double casts (exact for
    counts < 2^53), one multiply per side, one divide — all correctly
    rounded identically in Spark and DuckDB.  (Beyond 2^53 total tokens
    the ratio is no longer mathematically exact but STAYS bit-identical
    across engines: same inputs, same correctly-rounded ops.)"""
    num = (n_pos + F.lit(1)).cast("double") * (tot_neg + v).cast("double")
    den = (n_neg + F.lit(1)).cast("double") * (tot_pos + v).cast("double")
    return num / den


def nb_score(df: DataFrame, id_col: str, text_col: str,
             weights: DataFrame, *, use_log: bool = False) -> DataFrame:
    """Score documents with a trained ``token_class_weights`` model.

    Returns (id, n_tokens, n_known, score): ``score`` is the quantized
    linear-ratio BIGINT sum by default (oracle-exact; see module
    docstring), or the double log-odds sum with ``use_log=True`` (the
    production form — monotone-comparable scores for thresholding).
    Unseen tokens contribute the smoothing-only ratio ((0+1) counts);
    empty documents score 0 with n_tokens = 0.

    Plan shape: the (small) weight table broadcasts with its totals
    row folded in as literals-by-crossjoin; the corpus explodes
    map-side and shuffles only (doc, partial-sum) rows into the final
    hash aggregate — no corpus-sized key materializes.
    """
    tot = weights.agg(F.sum("n_pos").alias("__tp"),
                      F.sum("n_neg").alias("__tn"),
                      F.count(F.lit(1)).alias("__v"))
    w = (weights.crossJoin(F.broadcast(tot))
         .select("token",
                 _w_col(F.col("n_pos"), F.col("n_neg"),
                        F.col("__tp"), F.col("__tn"), F.col("__v"),
                        use_log).alias("__w")))
    unk = tot.select(
        _w_col(F.lit(0), F.lit(0), F.col("__tp"), F.col("__tn"),
               F.col("__v"), use_log).alias("__unk"))
    tok = df.select(F.col(id_col),
                    F.explode_outer(tx.tokens(F.col(text_col))).alias("token"))
    zero = F.lit(0.0) if use_log else F.lit(0).cast("long")
    contrib = F.when(F.col("token").isNull(), zero) \
               .otherwise(F.coalesce(F.col("__w"), F.col("__unk")))
    return (
        tok.join(F.broadcast(w), "token", "left")
        .crossJoin(F.broadcast(unk))
        .groupBy(id_col)
        .agg(F.count(F.col("token")).alias("n_tokens"),
             F.count(F.col("__w")).alias("n_known"),
             F.coalesce(F.sum(contrib), zero).alias("score"))
    )


def _w_col(n_pos, n_neg, tp, tn, v, use_log):
    r = _ratio(n_pos, n_neg, tp, tn, v)
    if use_log:
        return F.log(r)
    return F.floor(r * F.lit(GRID)).cast("long")


# ---------------------------------------------------------------------------
# DSIR — importance resampling toward a target distribution.
# ---------------------------------------------------------------------------

def hashed_ngram_dist(df: DataFrame, text_col: str, *, n: int = 2,
                      buckets: int = 8192) -> DataFrame:
    """Hashed word-n-gram distribution of a corpus: (bucket, cnt).

    The DSIR feature space: n-grams hash into a fixed number of
    buckets, so the distribution table is O(buckets) however large the
    corpus — one explode + one hash aggregate.  Uses Spark's native
    hash (not the cross-engine md5-60): DSIR is pytest-verified, and
    the raw feature hash never needs to match another engine.
    Documents with fewer than ``n`` words contribute nothing (mirrors
    ``top_ngrams``); for n = 1 every token counts.
    """
    grams = df.select(
        F.explode(tx.word_shingles(F.col(text_col), n=n)).alias("g"))
    if n > 1:
        grams = grams.where(F.size(F.split(F.col("g"), " ")) == F.lit(n))
    return (grams
            .select(F.pmod(F.hash(F.col("g")), F.lit(buckets)).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def importance_weights(df: DataFrame, id_col: str, text_col: str,
                       target_dist: DataFrame, raw_dist: DataFrame, *,
                       n: int = 2, buckets: int = 8192,
                       smoothing: float = 1.0) -> DataFrame:
    """Per-document DSIR importance weight in LOG space:
    log w(x) = Σ_grams [ log p_target(bucket) − log p_raw(bucket) ]
    with add-``smoothing`` estimates over ``buckets`` hashed n-gram
    features.  ``target_dist`` / ``raw_dist`` come from
    ``hashed_ngram_dist`` with the SAME (n, buckets).

    Feed the result to ``sampling.weighted_sample_k(...,
    log_weights=True)`` to draw the resampled corpus without ever
    exponentiating (A-ES ordering is exp-free in log space).  Both
    distribution tables are bucket-bounded → broadcast; the corpus
    shuffles only per-doc partial sums.
    """
    t_tot = target_dist.agg(F.sum("cnt").alias("__tt"))
    r_tot = raw_dist.agg(F.sum("cnt").alias("__rt"))
    b = F.lit(float(buckets)) * F.lit(smoothing)
    lw = (target_dist.withColumnRenamed("cnt", "__tc")
          .join(raw_dist.withColumnRenamed("cnt", "__rc"), "bucket", "full")
          .crossJoin(F.broadcast(t_tot)).crossJoin(F.broadcast(r_tot))
          .select("bucket",
                  (F.log((F.coalesce("__tc", F.lit(0)) + F.lit(smoothing))
                         / (F.col("__tt") + b))
                   - F.log((F.coalesce("__rc", F.lit(0)) + F.lit(smoothing))
                           / (F.col("__rt") + b))).alias("__lw")))
    # unseen-bucket weight (both counts zero) for grams hashing to a
    # bucket absent from BOTH tables
    unk = (t_tot.crossJoin(r_tot)
           .select((F.log(F.lit(smoothing) / (F.col("__tt") + b))
                    - F.log(F.lit(smoothing) / (F.col("__rt") + b)))
                   .alias("__unk")))
    grams = df.select(
        F.col(id_col),
        F.explode_outer(tx.word_shingles(F.col(text_col), n=n)).alias("g"))
    if n > 1:
        grams = grams.withColumn(
            "g", F.when(F.size(F.split(F.col("g"), " ")) == F.lit(n),
                        F.col("g")))
    grams = grams.withColumn(
        "bucket", F.pmod(F.hash(F.col("g")), F.lit(buckets)))
    contrib = F.when(F.col("g").isNull(), F.lit(0.0)) \
               .otherwise(F.coalesce(F.col("__lw"), F.col("__unk")))
    return (
        grams.join(F.broadcast(lw), "bucket", "left")
        .crossJoin(F.broadcast(unk))
        .groupBy(id_col)
        .agg(F.count(F.col("g")).alias("n_grams"),
             F.coalesce(F.sum(contrib), F.lit(0.0)).alias("log_weight"))
    )
