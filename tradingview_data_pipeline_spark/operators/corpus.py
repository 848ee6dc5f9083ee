"""Corpus-level text operators: chunking, TF-IDF, n-gram statistics,
and benchmark decontamination.

These are the document-preparation steps of a training-data pipeline
that sit between raw ingest and tokenization: split long documents into
model-window-sized chunks, surface the terms that characterize each
document, compute corpus-wide n-gram frequencies, and drop documents
that leak held-out benchmark content.

Scale notes (100 TB):
  * ``chunk_text`` is map-side only — ``sequence`` + ``posexplode`` per
    row; output row count is bounded by ceil(len/stride) per doc.
  * TF-IDF is two hash aggregations (term-per-doc, then doc-freq) and a
    broadcast-able doc-freq join — the canonical map-reduce shape, with
    map-side partial aggregation on both passes.
  * ``decontaminate`` joins 8-byte n-gram hashes, never strings, and
    aggregates benchmark n-grams to a distinct set first — the join is
    |corpus n-grams| x (benchmark hit rate), not all-pairs.
  * IDF uses the *linear* variant score = tf * (N / df): IEEE division
    and multiplication are correctly rounded and therefore bit-identical
    across engines, which makes the op oracle-checkable; log-idf (the
    classic form) is exposed too but transcendental functions round
    differently between libm implementations, so rankings from it are
    verified by pytest rather than the cross-engine hash gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import text as tx


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into ``size``-char chunks starting every
    ``size - overlap`` chars (the trailing chunk may be shorter).

    Emits (id, chunk_idx, chunk_start, chunk_text, chunk_len); 1-based
    ``chunk_start`` to match SQL ``substring`` addressing.  Empty text
    yields one empty chunk so no document silently disappears.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride))
    ex = df.select(
        F.col(id_col), F.col(text_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"))
    return ex.select(
        id_col, "chunk_idx", "chunk_start",
        F.substring(F.col(text_col), F.col("chunk_start"), size)
        .alias("chunk_text"),
    ).withColumn("chunk_len", F.length("chunk_text"))


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — whitespace terms per document (exploded +
    hash-aggregated; map-side combine keeps the shuffle at distinct
    (doc, term) pairs)."""
    return (
        df.select(F.col(id_col), F.explode(tx.tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    use_log_idf: bool = False,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf.

    Linear idf (default): score = tf * (N / df) — cross-engine exact.
    Log idf: score = tf * ln(N / df) — classic, pytest-verified only.
    Ties (equal score) break on term ascending so the cut is stable.
    """
    tf = term_frequencies(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    # no broadcast hint on dfreq: |vocab| is unbounded at corpus scale —
    # the tf⋈dfreq join shares the "term" shuffle tf's aggregation
    # already produced, and AQE still broadcasts when dfreq is small.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
    )
    ratio = F.col("n_docs").cast("double") / F.col("df").cast("double")
    idf = F.log(ratio) if use_log_idf else ratio
    scored = scored.withColumn("score", F.col("tf").cast("double") * idf)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "term_rank")
    )


def top_ngrams(
    df: DataFrame, text_col: str, *, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-``k`` word n-grams by count (ties: n-gram asc).

    Single explode + hash aggregate; the final top-k is a
    TakeOrderedAndProject (no full sort).  Documents with fewer than
    ``n`` words contribute nothing (their whole-text fallback shingle is
    excluded by requiring n words).
    """
    grams = df.select(
        F.explode(tx.word_shingles(F.col(text_col), n=n)).alias("ngram"))
    # word_shingles falls back to the whole text when < n words; drop
    # those rows: a real n-gram has exactly n-1 separating spaces.
    grams = grams.where(
        F.size(F.split(F.col("ngram"), " ")) == F.lit(n))
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("ngram").asc()).limit(k)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with a benchmark
    document (the standard train-set decontamination check).

    Returns (id, n_hits, n_benchmark_docs) for contaminated documents:
    distinct overlapping n-grams and how many distinct benchmark docs
    they came from.  Joins 60-bit n-gram hashes (8 bytes) — the corpus
    side shuffles one row per distinct (doc, n-gram); the benchmark side
    is typically small enough to broadcast.
    """
    def gram_hashes(d: DataFrame, alias: str) -> DataFrame:
        g = d.select(
            F.col(id_col).alias(alias),
            F.explode(tx.word_shingles(F.col(text_col), n=n)).alias("g"))
        g = g.where(F.size(F.split(F.col("g"), " ")) == F.lit(n))
        return g.select(alias, tx.md5_hash60(F.col("g")).alias("h")).distinct()

    cg = gram_hashes(corpus, "doc_id_c")
    bg = gram_hashes(benchmark, "doc_id_b")
    hits = cg.join(bg, "h")
    return (
        hits.groupBy(F.col("doc_id_c").alias(id_col))
        .agg(F.countDistinct("h").alias("n_hits"),
             F.countDistinct("doc_id_b").alias("n_benchmark_docs"))
    )


def contrastive_triplets(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str,
    *,
    k_negatives: int = 2,
    n_slots: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive training.

    Positives are the verified near-dup ``pairs`` (``doc_a``/``doc_b``,
    e.g. ``dedup.lsh_candidate_pairs`` after Jaccard verification —
    each unordered pair yields one triplet row per direction).
    Negatives are drawn deterministically WITHOUT an O(n) scan per
    anchor: every id is assigned to one of ``n_slots`` hash slots, each
    (anchor, j < k_negatives) probe hashes to a slot, and the candidate
    with the smallest (anchor, candidate) hash inside that slot wins —
    O(k) probes per anchor against slot-sized candidate lists, the
    bucketed-sampling shape that survives any corpus size. A probe can
    yield fewer than ``k_negatives`` rows for three reasons — an empty
    slot, two probes colliding on one slot, or the winner being an
    accidental positive (anti-joined out) — so the ``n_negatives``
    column carries the per-anchor count explicitly, INCLUDING 0: an
    anchor whose probes all come up empty still emits its positive
    rows with a NULL ``negative`` rather than vanishing.

    Deterministic end to end (salted md5 only) — re-running on a grown
    corpus keeps old triplets except where new docs win a slot.
    """
    from tradingview_data_pipeline_spark.operators.sampling import (
        hash60, hash_bucket)

    anchors = (pairs.select(F.col("doc_a").alias("anchor"),
                            F.col("doc_b").alias("positive"))
               .unionByName(pairs.select(
                   F.col("doc_b").alias("anchor"),
                   F.col("doc_a").alias("positive"))))
    cands = ids.select(
        F.col(id_col).alias("cand"),
        hash_bucket(F.col(id_col), n_slots, salt + "_slot").alias("slot"))
    probes = anchors.select("anchor").distinct().select(
        "anchor",
        F.explode(F.array(*[
            hash_bucket(F.concat(F.col("anchor").cast("string"),
                                 F.lit(f"|{j}")), n_slots, salt + "_probe")
            for j in range(k_negatives)])).alias("slot"))
    scored = (probes.join(cands, "slot")
              .where(F.col("cand") != F.col("anchor"))
              .withColumn("__h", hash60(
                  F.concat(F.col("anchor").cast("string"), F.lit("|"),
                           F.col("cand").cast("string")), salt)))
    w = Window.partitionBy("anchor", "slot").orderBy("__h", "cand")
    negs = (scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("anchor", F.col("cand").alias("negative")))
    # drop accidental positives: any (anchor, negative) that IS a pair
    sym = anchors.select("anchor", F.col("positive").alias("negative"))
    negs = negs.join(sym, ["anchor", "negative"], "left_anti").distinct()
    # LEFT joins: an anchor with zero surviving negatives still emits
    # its positives (NULL negative, n_negatives = 0) — loud, not lost
    out = anchors.join(negs, "anchor", "left")
    counts = negs.groupBy("anchor").agg(F.count(F.lit(1)).alias("n_negatives"))
    return (out.join(counts, "anchor", "left")
            .withColumn("n_negatives",
                        F.coalesce(F.col("n_negatives"), F.lit(0))))
