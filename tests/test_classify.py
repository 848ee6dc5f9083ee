"""Tests for the learned quality-filter family (operators/classify.py):
token naive-Bayes classifier and DSIR importance weights.

The oracle gate (q78) pins the quantized linear-ratio score
cross-engine; these tests pin the PRODUCTION log-odds variant against a
pure-Python reference, the separation behavior on a planted good/bad
corpus, the min_df / unseen-token / empty-doc edges, and the DSIR
log-weight math + log-space A-ES sampling equivalence.
"""

import math

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import classify as cl
from tradingview_data_pipeline_spark.operators import sampling as sp

GOOD = [
    (1, "the curated prose reads cleanly with varied vocabulary", True),
    (2, "a well formed paragraph carries real information", True),
    (3, "careful writing and clear structure mark quality text", True),
]
BAD = [
    (4, "click click buy buy cheap cheap pills pills", False),
    (5, "spam spam spam winner winner prize prize", False),
    (6, "buy cheap pills click winner spam now now", False),
]


def _nb_reference(train, score_docs, *, min_df=1, use_log=True):
    """Pure-Python NB: occurrence counts, Laplace smoothing, ln-ratio sum."""
    from collections import Counter
    pos, neg = Counter(), Counter()
    for _id, text, y in train:
        for t in text.split():
            (pos if y else neg)[t] += 1
    vocab = {t for t in set(pos) | set(neg)
             if pos[t] + neg[t] >= min_df}
    tp, tn = sum(pos[t] for t in vocab), sum(neg[t] for t in vocab)
    v = len(vocab)

    def ratio(t):
        np_ = pos[t] if t in vocab else 0
        nn_ = neg[t] if t in vocab else 0
        return ((np_ + 1) * (tn + v)) / ((nn_ + 1) * (tp + v))

    out = {}
    for _id, text, _y in score_docs:
        toks = text.split()
        if use_log:
            s = sum(math.log(ratio(t)) for t in toks)
        else:
            s = sum(math.floor(ratio(t) * 1e6) for t in toks)
        out[_id] = (len(toks), sum(1 for t in toks if t in vocab), s)
    return out


def test_nb_log_score_matches_python_reference(spark):
    docs = GOOD + BAD
    df = spark.createDataFrame(docs, "doc_id long, text string, y boolean")
    w = cl.token_class_weights(df, "text", "y", min_df=1)
    got = {r["doc_id"]: (r["n_tokens"], r["n_known"], r["score"])
           for r in cl.nb_score(df, "doc_id", "text", w, use_log=True).collect()}
    ref = _nb_reference(docs, docs, min_df=1, use_log=True)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][:2] == ref[k][:2]
        assert got[k][2] == pytest.approx(ref[k][2], rel=1e-12)
    # the model separates the planted classes
    assert min(got[i][2] for i in (1, 2, 3)) > max(got[i][2] for i in (4, 5, 6))


def test_nb_linear_score_matches_python_reference(spark):
    docs = GOOD + BAD
    df = spark.createDataFrame(docs, "doc_id long, text string, y boolean")
    w = cl.token_class_weights(df, "text", "y", min_df=2)
    got = {r["doc_id"]: (r["n_tokens"], r["n_known"], r["score"])
           for r in cl.nb_score(df, "doc_id", "text", w).collect()}
    ref = _nb_reference(docs, docs, min_df=2, use_log=False)
    assert got == ref  # exact integers end to end


def test_nb_min_df_prunes_and_unseen_fallback(spark):
    df = spark.createDataFrame(GOOD + BAD, "doc_id long, text string, y boolean")
    w1 = cl.token_class_weights(df, "text", "y", min_df=1)
    w3 = cl.token_class_weights(df, "text", "y", min_df=3)
    assert w3.count() < w1.count()
    # a doc of only-unseen tokens scores n_known=0 with the smoothing ratio
    probe = spark.createDataFrame([(9, "zzz qqq", True)],
                                  "doc_id long, text string, y boolean")
    r = cl.nb_score(probe, "doc_id", "text", w1).collect()[0]
    assert (r["n_tokens"], r["n_known"]) == (2, 0)
    tot = w1.agg(F.sum("n_pos"), F.sum("n_neg"), F.count(F.lit(1))).collect()[0]
    tp, tn, v = tot
    assert r["score"] == 2 * math.floor((tn + v) / (tp + v) * 1e6)


def test_nb_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(GOOD, "doc_id long, text string, y boolean")
    w = cl.token_class_weights(df, "text", "y")
    probe = spark.createDataFrame([(7, "", True), (8, "   ", True)],
                                  "doc_id long, text string, y boolean")
    got = {r["doc_id"]: r for r in
           cl.nb_score(probe, "doc_id", "text", w).collect()}
    for i in (7, 8):
        assert (got[i]["n_tokens"], got[i]["n_known"], got[i]["score"]) == (0, 0, 0)


# --- DSIR ------------------------------------------------------------------

def test_importance_weights_match_python_reference(spark):
    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(4)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(i, "noise words fill the pool") for i in range(4)]
        + [(9, "alpha beta gamma delta")],
        "doc_id long, text string")
    n, buckets, a = 2, 512, 1.0
    td = cl.hashed_ngram_dist(target, "text", n=n, buckets=buckets)
    rd = cl.hashed_ngram_dist(raw, "text", n=n, buckets=buckets)
    got = {r["doc_id"]: (r["n_grams"], r["log_weight"]) for r in
           cl.importance_weights(raw, "doc_id", "text", td, rd,
                                 n=n, buckets=buckets).collect()}
    # python reference over the SAME bucket ids (hash mapping taken from
    # Spark; the math re-derived independently)
    tcnt = {r["bucket"]: r["cnt"] for r in td.collect()}
    rcnt = {r["bucket"]: r["cnt"] for r in rd.collect()}
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    # derive each doc's gram buckets with the same Spark hash
    from tradingview_data_pipeline_spark.operators import text as tx
    gb = (raw.select("doc_id",
                     F.explode(tx.word_shingles(F.col("text"), n=n)).alias("g"))
          .where(F.size(F.split(F.col("g"), " ")) == n)
          .select("doc_id", F.pmod(F.hash("g"), F.lit(buckets)).alias("b"))
          .collect())
    per_doc = {}
    for r in gb:
        per_doc.setdefault(r["doc_id"], []).append(r["b"])
    B = buckets * a
    for did, bs in per_doc.items():
        ref = sum(math.log((tcnt.get(b, 0) + a) / (tt + B))
                  - math.log((rcnt.get(b, 0) + a) / (rt + B)) for b in bs)
        assert got[did][0] == len(bs)
        assert got[did][1] == pytest.approx(ref, rel=1e-12)
    # the target-looking doc outweighs the pool docs
    assert got[9][1] > max(got[i][1] for i in range(4))


def test_importance_weights_short_doc_contributes_nothing(spark):
    target = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    raw = spark.createDataFrame([(1, "a b c d"), (2, "single")],
                                "doc_id long, text string")
    td = cl.hashed_ngram_dist(target, "text", n=2, buckets=64)
    rd = cl.hashed_ngram_dist(raw, "text", n=2, buckets=64)
    got = {r["doc_id"]: r for r in
           cl.importance_weights(raw, "doc_id", "text", td, rd,
                                 n=2, buckets=64).collect()}
    assert (got[2]["n_grams"], got[2]["log_weight"]) == (0, 0.0)


def test_weighted_sample_log_space_matches_linear(spark):
    # moderate weights: exp() safe -> the two modes must pick the same set
    rows = [(i, float(i % 7) - 3.0) for i in range(1, 101)]  # ln w in [-3, 3]
    df = spark.createDataFrame(rows, "id long, lw double")
    lin = df.withColumn("w", F.exp("lw"))
    s_log = {r["id"] for r in
             sp.weighted_sample_k(df, "id", "lw", 10, log_weights=True).collect()}
    s_lin = {r["id"] for r in
             sp.weighted_sample_k(lin, "id", "w", 10).collect()}
    assert s_log == s_lin
    # extreme log weights that would overflow exp still sample fine
    big = spark.createDataFrame([(i, 800.0 + i) for i in range(1, 21)],
                                "id long, lw double")
    out = sp.weighted_sample_k(big, "id", "lw", 5, log_weights=True).collect()
    assert len(out) == 5
    # heavily-weighted ids dominate: the top log-weight row is near-certain
    assert 20 in {r["id"] for r in out}
