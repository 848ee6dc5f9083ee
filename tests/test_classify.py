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


# --- hashed-feature logistic regression -------------------------------------

def _logreg_reference(docs, *, n_buckets, iters, lr, l2=0.0):
    """Pure-Python mirror of logreg_train's exactness contract: md5-60
    bucketing, ascending-bucket float64 margin fold, 1e-9-grid int64
    gradient quantization, identical driver update order."""
    import hashlib

    import numpy as np

    grid = 1e9

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_buckets

    def sigmoid(m):
        if m >= 0:
            return 1.0 / (1.0 + math.exp(-m))
        z = math.exp(m)
        return z / (1.0 + z)

    feats = []
    for _id, text, y in docs:
        cnt = {}
        toks = text.split()
        for t in toks:
            b = bucket(t)
            cnt[b] = cnt.get(b, 0) + 1
        feats.append((1 if y else 0, sorted(cnt.items()), len(toks)))
    w = np.zeros(n_buckets, dtype=np.float64)
    bias, hist = 0.0, []
    for _ in range(iters):
        acc, gb, lq = {}, 0, 0
        for y, pairs, n in feats:
            m = bias
            for b, c in pairs:
                m += w[b] * (c / n)
            e = sigmoid(m) - y
            for b, c in pairs:
                acc[b] = acc.get(b, 0) + math.floor(e * (c / n) * grid)
            gb += math.floor(e * grid)
            loss = max(m, 0.0) - m * y + math.log1p(math.exp(-abs(m)))
            lq += math.floor(loss * grid)
        nd = len(feats)
        hist.append(lq / grid / nd)
        decay = 1.0 - lr * l2
        if l2:
            w *= decay
        for b, g in acc.items():
            w[b] -= lr * ((g / grid) / nd)
        bias = bias * (decay if l2 else 1.0) - lr * ((gb / grid) / nd)
    return w, bias, hist


def test_logreg_train_bit_equal_to_python_reference(spark):
    import numpy as np

    docs = GOOD + BAD + [(7, "", True)]  # empty doc trains the bias only
    df = spark.createDataFrame(docs, "doc_id long, text string, y boolean")
    kw = dict(n_buckets=4096, iters=5, lr=0.5, l2=0.1)
    model = cl.logreg_train(df, "text", "y", **kw)
    ref_w, ref_b, ref_h = _logreg_reference(docs, **kw)
    assert np.array_equal(model.dense, ref_w)
    assert model.bias == ref_b
    assert model.history == ref_h
    # the nonzero weight table IS the dense vector's support
    got = {r["bucket"]: r["weight"] for r in model.weights.collect()}
    assert got == {int(b): float(ref_w[b]) for b in np.flatnonzero(ref_w)}


def test_logreg_train_layout_independent(spark):
    import numpy as np

    docs = GOOD + BAD
    df = spark.createDataFrame(docs, "doc_id long, text string, y boolean")
    kw = dict(n_buckets=4096, iters=4, lr=0.5)
    m1 = cl.logreg_train(df, "text", "y", **kw)
    m2 = cl.logreg_train(df.repartition(7), "text", "y", **kw)
    assert np.array_equal(m1.dense, m2.dense)
    assert m1.bias == m2.bias
    assert m1.history == m2.history


def test_logreg_separates_and_score_matches_driver_math(spark):
    docs = GOOD + BAD
    df = spark.createDataFrame(docs, "doc_id long, text string, y boolean")
    model = cl.logreg_train(df, "text", "y", n_buckets=4096, iters=30, lr=1.0)
    # training loss decreases on the separable planted corpus
    assert model.history[-1] < model.history[0]
    got = {r["doc_id"]: r for r in
           cl.logreg_score(df, "doc_id", "text", model).collect()}
    assert min(got[i]["margin"] for i in (1, 2, 3)) > \
        max(got[i]["margin"] for i in (4, 5, 6))
    # the DataFrame-side margin equals the driver-side dot product
    import hashlib
    for _id, text, _y in docs:
        toks = text.split()
        s = sum(model.dense[int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                            % model.n_buckets] for t in toks)
        want = s / len(toks) + model.bias
        assert got[_id]["margin"] == pytest.approx(want, abs=1e-12)
        assert got[_id]["prob"] == pytest.approx(
            1.0 / (1.0 + math.exp(-want)), abs=1e-12)


def test_logreg_score_empty_doc_is_bias_only(spark):
    df = spark.createDataFrame(GOOD + BAD, "doc_id long, text string, y boolean")
    model = cl.logreg_train(df, "text", "y", n_buckets=1024, iters=3)
    probe = spark.createDataFrame([(9, ""), (10, "   ")],
                                  "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           cl.logreg_score(probe, "doc_id", "text", model).collect()}
    for i in (9, 10):
        assert got[i]["n_tokens"] == 0
        assert got[i]["margin"] == model.bias


def test_logreg_train_empty_input_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string, y boolean")
    with pytest.raises(ValueError, match="empty training set"):
        cl.logreg_train(df, "text", "y", n_buckets=64, iters=1)


def test_logreg_artifact_round_trip(spark, tmp_path):
    """save_logreg/load_logreg: one parquet, sentinel rows for
    bias/n_buckets; the reloaded model scores identically."""
    df = spark.createDataFrame(GOOD + BAD, "doc_id long, text string, y boolean")
    model = cl.logreg_train(df, "text", "y", n_buckets=2048, iters=4)
    path = str(tmp_path / "lr")
    cl.save_logreg(model, path)
    back = cl.load_logreg(spark, path)
    assert back.bias == model.bias
    assert back.n_buckets == model.n_buckets
    w0 = {r["bucket"]: r["weight"] for r in model.weights.collect()}
    w1 = {r["bucket"]: r["weight"] for r in back.weights.collect()}
    assert w0 == w1
    s0 = {r["doc_id"]: r["margin"] for r in
          cl.logreg_score(df, "doc_id", "text", model).collect()}
    s1 = {r["doc_id"]: r["margin"] for r in
          cl.logreg_score(df, "doc_id", "text", back).collect()}
    assert s0 == s1
    # non-artifact parquet fails loudly
    df.write.mode("overwrite").parquet(str(tmp_path / "junk"))
    with pytest.raises(Exception):
        cl.load_logreg(spark, str(tmp_path / "junk"))
