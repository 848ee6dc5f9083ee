"""Reciprocal-rank fusion (operators/retrieval.rrf_fuse): equality with
a pure-python RRF reference, absent-leg handling, grouped multi-query
fusion, and argument validation."""

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import retrieval as rt

SCALE, K = 10**12, 60


def _py_rrf(legs, topk=None):
    """legs: {name: {id: rank}}; returns [(id, {name: rk}, score, fused_rk)]."""
    ids = sorted({i for m in legs.values() for i in m})
    rows = []
    for i in ids:
        score = sum(SCALE // (K + m[i]) for m in legs.values() if i in m)
        rows.append((i, {n: m.get(i) for n, m in legs.items()}, score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    out = [(i, rks, s, j + 1) for j, (i, rks, s) in enumerate(rows)]
    return out[:topk] if topk else out


def test_rrf_matches_python_reference(spark):
    bm25 = {1: 1, 2: 2, 3: 3, 7: 4}
    ann = {2: 1, 5: 2, 1: 3}
    legs = [
        ("bm25", spark.createDataFrame(
            [(i, r) for i, r in bm25.items()], "id bigint, rk bigint")),
        ("ann", spark.createDataFrame(
            [(i, r) for i, r in ann.items()], "id bigint, rk bigint")),
    ]
    got = {r["id"]: r for r in
           rt.rrf_fuse(legs, ["id"], rrf_k=K, scale=SCALE).collect()}
    want = _py_rrf({"bm25": bm25, "ann": ann})
    assert len(got) == len(want)
    for i, rks, score, fused_rk in want:
        row = got[i]
        assert row["rrf_q"] == score
        assert row["fused_rk"] == fused_rk
        assert row["bm25_rk"] == rks["bm25"]
        assert row["ann_rk"] == rks["ann"]


def test_rrf_absent_leg_contributes_nothing(spark):
    # id 9 appears only in one leg: its score is that leg's term alone
    # and its missing rank column is NULL (standard RRF, no penalty).
    legs = [
        ("a", spark.createDataFrame([(9, 1)], "id bigint, rk bigint")),
        ("b", spark.createDataFrame([(4, 1)], "id bigint, rk bigint")),
    ]
    rows = {r["id"]: r for r in rt.rrf_fuse(legs, ["id"]).collect()}
    assert rows[9]["rrf_q"] == SCALE // (K + 1)
    assert rows[9]["b_rk"] is None and rows[9]["a_rk"] == 1
    # equal scores tie-break on id ascending
    assert rows[4]["fused_rk"] == 1 and rows[9]["fused_rk"] == 2


def test_rrf_grouped_multi_query_and_topk(spark):
    # two query groups fused independently; topk truncates per group
    a = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 2, 1), ("q2", 3, 2)],
        "qid string, id bigint, rk bigint")
    b = spark.createDataFrame(
        [("q1", 2, 1), ("q2", 3, 1)], "qid string, id bigint, rk bigint")
    out = rt.rrf_fuse([("a", a), ("b", b)], ["id"], group_cols=["qid"],
                      topk=1).collect()
    top = {r["qid"]: r["id"] for r in out}
    assert len(out) == 2
    # q1: id 2 has a-rank 2 + b-rank 1 > id 1's single rank-1 term
    assert top["q1"] == 2
    # q2: id 3 has a-rank 2 + b-rank 1
    assert top["q2"] == 3


def test_rrf_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id bigint, rk bigint")
    with pytest.raises(ValueError, match="at least one leg"):
        rt.rrf_fuse([], ["id"])
    with pytest.raises(ValueError, match="duplicate leg names"):
        rt.rrf_fuse([("x", df), ("x", df)], ["id"])
    with pytest.raises(ValueError, match="rrf_k"):
        rt.rrf_fuse([("x", df)], ["id"], rrf_k=-1)
    with pytest.raises(ValueError, match="rrf_k"):
        rt.rrf_fuse([("x", df)], ["id"], rrf_k=0)


def test_rrf_rejects_non_positive_ranks(spark):
    # ranks are 1-based by contract; a rank of 0 must fail LOUDLY (it
    # previously could turn into DIV-by-zero NULL silently dropped from
    # the sum, diverging from DuckDB's raising //)
    bad = spark.createDataFrame([(1, 0)], "id bigint, rk bigint")
    with pytest.raises(Exception, match="1-based"):
        rt.rrf_fuse([("x", bad)], ["id"]).collect()
    # NULL ranks (e.g. a left-joined nullable rank column) fail the same
    # guard — assert_true treats a NULL condition as failure — with an
    # error message that names the NULL case (round-11 advisor catch:
    # pre-guard they were silently dropped from the RRF sum)
    nullrk = spark.createDataFrame([(1, 3), (2, None)],
                                   "id bigint, rk bigint")
    with pytest.raises(Exception, match="NULL or"):
        rt.rrf_fuse([("x", nullrk)], ["id"]).collect()
