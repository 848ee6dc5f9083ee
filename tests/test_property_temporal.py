"""Property-based tests for the temporal join operators against
reference models: the as-of join must agree with a direct "latest right
row at-or-before, ties by tiebreak" scan, and chunking must agree with
Python slicing.  Random keys/timestamps generate the collision patterns
(duplicate timestamps, no-prior-match rows, cross-key interleavings)
fixtures can't enumerate."""

import pytest
from hypothesis import given, settings, strategies as st

from tradingview_data_pipeline_spark.operators import asof as aj
from tradingview_data_pipeline_spark.operators import corpus as cp

ts = st.integers(min_value=0, max_value=20)
key = st.integers(min_value=0, max_value=2)

left_rows = st.lists(st.tuples(key, ts), min_size=1, max_size=25)
right_rows = st.lists(st.tuples(key, ts, st.integers(0, 9),
                                st.integers(0, 99)),
                      min_size=0, max_size=25)


def ref_asof(left, right):
    out = []
    for i, (k, t) in enumerate(left):
        cands = [(rt, tb, v) for (rk, rt, tb, v) in right
                 if rk == k and rt <= t]
        if cands:
            rt, tb, v = max(cands)          # larger (time, tiebreak) wins
            out.append((i, v))
        else:
            out.append((i, None))
    return sorted(out)


@settings(max_examples=10, deadline=None)
@given(left_rows, right_rows)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "row_id long, k long, t long")
    rdf = spark.createDataFrame(
        right or [], "k long, t long, tb long, v long")
    got = sorted(
        (r["row_id"], r["v_asof"]) for r in
        aj.asof_join(ldf, rdf, "k", "t", "t", ["v"], "tb").collect())
    assert got == ref_asof(left, right), (left, right)


text_chars = st.text(alphabet="ab \n", min_size=0, max_size=40)


@settings(max_examples=10, deadline=None)
@given(st.lists(text_chars, min_size=1, max_size=20),
       st.integers(min_value=2, max_value=9),
       st.integers(min_value=0, max_value=5))
def test_chunk_text_matches_slicing(spark, texts, size, overlap):
    """Chunks are exactly Python ``text[start:start+size]`` at strides
    of ``size - overlap`` (1-based starts, empty text yields one empty
    chunk)."""
    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    docs = dict(enumerate(texts))
    sdf = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {}
    for r in cp.chunk_text(sdf, "doc_id", "text",
                           size=size, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_text"]))
    for i, t in docs.items():
        starts = list(range(0, max(len(t), 1), stride))
        exp = [(j, s + 1, t[s:s + size]) for j, s in enumerate(starts)]
        assert sorted(got[i]) == exp, (t, size, overlap, got[i])
