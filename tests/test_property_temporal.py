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


def ref_sessionize(events, gap):
    """events: list of (row_id, key, t); returns {row_id: session_seq}
    — sort per key by (t, row_id), increment when the gap STRICTLY
    exceeds ``gap`` (exactly prev + gap continues)."""
    out = {}
    by_key = {}
    for rid, k, t in events:
        by_key.setdefault(k, []).append((t, rid))
    for k, rows in by_key.items():
        rows.sort()
        seq, prev = 0, None
        for t, rid in rows:
            if prev is None or t - prev > gap:
                seq += 1
            out[rid] = seq
            prev = t
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(key, st.integers(0, 1000)),
                min_size=1, max_size=30))
def test_sessionize_matches_reference(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    events = [(i, k, s) for i, (k, s) in enumerate(rows)]
    sdf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, k, s in events],
        "row_id long, k long, ts timestamp")
    got = {r["row_id"]: r["session_seq"] for r in
           aj.sessionize(sdf, "k", "ts", gap="60 seconds",
                         tiebreak="row_id").collect()}
    assert got == ref_sessionize(events, 60), rows


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.integers(-10**6, 10**6),
                          st.text(alphabet="abc XY0", max_size=8)),
                min_size=1, max_size=30),
       st.sampled_from(["", "split", "mix", "gk"]))
def test_hash60_matches_hashlib(spark, values, salt):
    """The repo-wide cross-engine hash, pinned by a THIRD independent
    implementation (Python hashlib): top 15 md5 hex chars of
    salt || CAST(v AS STRING), parsed base-16."""
    import hashlib

    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import sampling as sp

    sdf = spark.createDataFrame([(i, str(v)) for i, v in enumerate(values)],
                                "i long, v string")
    got = {r["i"]: r["h"] for r in sdf.select(
        "i", sp.hash60(F.col("v"), salt).alias("h")).collect()}
    for i, v in enumerate(values):
        exp = int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:15], 16)
        assert got[i] == exp, (v, salt)
