"""Deterministic Bloom filter (operators/bloom.py) — bit-level python
reference equality, the no-false-negative law, and the decontaminate
prefilter's exactness; q48's 'bloom' leg verifies the same construction
against DuckDB over the whole corpus."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import bloom as bl
from tradingview_data_pipeline_spark.operators import corpus as cp


def _ref_pair(s: str) -> tuple[int, int]:
    d = hashlib.md5(s.encode()).hexdigest()
    return int(d[:15], 16), int(d[15:30], 16)


def _ref_bloom(items, n_bits, k):
    arr = [0] * (n_bits // 63)
    for s in items:
        h1, h2 = _ref_pair(s)
        for i in range(k):
            p = (h1 + i * h2) % n_bits
            arr[p // 63] |= 1 << (p % 63)
    return arr


def _ref_contains(arr, n_bits, k, s):
    h1, h2 = _ref_pair(s)
    return all(arr[((h1 + i * h2) % n_bits) // 63]
               & (1 << ((h1 + i * h2) % n_bits) % 63) for i in range(k))


def test_build_bloom_matches_python_reference(spark):
    items = [f"gram number {i} of the benchmark" for i in range(200)]
    df = spark.createDataFrame([(s,) for s in items], "g string")
    n_bits, k = 63 * 64, 3
    got = bl.build_bloom(df, *bl.hash_pair(F.col("g")), n_bits=n_bits, k=k)
    assert got == _ref_bloom(items, n_bits, k)   # bit-for-bit


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = [f"member {i}" for i in range(500)]
    df = spark.createDataFrame([(s,) for s in members], "g string")
    n_bits, k = bl.bloom_parameters(len(members), fp_rate=0.01)
    arr = bl.build_bloom(df, *bl.hash_pair(F.col("g")), n_bits=n_bits, k=k)
    probes = members + [f"absent {i}" for i in range(2000)]
    pdf = spark.createDataFrame([(s,) for s in probes], "g string")
    got = {r["g"]: r["m"] for r in pdf.select(
        "g", bl.bloom_contains(*bl.hash_pair(F.col("g")), arr,
                               n_bits=n_bits, k=k).alias("m")).collect()}
    assert all(got[s] for s in members)              # NO false negatives
    fp = sum(1 for s in probes if s.startswith("absent") and got[s])
    assert fp / 2000 < 0.05                          # engineered ~1%
    # spark probe agrees with the python reference on every probe
    for s in probes[:50] + probes[-50:]:
        assert got[s] == _ref_contains(arr, n_bits, k, s), s


def test_bloom_parameters_sizing():
    m, k = bl.bloom_parameters(1000, 0.01)
    assert m % 63 == 0 and m >= 9000 and 5 <= k <= 9
    with pytest.raises(ValueError):
        bl.bloom_parameters(0)
    with pytest.raises(ValueError):
        bl.bloom_parameters(10, 1.5)
    # fp formula sanity: (1 - e^{-kn/m})^k near the asked rate
    rate = (1 - math.exp(-k * 1000 / m)) ** k
    assert rate < 0.02


def test_decontaminate_bloom_prefilter_is_exact(spark):
    docs = [(i, f"shared contamination phrase alpha beta gamma delta {i % 3} "
                f"plus unique filler {i} " + " ".join(
                    f"w{i}x{j}" for j in range(8)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.where(F.col("doc_id") % 10 == 0)
    rest = df.where(F.col("doc_id") % 10 != 0)
    base = {(r["doc_id"], r["n_hits"], r["n_benchmark_docs"]) for r in
            cp.decontaminate(rest, bench, "doc_id", "text", n=5).collect()}
    with_bloom = {(r["doc_id"], r["n_hits"], r["n_benchmark_docs"]) for r in
                  cp.decontaminate(rest, bench, "doc_id", "text", n=5,
                                   bloom=(63 * 32, 4)).collect()}
    assert base == with_bloom and base          # identical, non-empty


def test_decontaminate_precomputed_hashes_path_is_exact(spark):
    """corpus_hashes=(id, h) fast path (the q48 shared-pin pattern)
    produces the identical result; bloom+corpus_hashes is rejected."""
    import pytest

    from tradingview_data_pipeline_spark.operators import text as tx

    docs = [(i, f"shared contamination phrase alpha beta gamma delta {i % 3} "
                f"plus unique filler {i} " + " ".join(
                    f"w{i}x{j}" for j in range(8)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.where(F.col("doc_id") % 10 == 0)
    rest = df.where(F.col("doc_id") % 10 != 0)
    pre = (rest.select(
        "doc_id",
        F.explode(tx.word_shingles(F.col("text"), n=5)).alias("g"))
        .where(F.size(F.split(F.col("g"), " ")) == 5)
        .select("doc_id", tx.md5_hash60(F.col("g")).alias("h"))
        .distinct())
    base = {(r["doc_id"], r["n_hits"], r["n_benchmark_docs"]) for r in
            cp.decontaminate(rest, bench, "doc_id", "text", n=5).collect()}
    fast = {(r["doc_id"], r["n_hits"], r["n_benchmark_docs"]) for r in
            cp.decontaminate(rest, bench, "doc_id", "text", n=5,
                             corpus_hashes=pre).collect()}
    assert base == fast and base
    with pytest.raises(ValueError, match="mutually exclusive"):
        cp.decontaminate(rest, bench, "doc_id", "text", n=5,
                         bloom=(63 * 32, 4), corpus_hashes=pre)
