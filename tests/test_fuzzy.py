"""Blocked-Levenshtein fuzzy matching (operators/fuzzy)."""

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators.fuzzy import (
    blocked_levenshtein_pairs, fuzzy_match_rollup,
)


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_pairs_within_block_exact_distance(spark):
    df = _names(spark, ["small bolt", "smal bolt", "hot bolt", "red bolt",
                        "red widget", "red widgets"])
    got = {(r["name_a"], r["name_b"]): r["distance"]
           for r in blocked_levenshtein_pairs(df, "name",
                                              max_distance=3).collect()}
    # within-block (last token) pairs only, name_a < name_b, exact distance
    assert got[("smal bolt", "small bolt")] == 1
    assert got[("hot bolt", "red bolt")] == 3
    # cross-block pair never compared (documented blocking recall tradeoff)
    assert ("red bolt", "red widget") not in got
    # 'red widget' / 'red widgets' fall in different blocks too
    assert ("red widget", "red widgets") not in got
    # beyond max_distance filtered: red bolt vs small bolt = 4
    assert ("red bolt", "small bolt") not in got


def test_duplicate_rows_collapse_to_vocabulary(spark):
    df = _names(spark, ["hot gear", "hot gear", "hot gear", "hod gear"])
    rows = blocked_levenshtein_pairs(df, "name", max_distance=2).collect()
    assert len(rows) == 1 and rows[0]["distance"] == 1


def test_max_block_drops_degenerate_block(spark):
    # 30 distinct names in block 'x' (template suffix) + one small block
    names = [f"v{i:02d} x" for i in range(30)] + ["a y", "b y"]
    df = _names(spark, names)
    rows = blocked_levenshtein_pairs(df, "name", max_distance=3,
                                     max_block=10).collect()
    assert {(r["name_a"], r["name_b"]) for r in rows} == {("a y", "b y")}


def test_custom_block_fn(spark):
    df = _names(spark, ["abc one", "abd two"])
    # default blocking (last token) separates them; first-letter joins them
    assert not blocked_levenshtein_pairs(df, "name", max_distance=4).collect()
    rows = blocked_levenshtein_pairs(
        df, "name", max_distance=4,
        block_fn=lambda c: F.substring(c, 1, 1)).collect()
    assert len(rows) == 1 and rows[0]["distance"] == 4


def test_rollup_counts_rows_not_vocabulary(spark):
    df = _names(spark, ["small bolt"] * 3 + ["smal bolt"] * 2)
    rows = fuzzy_match_rollup(df, "name", max_distance=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["name_a"], r["name_b"]) == ("smal bolt", "small bolt")
    assert (r["n_rows_a"], r["n_rows_b"]) == (2, 3)


def test_null_names_ignored(spark):
    df = spark.createDataFrame([("a z",), (None,), ("b z",)], "name string")
    rows = blocked_levenshtein_pairs(df, "name", max_distance=1).collect()
    assert {(r["name_a"], r["name_b"]) for r in rows} == {("a z", "b z")}
