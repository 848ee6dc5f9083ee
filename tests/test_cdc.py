"""Snapshot-diff CDC (operators/cdc): op classification and the
round-trip law apply(old, diff(old, new)) == new."""

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators.cdc import (
    apply_changelog, snapshot_diff,
)

KEYS = ["k"]
COLS = ["a", "b"]
SCHEMA = "k long, a string, b long"


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_ops_classified(spark):
    old = _t(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _t(spark, [(1, "x", 10),            # unchanged -> dropped
                     (2, "y", 99),            # update
                     (4, "w", 40)])           # insert; 3 deleted
    got = {r["k"]: r for r in
           snapshot_diff(old, new, KEYS, COLS).collect()}
    assert set(got) == {2, 3, 4}
    assert got[2]["op"] == "update" and got[2]["b_old"] == 20 \
        and got[2]["b_new"] == 99
    assert got[3]["op"] == "delete" and got[3]["a_new"] is None
    assert got[4]["op"] == "insert" and got[4]["a_old"] is None


def test_null_safe_compare(spark):
    old = _t(spark, [(1, None, 10), (2, "y", None)])
    new = _t(spark, [(1, None, 10), (2, "y", 5)])
    rows = snapshot_diff(old, new, KEYS, COLS).collect()
    # NULL == NULL under eqNullSafe -> key 1 unchanged; NULL -> 5 is a change
    assert [r["k"] for r in rows] == [2]
    assert rows[0]["op"] == "update"


def test_roundtrip_reconstructs_new_snapshot(spark):
    old = _t(spark, [(i, f"v{i}", i * 10) for i in range(50)])
    new = _t(spark, [(i, ("CH" if i % 7 == 0 else f"v{i}"), i * 10)
                     for i in range(3, 55)])
    log = snapshot_diff(old, new, KEYS, COLS)
    rebuilt = apply_changelog(old, log, KEYS, COLS)
    sym_diff = rebuilt.exceptAll(new).unionAll(new.exceptAll(rebuilt))
    assert sym_diff.count() == 0
    # and the changelog is churn-sized, not table-sized:
    # deletes k=0..2 (3), inserts k=50..54 (5), updates k%7==0 in 3..49 (7)
    assert log.count() == 3 + 5 + 7


def test_changelog_size_exact(spark):
    old = _t(spark, [(i, f"v{i}", i) for i in range(10)])
    new = _t(spark, [(i, f"v{i}", i + (1 if i == 4 else 0))
                     for i in range(1, 11)])
    log = snapshot_diff(old, new, KEYS, COLS)
    ops = {r["op"] for r in log.collect()}
    assert ops == {"insert", "delete", "update"}
    assert log.count() == 3           # delete k=0, insert k=10, update k=4


def test_membership_diff_with_no_compare_cols(spark):
    """cols=[] is a key-set diff: inserts/deletes only, never update."""
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r["k"]: r["op"] for r in
           snapshot_diff(old, new, KEYS, []).collect()}
    assert got == {1: "delete", 3: "insert"}


def test_roundtrip_holds_for_null_keys(spark):
    """Regression (ADVICE r6): apply_changelog's anti-join must match
    keys with eqNullSafe like snapshot_diff does — a NULL-key row the
    changelog deletes or updates was previously never removed from
    base (stale row kept / update duplicated)."""
    old = _t(spark, [(None, "x", 10), (1, "y", 20), (2, "z", 30)])
    # NULL key updated, 2 deleted, 3 inserted
    new = _t(spark, [(None, "X", 99), (1, "y", 20), (3, "w", 40)])
    log = snapshot_diff(old, new, KEYS, COLS)
    got = {r["k"]: r["op"] for r in log.collect()}
    assert got == {None: "update", 2: "delete", 3: "insert"}
    rebuilt = apply_changelog(old, log, KEYS, COLS)
    sym_diff = rebuilt.exceptAll(new).unionAll(new.exceptAll(rebuilt))
    assert sym_diff.count() == 0
    # and specifically: exactly ONE NULL-key row, the new image
    null_rows = rebuilt.where(F.col("k").isNull()).collect()
    assert len(null_rows) == 1 and null_rows[0]["a"] == "X"


def test_roundtrip_null_key_delete(spark):
    old = _t(spark, [(None, "x", 10), (1, "y", 20)])
    new = _t(spark, [(1, "y", 20)])
    log = snapshot_diff(old, new, KEYS, COLS)
    rebuilt = apply_changelog(old, log, KEYS, COLS)
    assert rebuilt.where(F.col("k").isNull()).count() == 0
    assert rebuilt.count() == 1
