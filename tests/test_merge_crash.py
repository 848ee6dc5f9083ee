"""Crash-consistency of the bucket-pruned MERGE swap (merge.py
`_rewrite_touched_buckets` + `repair`).

The bucketed parquet layout trades Delta/Iceberg transactionality for
per-bucket directory renames; these tests pin the documented recovery
contract: after a crash at ANY point of the swap loop, the table still
reads with every key exactly once (possibly mixed pre/post-merge
versions across buckets), READS NEVER MUTATE THE DIRECTORY (repair is
a write-path op — a repairing reader could abort a healthy concurrent
swap), and re-running the interrupted op (or calling `repair()`)
converges to the same state as an uninterrupted run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from tradingview_data_pipeline_spark.operators.merge import ParquetTable

SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


def _rows(df):
    return {r["symbol"]: r["v"] for r in df.collect()}


def _make(spark, tmp_path, n=40):
    t = ParquetTable(spark, str(tmp_path / "tbl"), SCHEMA, "symbol", buckets=4)
    base = spark.createDataFrame(
        [(f"S{i:03d}", float(i)) for i in range(n)], SCHEMA)
    t.overwrite(base)
    src = spark.createDataFrame(
        [(f"S{i:03d}", 1000.0 + i) for i in range(0, n, 3)]
        + [("NEW1", -1.0), ("NEW2", -2.0)], SCHEMA)
    expected = {f"S{i:03d}": float(i) for i in range(n)}
    expected.update({f"S{i:03d}": 1000.0 + i for i in range(0, n, 3)})
    expected.update({"NEW1": -1.0, "NEW2": -2.0})
    return t, src, expected


def _crash_at_bucket_rename(monkeypatch, k: int):
    """Raise instead of performing the k-th rename that touches a
    __bucket= path (the swap loop's renames), pass everything else."""
    real = os.rename
    calls = {"n": 0}

    def crashing(src, dst):
        if "__bucket=" in str(src) or "__bucket=" in str(dst):
            calls["n"] += 1
            if calls["n"] == k:
                raise OSError("simulated crash in bucket swap")
        return real(src, dst)

    monkeypatch.setattr(os, "rename", crashing)


def test_crash_between_renames_restores_bucket(spark, tmp_path, monkeypatch):
    # crash on rename #2: bucket 1's live dir was moved to __old_ but the
    # new dir never landed — the worst window (bucket missing on disk)
    t, src, expected = _make(spark, tmp_path)
    before = _rows(t.read())
    _crash_at_bucket_rename(monkeypatch, 2)
    with pytest.raises(OSError, match="simulated crash"):
        t.merge_upsert(src)
    monkeypatch.undo()

    # the read resolves the orphaned __old_ dir (live dir missing) to the
    # bucket's pre-merge rows: full pre-merge state, every key once
    assert _rows(t.read()) == before
    # ...and the read did NOT mutate the directory — the stray dir stays
    assert any("__old_" in n for n in os.listdir(t.path))

    t.merge_upsert(src)                       # re-run repairs + converges
    assert _rows(t.read()) == expected
    assert not any("__old_" in n for n in os.listdir(t.path))


def test_crash_mid_loop_leaves_mixed_but_complete_table(spark, tmp_path,
                                                        monkeypatch):
    # crash on rename #3: bucket 1 fully swapped (new), bucket 2 untouched
    # (raise replaces its dst->old move) — a mixed-version table
    t, src, expected = _make(spark, tmp_path)
    before = _rows(t.read())
    _crash_at_bucket_rename(monkeypatch, 3)
    with pytest.raises(OSError, match="simulated crash"):
        t.merge_upsert(src)
    monkeypatch.undo()

    got = _rows(t.read())
    # every pre-existing key still present exactly once; each value is
    # either its pre-merge or post-merge version, never lost
    for k, v in got.items():
        assert v == before.get(k, expected[k]) or v == expected[k]
    assert set(before) <= set(got)

    t.merge_upsert(src)
    assert _rows(t.read()) == expected


def test_leftover_old_dir_is_dropped(spark, tmp_path, monkeypatch):
    # crash after the new dir is live but before the old copy is removed:
    # simulate by making rmtree a no-op during the merge
    import shutil as _shutil
    t, src, expected = _make(spark, tmp_path)
    monkeypatch.setattr(_shutil, "rmtree", lambda *a, **kw: None)
    t.merge_upsert(src)
    monkeypatch.undo()
    assert any("__old_" in n for n in os.listdir(t.path))  # crash artifact

    # the live dir wins: reads see exactly the merged state (no double
    # count from the stale copy) and leave the directory untouched
    assert _rows(t.read()) == expected
    assert any("__old_" in n for n in os.listdir(t.path))

    # explicit repair drops the superseded copies
    t.repair()
    assert not any("__old_" in n for n in os.listdir(t.path))
    assert _rows(t.read()) == expected
