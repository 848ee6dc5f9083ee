"""Manifest-history time travel on the bucketed ParquetTable:
retention-window GC, read(version=), versions(), vacuum()."""

import os

import pytest
from pyspark.sql import types as T

from tradingview_data_pipeline_spark.operators.merge import ParquetTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _tbl(spark, path, retain=3):
    return ParquetTable(spark, str(path), SCHEMA, "k", buckets=4,
                        retain_versions=retain)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, SCHEMA)


def _snap(tbl, version=None):
    return {(r["k"], r["v"]) for r in tbl.read(version=version).collect()}


def test_read_earlier_versions_within_retention(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t", retain=3)
    t.merge_upsert(_rows(spark, [(1, "a"), (2, "b")]))      # v2 (v1 = seed)
    t.merge_upsert(_rows(spark, [(2, "B"), (3, "c")]))      # v3
    t.merge_upsert(_rows(spark, [(1, "A2")]))               # v4
    vs = t.versions()
    assert vs[-1] == int(t.status()["version"])
    assert len(vs) >= 3
    assert _snap(t, vs[-1]) == _snap(t) == {(1, "A2"), (2, "B"), (3, "c")}
    assert _snap(t, vs[-2]) == {(1, "a"), (2, "B"), (3, "c")}
    assert _snap(t, vs[-3]) == {(1, "a"), (2, "b")}


def test_gc_rolls_the_retention_window(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t", retain=2)
    for i in range(6):
        t.merge_upsert(_rows(spark, [(1, f"v{i}")]))
    vs = t.versions()
    live = int(t.status()["version"])
    # only the last two versions remain fully readable
    assert vs == [live - 1, live]
    assert _snap(t, live - 1) == {(1, "v4")}
    with pytest.raises(ValueError):
        t.read(version=live - 3)


def test_default_retain_one_keeps_old_behavior(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), SCHEMA, "k", buckets=4)
    t.merge_upsert(_rows(spark, [(1, "a")]))
    t.merge_upsert(_rows(spark, [(1, "b")]))
    t.merge_upsert(_rows(spark, [(1, "c")]))
    assert t.versions() == [int(t.status()["version"])]
    with pytest.raises(ValueError):
        t.read(version=2)


def test_vacuum_trims_history_and_dirs(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t", retain=3)
    for i in range(4):
        t.merge_upsert(_rows(spark, [(1, f"v{i}")]))
    assert len(t.versions()) == 3
    n_dirs_before = sum(1 for n in os.listdir(t.path)
                        if os.path.isdir(os.path.join(t.path, n)))
    t.vacuum(keep=1)
    assert t.versions() == [int(t.status()["version"])]
    n_dirs_after = sum(1 for n in os.listdir(t.path)
                       if os.path.isdir(os.path.join(t.path, n)))
    assert n_dirs_after < n_dirs_before
    assert _snap(t) == {(1, "v3")}            # live snapshot untouched


def test_raising_retention_later_starts_protecting(spark, tmp_path):
    # history manifests are written regardless of the knob, so a handle
    # reopened with a bigger window protects from the next commit on
    t1 = _tbl(spark, tmp_path / "t", retain=1)
    t1.merge_upsert(_rows(spark, [(1, "a")]))
    t2 = _tbl(spark, tmp_path / "t", retain=2)
    t2.merge_upsert(_rows(spark, [(1, "b")]))
    vs = t2.versions()
    assert len(vs) == 2
    assert _snap(t2, vs[0]) == {(1, "a")}


def test_unbucketed_table_rejects_time_travel(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"), SCHEMA, "k")
    t.merge_upsert(_rows(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="bucketed"):
        t.read(version=1)


def test_default_handle_cannot_gc_configured_retention(spark, tmp_path):
    """Retention is a TABLE property persisted in the manifest: a
    default handle (cron job, CLI) committing to a table configured
    with retain_versions=3 must keep the stored window, not GC it."""
    cfg = _tbl(spark, tmp_path / "t", retain=3)
    cfg.merge_upsert(_rows(spark, [(1, "a")]))
    cfg.merge_upsert(_rows(spark, [(1, "b")]))
    # a handle with NO retention opinion (e.g. jobs.warehouse_tables)
    dflt = ParquetTable(spark, str(tmp_path / "t"), SCHEMA, "k", buckets=4)
    dflt.merge_upsert(_rows(spark, [(1, "c")]))
    vs = dflt.versions()
    assert len(vs) == 3
    assert _snap(dflt, vs[0]) == {(1, "a")}
    assert _snap(dflt, vs[1]) == {(1, "b")}
    assert int(dflt.status()["version"]) == vs[-1]


def test_history_metadata_bounded_by_window(spark, tmp_path):
    """Commits prune history manifests older than the stored window, so
    metadata stays O(retain), not O(commits)."""
    t = _tbl(spark, tmp_path / "t", retain=2)
    for i in range(7):
        t.merge_upsert(_rows(spark, [(1, f"v{i}")]))
    hist = [n for n in os.listdir(t.path) if n.startswith("_manifest_v")]
    assert len(hist) <= 2


def test_rollback_restores_snapshot_append_only(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t", retain=4)
    t.merge_upsert(_rows(spark, [(1, "good")]))             # v1 (seed)
    t.merge_upsert(_rows(spark, [(1, "bad"), (2, "junk")]))  # v2
    vs = t.versions()
    t.rollback(vs[0])
    assert _snap(t) == {(1, "good")}
    # append-only: the rollback is a NEW version; the bad one remains
    # readable inside the window
    assert int(t.status()["version"]) == vs[-1] + 1
    assert _snap(t, vs[-1]) == {(1, "bad"), (2, "junk")}
    # a subsequent merge continues normally from the restored state
    t.merge_upsert(_rows(spark, [(3, "new")]))
    assert _snap(t) == {(1, "good"), (3, "new")}


def test_rollback_outside_window_raises(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t", retain=2)
    for i in range(5):
        t.merge_upsert(_rows(spark, [(1, f"v{i}")]))
    gone = t.versions()[0] - 1
    with pytest.raises(ValueError):
        t.rollback(gone)


def test_table_changes_between_versions(spark, tmp_path):
    from tradingview_data_pipeline_spark.operators.cdc import table_changes

    t = _tbl(spark, tmp_path / "t", retain=4)
    t.merge_upsert(_rows(spark, [(1, "a"), (2, "b")]))
    t.merge_upsert(_rows(spark, [(2, "B"), (3, "c")]))       # update + insert
    vs = t.versions()
    log = {r["k"]: r for r in
           table_changes(t, vs[-2], vs[-1]).collect()}
    assert set(log) == {2, 3}
    assert log[2]["op"] == "update" and log[2]["v_old"] == "b" \
        and log[2]["v_new"] == "B"
    assert log[3]["op"] == "insert"


def test_randomized_ops_match_snapshot_model(spark, tmp_path):
    """Model-based check: a random sequence of merge/rollback/vacuum ops
    must keep (a) the live read equal to a pure-Python model of the
    table, and (b) every version versions() reports readable equal to
    the model's recorded snapshot at that version."""
    import random

    rng = random.Random(7)
    t = _tbl(spark, tmp_path / "t", retain=3)
    model: dict[int, str] = {}            # live state: key -> value
    snaps: dict[int, dict] = {}           # committed version -> state

    def current_version():
        st = t.status()
        return int(st["version"]) if "version" in st else 0

    for step in range(14):
        op = rng.choice(["merge", "merge", "merge", "rollback", "vacuum"])
        if op == "merge" or not snaps:
            # unique keys per batch: merge_upsert dropDuplicates-es the
            # source on the key, which the model can't predict otherwise
            rows = [(k, f"s{step}_{k}") for k in rng.sample(range(6), 2)]
            t.merge_upsert(_rows(spark, rows))
            for k, v in dict(rows).items():
                model[k] = v
            snaps[current_version()] = dict(model)
        elif op == "rollback":
            vs = t.versions()
            target = rng.choice(vs)
            t.rollback(target)
            model = dict(snaps[target])
            snaps[current_version()] = dict(model)
        else:
            t.vacuum()

        assert _snap(t) == {(k, v) for k, v in model.items()}
        for v in t.versions():
            if v in snaps:                # v1 seed may predate tracking
                assert _snap(t, v) == {(k, x) for k, x in snaps[v].items()}, v


def test_schema_evolution_widened_handle(spark, tmp_path):
    """Schema evolution contract: reopening a table with a WIDENED
    declared schema reads old files with typed NULLs for the new
    column, merges align the source (align_to_schema), and retained
    old versions stay readable through the widened handle."""
    old_schema = SCHEMA
    new_schema = T.StructType(list(SCHEMA.fields) + [
        T.StructField("extra", T.DoubleType())])

    t1 = ParquetTable(spark, str(tmp_path / "t"), old_schema, "k",
                      buckets=4, retain_versions=3)
    t1.merge_upsert(spark.createDataFrame([(1, "a"), (2, "b")], old_schema))

    t2 = ParquetTable(spark, str(tmp_path / "t"), new_schema, "k",
                      buckets=4)
    # old rows surface with NULL in the new column
    got = {r["k"]: (r["v"], r["extra"]) for r in t2.read().collect()}
    assert got == {1: ("a", None), 2: ("b", None)}
    # merge through the widened handle: new column persisted, old kept
    t2.merge_upsert(spark.createDataFrame([(2, "B", 9.5), (3, "c", 1.0)],
                                          new_schema))
    got = {r["k"]: (r["v"], r["extra"]) for r in t2.read().collect()}
    assert got == {1: ("a", None), 2: ("B", 9.5), 3: ("c", 1.0)}
    # the pre-evolution snapshot is still readable via the new handle
    vs = t2.versions()
    assert len(vs) >= 2
    old_snap = {r["k"]: (r["v"], r["extra"])
                for r in t2.read(version=vs[0]).collect()}
    assert old_snap == {1: ("a", None), 2: ("b", None)}
