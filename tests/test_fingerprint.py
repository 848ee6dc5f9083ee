"""Table fingerprint / reconciliation (operators/fingerprint)."""

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import fingerprint as fp

COLS = ["k", "s"]


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k long, s string")


def test_identical_tables_no_diff(spark):
    a = _tbl(spark, [(i, f"v{i}") for i in range(200)])
    b = _tbl(spark, [(i, f"v{i}") for i in reversed(range(200))])  # order-free
    fa = fp.table_fingerprint(a, COLS, n_buckets=16)
    fb = fp.table_fingerprint(b, COLS, n_buckets=16)
    assert fp.fingerprint_diff(fa, fb).count() == 0


def test_single_changed_row_detected_and_localized(spark):
    rows = [(i, f"v{i}") for i in range(200)]
    a = _tbl(spark, rows)
    b = _tbl(spark, [(i, "CHANGED" if i == 57 else f"v{i}")
                     for i in range(200)])
    fa = fp.table_fingerprint(a, COLS, n_buckets=16)
    fb = fp.table_fingerprint(b, COLS, n_buckets=16)
    diff = fp.fingerprint_diff(fa, fb).collect()
    assert 1 <= len(diff) <= 2       # old row's bucket + new row's bucket
    buckets = [r["bucket"] for r in diff]
    # the row-level re-scan over differing buckets recovers the culprit
    suspects = fp.rows_in_buckets(a, COLS, buckets, n_buckets=16)
    assert (57, "v57") in [(r["k"], r["s"]) for r in suspects.collect()]
    # and the re-scan reads only ~|diff|/n_buckets of the table
    assert suspects.count() < 200 * (len(buckets) + 1) / 16 * 2


def test_duplicated_row_caught_by_count_not_xor(spark):
    """Two extra copies of one row: XOR of its hash cancels pairwise,
    but the count and modular sum still flip — the triple is the
    guarantee, not any single accumulator."""
    a = _tbl(spark, [(i, f"v{i}") for i in range(50)])
    b = _tbl(spark, [(i, f"v{i}") for i in range(50)] + [(7, "v7")] * 2)
    fa = fp.table_fingerprint(a, COLS, n_buckets=4)
    fb = fp.table_fingerprint(b, COLS, n_buckets=4)
    diff = fp.fingerprint_diff(fa, fb).collect()
    assert len(diff) == 1
    r = diff[0]
    assert r["xor_hash"] == r["xor_hash_b"]      # XOR alone is blind
    assert r["n_rows"] != r["n_rows_b"]          # count is not


def test_missing_bucket_reported_on_full_outer(spark):
    a = _tbl(spark, [(i, f"v{i}") for i in range(40)])
    fa = fp.table_fingerprint(a, COLS, n_buckets=8)
    fb = fp.table_fingerprint(a.limit(0), COLS, n_buckets=8)
    assert fp.fingerprint_diff(fa, fb).count() == fa.count()


def test_null_distinct_from_empty_and_sentinel_string(spark):
    a = _tbl(spark, [(1, None)])
    b = _tbl(spark, [(1, "")])
    c = _tbl(spark, [(1, fp.NULL_SENTINEL)])
    ha = fp.table_fingerprint(a, COLS, n_buckets=1).head()
    hb = fp.table_fingerprint(b, COLS, n_buckets=1).head()
    hc = fp.table_fingerprint(c, COLS, n_buckets=1).head()
    assert ha["xor_hash"] != hb["xor_hash"]      # NULL != ''
    assert ha["xor_hash"] == hc["xor_hash"]      # documented sentinel alias


def test_incremental_update_equals_recompute(spark):
    """Maintained fingerprint + changelog delta == fresh fingerprint of
    the new snapshot, bucket for bucket — churn-sized maintenance."""
    from tradingview_data_pipeline_spark.operators.cdc import snapshot_diff

    old = _tbl(spark, [(i, f"v{i}") for i in range(300)])
    new = _tbl(spark, [(i, ("CH" if i % 31 == 0 else f"v{i}"))
                       for i in range(7, 310)])
    log = snapshot_diff(old, new, ["k"], ["s"])
    fp_old = fp.table_fingerprint(old, COLS, n_buckets=16)
    delta = fp.changelog_fingerprint_delta(log, ["k"], ["s"], n_buckets=16)
    updated = fp.apply_fingerprint_delta(fp_old, delta)
    fresh = fp.table_fingerprint(new, COLS, n_buckets=16)
    assert fp.fingerprint_diff(updated, fresh).count() == 0
    # and the updated fingerprint still detects a real divergence
    tampered = _tbl(spark, [(i, ("XX" if i == 100 else
                                 ("CH" if i % 31 == 0 else f"v{i}")))
                            for i in range(7, 310)])
    assert fp.fingerprint_diff(
        updated, fp.table_fingerprint(tampered, COLS, n_buckets=16)).count() > 0


def test_empty_changelog_delta_is_identity(spark):
    from tradingview_data_pipeline_spark.operators.cdc import snapshot_diff

    t = _tbl(spark, [(i, f"v{i}") for i in range(40)])
    log = snapshot_diff(t, t, ["k"], ["s"])
    assert log.count() == 0
    fp0 = fp.table_fingerprint(t, COLS, n_buckets=8)
    delta = fp.changelog_fingerprint_delta(log, ["k"], ["s"], n_buckets=8)
    assert fp.fingerprint_diff(
        fp.apply_fingerprint_delta(fp0, delta), fp0).count() == 0
