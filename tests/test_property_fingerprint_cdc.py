"""Property-based laws for the reconciliation algebra (SURVEY §5 item 4
style): random snapshot pairs must satisfy

1. apply(old, diff(old, new)) == new           (CDC round trip)
2. fingerprint(old) ⊕ delta(diff) == fingerprint(new)   (incremental ≡ fresh)
3. diff(x, x) is empty                         (reflexivity)

Each hypothesis example makes one bounded set of Spark jobs (tables are
tens of rows; max_examples kept small — Spark round trips dominate)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from tradingview_data_pipeline_spark.operators import fingerprint as fp
from tradingview_data_pipeline_spark.operators.cdc import (
    apply_changelog, snapshot_diff,
)

KEYS, COLS = ["k"], ["a", "b"]

row = st.tuples(st.integers(0, 24),
                st.one_of(st.none(), st.text(
                    alphabet="abc|_", min_size=0, max_size=4)),
                st.one_of(st.none(), st.integers(-5, 5)))
table = st.lists(row, min_size=0, max_size=25,
                 unique_by=lambda r: r[0])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(old_rows=table, new_rows=table)
def test_cdc_and_fingerprint_laws(spark, old_rows, new_rows):
    old, new = _df(spark, old_rows), _df(spark, new_rows)

    log = snapshot_diff(old, new, KEYS, COLS)

    # (1) round trip
    rebuilt = apply_changelog(old, log, KEYS, COLS)
    assert rebuilt.exceptAll(new).unionAll(new.exceptAll(rebuilt)).count() == 0

    # (2) incremental fingerprint == fresh fingerprint
    fp_old = fp.table_fingerprint(old, KEYS + COLS, n_buckets=8)
    delta = fp.changelog_fingerprint_delta(log, KEYS, COLS, n_buckets=8)
    updated = fp.apply_fingerprint_delta(fp_old, delta)
    fresh = fp.table_fingerprint(new, KEYS + COLS, n_buckets=8)
    assert fp.fingerprint_diff(updated, fresh).count() == 0

    # (3) reflexivity
    assert snapshot_diff(new, new, KEYS, COLS).count() == 0
