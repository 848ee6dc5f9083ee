"""Data-quality gate: declarative expectations checked in ONE aggregation
pass, with raise / quarantine enforcement — the constraints layer a
production MERGE pipeline runs before letting a batch touch a table
(Delta's CHECK constraints / expectations idea on plain DataFrames).

The reference's quality handling is implicit — ``errors='coerce'`` plus
per-row try/except around uploads (uploadtodb.py:159-198) — which
silently degrades data. Here violations are MEASURED (every expectation
evaluated over the whole batch in a single job, no per-rule scans) and
POLICED (fail the batch, or quarantine violating rows and let the clean
remainder through).

Scale: ``check`` is one map-side-combined aggregate over the batch —
cost is one scan regardless of rule count; ``quarantine`` adds one
filter pass each side. Uniqueness rules add one groupBy on the key
(hash-partial, count>1 keys only).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One expectation: ``predicate`` must hold for (almost) every row.

    ``max_violation_frac``: tolerated fraction of violating rows before
    the expectation FAILS the batch (0.0 = strict). Violating rows are
    always counted; the threshold only decides pass/fail."""

    name: str
    predicate: Column
    max_violation_frac: float = 0.0


def not_null(col: str) -> Expect:
    return Expect(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> Expect:
    """NULLs pass (pair with ``not_null`` when absence is itself a
    violation) — range rules police present values only."""
    c = F.col(col)
    return Expect(f"{col}_in_range", c.isNull() | ((c >= lo) & (c <= hi)))


def matches(col: str, pattern: str) -> Expect:
    c = F.col(col)
    return Expect(f"{col}_matches", c.isNull() | c.rlike(pattern))


def check(df: DataFrame, expectations: list[Expect],
          *, unique_key: str | None = None) -> dict:
    """Evaluate every expectation in one aggregation pass. Returns
    ``{"rows": n, "passed": bool, "violations": {name: count},
    "failed": [names]}``. ``unique_key`` adds a duplicate-key rule
    (one extra groupBy job)."""
    names = [e.name for e in expectations]
    reserved = {"__n"} | ({f"{unique_key}_unique"} if unique_key else set())
    dup_or_reserved = ({n for n in names if names.count(n) > 1}
                       | (set(names) & reserved))
    if dup_or_reserved:
        # two rules under one alias would make row[name] silently return
        # one of them, letting a failing rule's count shadow the other —
        # e.g. two in_range() rules on the same column both derive
        # '{col}_in_range'; give one an explicit Expect(name=...)
        raise ValueError(
            "expectation names must be unique and not reserved; "
            f"conflicting: {sorted(dup_or_reserved)}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in expectations:
        aggs.append(F.sum(F.when(~e.predicate, 1).otherwise(0))
                    .alias(e.name))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    violations = {e.name: int(row[e.name] or 0) for e in expectations}
    failed = [e.name for e in expectations
              if n > 0 and violations[e.name] > e.max_violation_frac * n]
    if unique_key is not None:
        dups = (df.groupBy(unique_key).agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") > 1)
                .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)))
                .collect()[0][0])
        violations[f"{unique_key}_unique"] = int(dups)
        if dups:
            failed.append(f"{unique_key}_unique")
    return {"rows": int(n), "passed": not failed,
            "violations": violations, "failed": failed}


class QualityGateError(RuntimeError):
    def __init__(self, report: dict):
        self.report = report
        super().__init__(
            "quality gate failed: "
            + ", ".join(f"{name} ({report['violations'][name]} rows)"
                        for name in report["failed"]))


def enforce(df: DataFrame, expectations: list[Expect],
            *, mode: str = "raise",
            unique_key: str | None = None) -> tuple[DataFrame, dict]:
    """Police a batch before it reaches a sink.

    - ``mode="raise"``: run ``check``; raise ``QualityGateError`` (with
      the report attached) when any expectation fails, else return the
      batch untouched.
    - ``mode="quarantine"``: return ``(clean_rows, report)`` where rows
      violating ANY per-row expectation are removed; the report still
      records every count so the caller can sink the violations
      (``df.subtract``-free: the complement filter is exact).
      ``unique_key`` is report-only in this mode (dedup belongs to the
      MERGE, which is set-based on the key already).
    """
    report = check(df, expectations, unique_key=unique_key)
    if mode == "raise":
        if not report["passed"]:
            raise QualityGateError(report)
        return df, report
    assert mode == "quarantine", mode
    good = df
    for e in expectations:
        good = good.where(e.predicate)
    return good, report
