"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (values canonicalized: doubles via repr,
timestamps to ISO, rows sorted). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entrymod
    from tradingview_data_pipeline_spark.session import get_spark

    spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        # generated scale corpora shard big tables as <t>.parquet/part-*;
        # glob the directory form so DuckDB sees the same table Spark does
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # release operator DISK_ONLY pins between queries — a
            # 50-query session otherwise accumulates tens of GB of
            # block-manager spill (operators/pins.py)
            from tradingview_data_pipeline_spark.operators import pins
            pins.release_all()
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(c.lower() for c in [c for c in dcols]) and \
           sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"columns {scols} vs {dcols}")
        sh = value_hash(srows, [c.lower() for c in scols])
        dh = value_hash(drows, [c.lower() for c in dcols])
        if sh != dh:
            problems.append("value-hash mismatch")
            # show first differing row for debugging
            so = sorted("|".join(canon(v) for v in r) for r in
                        [tuple(r[i] for i in sorted(range(len(scols)), key=lambda i: scols[i].lower())) for r in srows])
            do = sorted("|".join(canon(v) for v in r) for r in
                        [tuple(r[i] for i in sorted(range(len(dcols)), key=lambda i: dcols[i].lower())) for r in drows])
            for a, b in zip(so, do):
                if a != b:
                    problems.append(f"  spark : {a[:200]}")
                    problems.append(f"  duckdb: {b[:200]}")
                    break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]) + "")
            for p in problems[1:]:
                print(f"      {p}")
            failures += 1
        else:
            print(f"PASS  {name}: rows={len(srows)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
