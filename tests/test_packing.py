"""Sequence-packing operators: contiguous (window) and first-fit
(applyInPandas) against a pure-pandas oracle and invariants."""

import pytest
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import packing as pk


def _docs(spark):
    rows = [
        # (doc_id, grp, tokens)
        (1, "en", 300), (2, "en", 300), (3, "en", 100), (4, "en", 500),
        (5, "en", 120), (6, "en", 700),          # 700 > budget -> overflow
        (7, "de", 512), (8, "de", 1), (9, "de", 511),
    ]
    return spark.createDataFrame(rows, "doc_id long, grp string, tokens long")


def test_pack_contiguous_matches_prefix_sum(spark):
    out = pk.pack_contiguous(_docs(spark), "doc_id", "tokens", 512, ["grp"])
    got = {r["doc_id"]: r["bin_id"] for r in out.collect()}
    # en exclusive cumsums: 0,300,600,700,1200,1320 -> //512 = 0,0,1,1,2,2
    assert [got[i] for i in range(1, 7)] == [0, 0, 1, 1, 2, 2]
    # de: 0,512,513 -> 0,1,1
    assert [got[i] for i in (7, 8, 9)] == [0, 1, 1]


def test_pack_first_fit_matches_python_oracle(spark):
    out = pk.pack_first_fit(_docs(spark), "doc_id", "tokens", 512, ["grp"])
    got = {r["doc_id"]: (r["bin_id"], r["overflow"]) for r in out.collect()}

    def oracle(docs, budget):
        remaining, res = [], {}
        for did, t in docs:
            if t > budget:
                res[did] = (len(remaining), True)
                remaining.append(0)
                continue
            for i, cap in enumerate(remaining):
                if cap >= t:
                    res[did] = (i, False)
                    remaining[i] = cap - t
                    break
            else:
                res[did] = (len(remaining), False)
                remaining.append(budget - t)
        return res

    exp = oracle([(1, 300), (2, 300), (3, 100), (4, 500), (5, 120), (6, 700)], 512)
    exp.update(oracle([(7, 512), (8, 1), (9, 511)], 512))
    assert got == exp
    assert got[6] == (exp[6][0], True)            # oversized doc flagged


def test_pack_first_fit_invariants_random(spark):
    import random
    rng = random.Random(13)
    rows = [(i, f"g{i % 3}", rng.randint(1, 400)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, tokens long")
    out = pk.pack_first_fit(df, "doc_id", "tokens", 512, ["grp"]).collect()
    assert len(out) == 200                        # every doc placed
    fills = {}
    for r in out:
        assert not r["overflow"]
        fills.setdefault((r["grp"], r["bin_id"]), 0)
        fills[(r["grp"], r["bin_id"])] += r["tokens"]
    assert all(v <= 512 for v in fills.values())  # budget respected
    # packing is reasonably tight: no more bins than 2x optimal
    for g in ("g0", "g1", "g2"):
        total = sum(t for _, gg, t in rows if gg == g)
        nbins = len({b for (gg, b) in fills if gg == g})
        assert nbins <= 2 * (total // 512 + 1)
