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


# --- pack_token_sequences (concat-and-chunk sequence assembly) -----------


def _ref_pack(docs, seq_len):
    """Reference model: concatenate ids in doc order, chunk every
    seq_len; track (start, n, doc) spans per chunk."""
    seqs, spans, cur, cur_spans = [], [], [], []
    for did, ids in docs:
        for tok in ids:
            if not cur_spans or cur_spans[-1][2] != did:
                cur_spans.append([len(cur), 0, did])
            cur.append(tok)
            cur_spans[-1][1] += 1
            if len(cur) == seq_len:
                seqs.append(cur)
                spans.append([tuple(s) for s in cur_spans])
                cur, cur_spans = [], []
    return seqs, spans, (cur, [tuple(s) for s in cur_spans])


def _ids_df(spark, docs, grp="g"):
    return spark.createDataFrame(
        [(d, grp, ids) for d, ids in docs],
        "doc_id long, grp string, ids array<long>")


def test_pack_token_sequences_matches_reference(spark):
    import random
    rng = random.Random(7)
    docs = [(i, [rng.randint(0, 99) for _ in range(rng.randint(0, 23))])
            for i in range(40)]
    out = pk.pack_token_sequences(
        _ids_df(spark, docs), "doc_id", "ids", 16, ["grp"]).collect()
    exp_seqs, exp_spans, (tail, _) = _ref_pack(docs, 16)
    got = {r["seq_id"]: r for r in out}
    assert sorted(got) == list(range(len(exp_seqs)))   # tail dropped
    for i, (seq, spn) in enumerate(zip(exp_seqs, exp_spans)):
        assert got[i]["input_ids"] == seq
        assert got[i]["n_real"] == 16
        assert [(s["start"], s["n"], s["doc"])
                for s in got[i]["doc_spans"]] == spn


def test_pack_token_sequences_pad_tail(spark):
    docs = [(1, [1, 2, 3]), (2, [4, 5]), (3, [6, 7, 8, 9])]
    out = pk.pack_token_sequences(
        _ids_df(spark, docs), "doc_id", "ids", 4, ["grp"],
        pad_id=-1).collect()
    got = {r["seq_id"]: r for r in out}
    assert got[0]["input_ids"] == [1, 2, 3, 4] and got[0]["n_real"] == 4
    assert got[1]["input_ids"] == [5, 6, 7, 8] and got[1]["n_real"] == 4
    assert got[2]["input_ids"] == [9, -1, -1, -1] and got[2]["n_real"] == 1
    # spans cover exactly the real ids, in offset order
    assert [(s["start"], s["n"], s["doc"]) for s in got[0]["doc_spans"]] \
        == [(0, 3, 1), (3, 1, 2)]
    assert [(s["start"], s["n"], s["doc"]) for s in got[1]["doc_spans"]] \
        == [(0, 1, 2), (1, 3, 3)]
    assert [(s["start"], s["n"], s["doc"]) for s in got[2]["doc_spans"]] \
        == [(0, 1, 3)]


def test_pack_token_sequences_doc_straddles_many_seqs(spark):
    # one doc spans 3+ sequences; empty docs contribute nothing
    docs = [(1, []), (2, list(range(100, 135))), (3, [])]
    out = pk.pack_token_sequences(
        _ids_df(spark, docs), "doc_id", "ids", 10, ["grp"]).collect()
    got = {r["seq_id"]: r["input_ids"] for r in out}
    assert got == {i: list(range(100 + 10 * i, 110 + 10 * i))
                   for i in range(3)}                  # 35 % 10 tail dropped


def test_pack_token_sequences_groups_independent(spark):
    rows = [(1, "a", [1, 2, 3]), (2, "b", [4, 5, 6]), (3, "a", [7])]
    df = spark.createDataFrame(rows, "doc_id long, grp string, ids array<long>")
    out = pk.pack_token_sequences(df, "doc_id", "ids", 4, ["grp"]).collect()
    by_grp = {(r["grp"], r["seq_id"]): r["input_ids"] for r in out}
    assert by_grp == {("a", 0): [1, 2, 3, 7]}          # b's tail (3<4) dropped


def test_pack_token_sequences_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError, match="seq_len"):
        pk.pack_token_sequences(_ids_df(spark, [(1, [1])]),
                                "doc_id", "ids", 0, ["grp"])


def test_pack_token_sequences_rejects_colliding_columns(spark):
    df = spark.createDataFrame([(1, "g", [1], 0)],
                               "doc_id long, grp string, ids array<long>, seq_id long")
    with pytest.raises(ValueError, match="collide"):
        pk.pack_token_sequences(df, "doc_id", "ids", 4, ["grp"])


# --- training targets (causal shift / deterministic MLM) -------------------

def _seqs(spark):
    rows = [
        ("a", 0, [1, 2, 3, 4, 5, 6, 7, 8], 8),
        ("a", 1, [9, 10, 11, 12, 0, 0, 0, 0], 4),   # padded tail
        ("b", 0, [5, 4, 3, 2, 1, 6, 7, 8], 8),
    ]
    return spark.createDataFrame(
        rows, "grp string, seq_id long, input_ids array<bigint>, n_real long")


def test_causal_lm_labels_shift_and_pad_mask(spark):
    out = {(r["grp"], r["seq_id"]): r["labels"]
           for r in pk.causal_lm_labels(_seqs(spark)).collect()}
    assert out[("a", 0)] == [2, 3, 4, 5, 6, 7, 8, -100]
    # padded: only positions with a REAL successor carry a label
    assert out[("a", 1)] == [10, 11, 12, -100, -100, -100, -100, -100]


def test_mlm_mask_deterministic_and_consistent(spark):
    seqs = _seqs(spark)
    m1 = pk.mlm_mask(seqs, 999, key_cols=("grp", "seq_id"),
                     mask_prob=0.4).collect()
    m2 = pk.mlm_mask(seqs.repartition(3), 999, key_cols=("grp", "seq_id"),
                     mask_prob=0.4).collect()
    k1 = {(r["grp"], r["seq_id"]): (r["masked_ids"], r["labels"]) for r in m1}
    k2 = {(r["grp"], r["seq_id"]): (r["masked_ids"], r["labels"]) for r in m2}
    assert k1 == k2  # layout-independent
    for r in m1:
        ids, masked, labels, nr = (r["input_ids"], r["masked_ids"],
                                   r["labels"], r["n_real"])
        for i in range(len(ids)):
            if i >= nr:                       # padding never selected
                assert masked[i] == ids[i] and labels[i] == -100
            elif labels[i] == -100:           # unselected: id untouched
                assert masked[i] == ids[i]
            else:                             # selected: label = original
                assert labels[i] == ids[i] and masked[i] == 999
    # different groups, same seq_id -> different masks (key includes grp)
    sel_a = [i for i, v in enumerate(k1[("a", 0)][1]) if v != -100]
    sel_b = [i for i, v in enumerate(k1[("b", 0)][1]) if v != -100]
    assert sel_a or sel_b


def test_mlm_mask_fraction_and_rates(spark):
    import random
    random.seed(5)
    rows = [("g", i, [random.randrange(100, 200) for _ in range(64)], 64)
            for i in range(60)]
    seqs = spark.createDataFrame(
        rows, "grp string, seq_id long, input_ids array<bigint>, n_real long")
    out = pk.mlm_mask(seqs, 999, key_cols=("grp", "seq_id"),
                      mask_prob=0.15, vocab_size=100).collect()
    n_tok = 60 * 64
    selected = sum(1 for r in out for v in r["labels"] if v != -100)
    assert 0.10 * n_tok < selected < 0.20 * n_tok  # ~15%
    # 80/10/10: all three outcomes occur among selected positions
    n_mask = n_rand = n_keep = 0
    for r in out:
        for i, v in enumerate(r["labels"]):
            if v == -100:
                continue
            mi = r["masked_ids"][i]
            if mi == 999:
                n_mask += 1
            elif mi == r["input_ids"][i]:
                n_keep += 1
            else:
                n_rand += 1
                assert 0 <= mi < 100
    assert n_mask > n_rand > 0 and n_keep > 0
    assert n_mask / selected > 0.6


def test_mlm_mask_rejects_bad_prob(spark):
    with pytest.raises(ValueError, match="mask_prob"):
        pk.mlm_mask(_seqs(spark), 999, mask_prob=1.5)


def test_span_corruption_lossless_and_deterministic(spark):
    import random
    random.seed(9)
    rows = [("g", i, [random.randrange(1, 500) for _ in range(48)], 48)
            for i in range(20)]
    # one padded row: only the real prefix participates
    rows.append(("g", 99, [7, 8, 9, 10, 11, 12, 0, 0], 6))
    seqs = spark.createDataFrame(
        rows, "grp string, seq_id long, input_ids array<bigint>, n_real long")
    SENT, EOS = 10_000, 9_999
    out = pk.span_corruption(seqs, SENT, key_cols=("grp", "seq_id"),
                             noise_density=0.2, eos_id=EOS)
    got = {r["seq_id"]: r for r in out.collect()}
    re_got = {r["seq_id"]: r for r in
              pk.span_corruption(seqs.repartition(5), SENT,
                                 key_cols=("grp", "seq_id"),
                                 noise_density=0.2, eos_id=EOS).collect()}
    for sid, r in got.items():
        assert re_got[sid]["corrupted_ids"] == r["corrupted_ids"]  # determinism
        orig = list(r["input_ids"])[: r["n_real"]]
        inp, tgt = list(r["corrupted_ids"]), list(r["target_ids"])
        assert tgt[-1] == EOS
        # spans from the target, keyed by sentinel
        spans, cur = {}, None
        for t in tgt[:-1]:
            if t >= SENT:
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        # reconstruct: sentinel -> its span
        rebuilt = []
        for t in inp:
            rebuilt.extend(spans[t] if t >= SENT else [t])
        assert rebuilt == orig                       # lossless
        sents = [t for t in inp if t >= SENT]
        assert sents == sorted(sents)                # ascending sentinels
        assert sents == [t for t in tgt if t >= SENT and t != EOS]
        n_noise = sum(len(s) for s in spans.values())
        assert 1 <= n_noise <= max(1, int(0.35 * len(orig)))  # ~density
        assert all(s for s in spans.values())        # every span non-empty


def test_span_corruption_short_and_invalid(spark):
    seqs = spark.createDataFrame(
        [("g", 0, [42], 1), ("g", 1, [1, 2], 2)],
        "grp string, seq_id long, input_ids array<bigint>, n_real long")
    out = {r["seq_id"]: r for r in
           pk.span_corruption(seqs, 100, key_cols=("grp", "seq_id"),
                              eos_id=99).collect()}
    assert out[0]["corrupted_ids"] == [42] and out[0]["target_ids"] == [99]
    assert out[1]["corrupted_ids"] in ([1, 100], [100, 2])
    with pytest.raises(ValueError, match="noise_density"):
        pk.span_corruption(seqs, 100, noise_density=0.0)
    with pytest.raises(ValueError, match="mean_span_len"):
        pk.span_corruption(seqs, 100, mean_span_len=0.5)


def test_length_bucketed_batches(spark):
    """Padded lengths round UP to bucket_width (len 0 pads to one
    width); batch_size = budget DIV padded_len (singleton for
    over-budget rows); batch assignment is dense, (len, id)-ordered,
    and every batch's padded token mass fits the budget."""
    from collections import Counter

    rows = list(enumerate([5, 7, 8, 3, 13, 16, 40, 0, 9]))
    df = spark.createDataFrame(rows, "sid long, n long")
    out = pk.length_bucketed_batches(df, "sid", "n",
                                     token_budget=32, bucket_width=8)
    got = {r["sid"]: r for r in out.collect()}
    assert got[0]["padded_len"] == 8 and got[7]["padded_len"] == 8
    assert got[8]["padded_len"] == 16            # 9 rounds up
    assert got[6]["padded_len"] == 40 and got[6]["batch_size"] == 1
    # bucket 8 holds lens (0,3,5,7,8) -> batch_size 4 -> [0,0,0,0,1]
    b8 = sorted((r["n"], r["sid"]) for r in got.values()
                if r["padded_len"] == 8)
    assert [got[s]["batch_id"] for _, s in b8] == [0, 0, 0, 0, 1]
    # bucket 16 holds lens (9,13,16) -> batch_size 2 -> [0,0,1]
    b16 = sorted((r["n"], r["sid"]) for r in got.values()
                 if r["padded_len"] == 16)
    assert [got[s]["batch_id"] for _, s in b16] == [0, 0, 1]
    # budget invariant: count * padded_len <= budget unless singleton
    mass = Counter((r["padded_len"], r["batch_id"]) for r in got.values())
    assert all(c * pl <= 32 or c == 1 for (pl, b), c in mass.items())
    # input columns preserved
    assert set(out.columns) == {"sid", "n", "padded_len", "batch_size",
                                "batch_id"}


def test_length_bucketed_batches_groups_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("b", 3, 4), ("b", 4, 4)],
        "g string, sid long, n long")
    out = pk.length_bucketed_batches(df, "sid", "n", token_budget=8,
                                     bucket_width=4, group_keys=["g"])
    # each group batches independently: 2 rows of padded 4 fit one batch
    per = {(r["g"], r["sid"]): r["batch_id"] for r in out.collect()}
    assert per[("a", 1)] == 0 and per[("a", 2)] == 0
    assert per[("b", 3)] == 0 and per[("b", 4)] == 0
    with pytest.raises(ValueError, match="> 0"):
        pk.length_bucketed_batches(df, "sid", "n",
                                   token_budget=0, bucket_width=4)
    with pytest.raises(ValueError, match="> 0"):
        pk.length_bucketed_batches(df, "sid", "n",
                                   token_budget=8, bucket_width=-1)


def test_length_bucketed_batches_matches_reference(spark):
    """Random lengths (incl. 0 and over-budget) against a direct Python
    transcription of the documented semantics."""
    import random

    rng = random.Random(29)
    budget, width = 48, 8
    rows = [(i, rng.choice([0, 1, 3, 7, 8, 9, 15, 16, 40, 100]))
            for i in range(200)]

    def ref():
        padded = {i: max(1, -(-ln // width)) * width for i, ln in rows}
        out = {}
        buckets = {}
        for i, ln in rows:
            buckets.setdefault(padded[i], []).append((ln, i))
        for p, members in buckets.items():
            bs = max(budget // p, 1)
            for rank, (ln, i) in enumerate(sorted(members)):
                out[i] = (p, bs, rank // bs)
        return out

    df = spark.createDataFrame(rows, "sid long, n long")
    got = {r["sid"]: (r["padded_len"], r["batch_size"], r["batch_id"])
           for r in pk.length_bucketed_batches(
               df, "sid", "n", token_budget=budget,
               bucket_width=width).collect()}
    assert got == ref()
    # reserved-column guard
    bad = df.withColumn("batch_id", df["n"])
    with pytest.raises(ValueError, match="reserves"):
        pk.length_bucketed_batches(bad, "sid", "n",
                                   token_budget=budget, bucket_width=width)
