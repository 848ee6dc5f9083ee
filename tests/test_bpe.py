"""Distributed BPE induction (operators/bpe) vs a pure-Python reference
implementation: identical merge lists, greedy-overlap law, tie-break
determinism, and encode round-trip properties."""

from collections import Counter

from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import bpe

EOW = bpe.END_OF_WORD


# --- pure-python reference trainer (independent of the operator) ----------

def _ref_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_train(texts, n_merges, min_pair_count=2):
    wf = Counter(w for t in texts for w in t.split())
    words = {w: list(w) + [EOW] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        words = {w: _ref_merge(s, a, b) for w, s in words.items()}
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "widow window widen low new",
    "the newer the lower the wider",
]


def _df(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_train_matches_reference(spark):
    got = bpe.bpe_train(_df(spark), "text", n_merges=20)
    assert got == _ref_train(TEXTS, 20)
    assert len(got) >= 15  # corpus is rich enough for a deep merge list


def test_bpe_train_early_stop_and_tiebreak(spark):
    # every pair unique -> weighted counts equal freq; with
    # min_pair_count above the max the trainer must stop immediately
    assert bpe.bpe_train(_df(spark, ["abcd"]), "text", n_merges=5,
                         min_pair_count=10) == []
    # all pair counts tie at 1 -> lexicographically smallest pair wins
    got = bpe.bpe_train(_df(spark, ["bca"]), "text", n_merges=1,
                        min_pair_count=1)
    assert got == [("a", EOW)]  # ('a','</w>') < ('b','c') < ('c','a')


def test_bpe_greedy_overlap_law(spark):
    # 'aaaa' with pair (a,a): greedy-left pairs -> [aa, aa, </w>];
    # the (a,a) count is 3 (overlapping adjacencies all counted)
    got = bpe.bpe_train(_df(spark, ["aaaa aaaa"]), "text", n_merges=1,
                        min_pair_count=2)
    assert got == [("a", "a")]
    enc = bpe.bpe_encode(_df(spark, ["aaaa"]), "doc_id", "text",
                         got).collect()[0]
    assert enc["bpe_tokens"] == ["aa", "aa", EOW]


def test_bpe_encode_matches_reference_and_compresses(spark):
    merges = bpe.bpe_train(_df(spark), "text", n_merges=30)
    out = {r["doc_id"]: r for r in
           bpe.bpe_encode(_df(spark), "doc_id", "text", merges).collect()}
    for i, t in enumerate(TEXTS):
        expect = [s for w in t.split()
                  for s in bpe._encode_word(w, merges)]
        assert out[i]["bpe_tokens"] == expect
        assert out[i]["n_bpe_tokens"] == len(expect)
        # learned merges must compress vs the char baseline
        chars = sum(len(w) + 1 for w in t.split())
        assert out[i]["n_bpe_tokens"] < chars
    # empty/whitespace text encodes to zero tokens
    empty = bpe.bpe_encode(_df(spark, ["", "   "]), "doc_id", "text",
                           merges).collect()
    assert all(r["n_bpe_tokens"] == 0 for r in empty)


def test_bpe_merges_deterministic_across_runs(spark):
    a = bpe.bpe_train(_df(spark), "text", n_merges=12)
    b = bpe.bpe_train(_df(spark), "text", n_merges=12)
    assert a == b


def test_bpe_encode_tokenizes_like_training(spark):
    """Regression (review r7): encode must split words exactly like
    tx.tokens (ASCII \\s+) — Python str.split() also splits on Unicode
    whitespace (NBSP etc.) and would segment words the vocabulary was
    never trained on."""
    nbsp_text = "a b a b"
    df = _df(spark, [nbsp_text])
    merges = bpe.bpe_train(df, "text", n_merges=3, min_pair_count=2)
    out = bpe.bpe_encode(df, "doc_id", "text", merges).collect()[0]
    expect = [s for w in ["a b", "a b"]
              for s in bpe._encode_word(w, merges)]
    assert out["bpe_tokens"] == expect  # ONE word per occurrence, not two


def test_bpe_pair_batch_is_exact(spark):
    """pair_batch amortizes driver round-trips but must produce the
    BIT-IDENTICAL merge sequence: each action applies only the prefix
    of the sequential order the count snapshot can PROVE (see
    _select_exact_batch's soundness argument)."""
    base = bpe.bpe_train(_df(spark), "text", n_merges=20,
                         mode="distributed")
    for pb in (4, 16, 64):
        got = bpe.bpe_train(_df(spark), "text", n_merges=20, pair_batch=pb,
                            mode="distributed")
        assert got == base, f"pair_batch={pb}"
    assert base == _ref_train(TEXTS, 20)


def test_bpe_local_path_matches_distributed(spark):
    """The driver-side merge loop (mode='local' / the 'auto' default on
    vocabulary-sized word tables) is bit-equal to the distributed
    per-iteration path AND the pure-python reference; 'auto' falls back
    to distributed when the word table exceeds local_max_words."""
    import pytest
    dist = bpe.bpe_train(_df(spark), "text", n_merges=20,
                         mode="distributed")
    st = {}
    loc = bpe.bpe_train(_df(spark), "text", n_merges=20, mode="local",
                        stats_out=st)
    assert loc == dist == _ref_train(TEXTS, 20)
    assert st["path"] == "local" and st["n_actions"] == 1
    st = {}
    auto = bpe.bpe_train(_df(spark), "text", n_merges=20, stats_out=st)
    assert auto == dist and st["path"] == "local"
    # min_pair_count early stop + tie-break laws hold on the local path
    assert bpe.bpe_train(_df(spark, ["abcd"]), "text", n_merges=5,
                         min_pair_count=10, mode="local") == []
    assert bpe.bpe_train(_df(spark, ["bca"]), "text", n_merges=1,
                         min_pair_count=1, mode="local") == [("a", EOW)]
    assert bpe.bpe_train(_df(spark, ["aaaa aaaa"]), "text", n_merges=2,
                         min_pair_count=2, mode="local") == \
        bpe.bpe_train(_df(spark, ["aaaa aaaa"]), "text", n_merges=2,
                      min_pair_count=2, mode="distributed")
    # auto + tiny cap -> distributed fallback, same result
    st = {}
    fb = bpe.bpe_train(_df(spark), "text", n_merges=20, stats_out=st,
                       local_max_words=1)
    assert fb == dist and st["path"] == "distributed"
    with pytest.raises(ValueError, match="mode"):
        bpe.bpe_train(_df(spark), "text", mode="turbo")


def test_bpe_leading_whitespace_no_phantom_empty_word(spark):
    """Text starting with a tab/newline must not inject an empty word
    into the frequency table (tx.tokens trims spaces only, so \\s+
    split yields a leading '' for such texts)."""
    df = spark.createDataFrame(
        [(1, "\tab ab ab"), (2, "\nab ab")], "doc_id long, text string")
    wf = {r["word"]: r["freq"]
          for r in bpe.word_freq_table(df, "text").collect()}
    assert "" not in wf
    assert wf == {"ab": 5}
    merges = bpe.bpe_train(df, "text", n_merges=3, min_pair_count=2)
    assert merges == _ref_train(["ab ab ab", "ab ab"], 3)


def test_save_load_merges_round_trip(spark, tmp_path):
    """The persisted tokenizer artifact restores the exact merge order,
    and encoding with the loaded list is identical; empty vocabularies
    round-trip too."""
    from tradingview_data_pipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string")
    merges = bpe.bpe_train(docs, "text", n_merges=8, min_pair_count=2)
    assert merges
    bpe.save_merges(spark, merges, str(tmp_path / "vocab"))
    loaded = bpe.load_merges(spark, str(tmp_path / "vocab"))
    assert loaded == merges
    a = bpe.bpe_encode(docs, "doc_id", "text", merges).collect()
    b = bpe.bpe_encode(docs, "doc_id", "text", loaded).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)

    bpe.save_merges(spark, [], str(tmp_path / "empty"))
    assert bpe.load_merges(spark, str(tmp_path / "empty")) == []


def test_build_vocab_layout_and_collisions():
    merges = [("a", "b"), ("ab", "c"), ("a", "bc")]  # 'abc' twice
    vocab = bpe.build_vocab(merges, ["a", "b", "c", EOW])
    assert vocab[bpe.UNK_TOKEN] == 0
    assert [vocab[t] for t in ("a", "b", "c", EOW)] == [1, 2, 3, 4]
    assert vocab["ab"] == 5 and vocab["abc"] == 6   # first path wins
    assert len(vocab) == 7                           # no duplicate entry


def test_corpus_base_tokens_sorted_distinct(spark):
    df = _df(spark, ["ba ab", "\tca  a"])
    assert bpe.corpus_base_tokens(df, "text") == ["a", "b", "c", EOW]


def test_bpe_encode_ids_round_trip(spark):
    df = _df(spark)
    merges = bpe.bpe_train(df, "text", n_merges=20)
    vocab = bpe.build_vocab(merges, bpe.corpus_base_tokens(df, "text"))
    out = {r["doc_id"]: r for r in
           bpe.bpe_encode(df, "doc_id", "text", merges,
                          vocab=vocab).collect()}
    inv = {i: t for t, i in vocab.items()}
    for i, t in enumerate(TEXTS):
        # ids invert exactly to the string tokens; no UNK on the
        # training corpus itself
        assert [inv[x] for x in out[i]["input_ids"]] == out[i]["bpe_tokens"]
        assert 0 not in out[i]["input_ids"]
    # out-of-vocabulary characters map to UNK, not a crash
    oov = bpe.bpe_encode(_df(spark, ["zzz@@@"]), "doc_id", "text",
                         merges, vocab=vocab).collect()[0]
    assert set(oov["input_ids"]) <= {0} | set(vocab.values())
    assert 0 in oov["input_ids"]


def test_save_load_vocab_round_trip(spark, tmp_path):
    vocab = bpe.build_vocab([("a", "b")], ["a", "b", EOW])
    path = str(tmp_path / "vocab")
    bpe.save_vocab(spark, vocab, path)
    assert bpe.load_vocab(spark, path) == vocab


def test_fertility_profile(spark):
    # a vocabulary trained ON src_a: src_a words encode as whole tokens
    # (low fertility), unseen src_b words shatter toward characters
    corpus = [(1, "hello hello world", "a"),
              (2, "hello world world hello", "a"),
              (3, "zzyqx vwpt", "b")]
    df = spark.createDataFrame(corpus, "doc_id long, text string, src string")
    merges = bpe.bpe_train(
        df.where(F.col("src") == "a"), "text", n_merges=50)
    prof = {r["src"]: r for r in bpe.fertility_profile(
        df, "doc_id", "text", merges, group_cols=["src"]).collect()}
    # exact integer accounting vs the reference encoder
    enc_counts = {}
    for _, text, src in corpus:
        toks = sum(len(bpe._encode_word(w, merges)) for w in text.split())
        enc_counts[src] = enc_counts.get(src, 0) + toks
    assert prof["a"]["n_docs"] == 2 and prof["b"]["n_docs"] == 1
    assert prof["a"]["n_words"] == 7 and prof["b"]["n_words"] == 2
    assert prof["a"]["n_tokens"] == enc_counts["a"]
    assert prof["b"]["n_tokens"] == enc_counts["b"]
    assert prof["a"]["tokens_per_word"] == enc_counts["a"] / 7
    # trained-domain fertility is 1.0 (whole-word merges learned);
    # unseen-domain fertility is strictly higher
    assert prof["a"]["tokens_per_word"] == 1.0
    assert prof["b"]["tokens_per_word"] > 2.0
    assert prof["a"]["chars_per_token"] == prof["a"]["n_chars"] / enc_counts["a"]


def test_fertility_profile_ungrouped_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "")], "doc_id long, text string")
    merges = bpe.bpe_train(df, "text", n_merges=10)
    rows = bpe.fertility_profile(df, "doc_id", "text", merges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_words"] == 2
    assert r["tokens_per_word"] is not None
