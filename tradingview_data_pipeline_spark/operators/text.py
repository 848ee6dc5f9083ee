"""Text-analysis operators for training-data pipelines.

All operators are native column expressions (higher-order array functions,
regexp, md5) — JVM-side, no Python UDFs, shuffle-free per-row transforms
that scale linearly. Deterministic across engines: hashing goes through
md5 hex (not engine-native hash functions), marker counting uses exact
token membership (not word-boundary regex, whose semantics differ between
Java regex and RE2).

Design note for 100 TB: everything here is a map-only projection over the
documents table; the only shuffles appear downstream (dedup groupBy /
LSH band join), and those shuffle 8-byte hashes, not document payloads.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    """Whitespace tokens: one ``\\S+`` extraction pass — empty /
    all-whitespace text yields an empty array, NULL stays NULL.

    Not trim+split: a space-only trim (``F.trim``) leaves a phantom
    leading "" token for tab/newline-leading text, shifting token
    indices off the word positions ``word_shingles`` produces and
    skewing every token count (r8 review finding); the single regex
    pass is also ~2x faster than trim+split. Mirrored by the oracle
    token constants in plans/."""
    return F.regexp_extract_all(col, F.lit(r"\S+"), 0)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-word shingles as strings; texts with < n words fall back to the
    whole (trimmed, space-normalized) text as a single shingle.

    Implementation: whitespace-normalize once, then a single lookahead
    regex pass — one overlapping capture per word position. ~17× faster
    than building shingles with per-element ``element_at`` (higher-order
    functions are interpreted, not codegen'd; regexp_extract_all is one
    JVM call per row). Verified element-identical to the transform-based
    construction.
    """
    norm = F.regexp_replace(F.trim(col), "\\s+", " ")
    pat = "(?=(" + "\\S+ " * (n - 1) + "\\S+))\\S+ ?"
    sh = F.regexp_extract_all(norm, F.lit(pat), F.lit(1))
    return F.when(F.size(sh) > 0, sh).otherwise(F.array(norm))


# ---------------------------------------------------------------------------
# Deterministic 60-bit hash from md5 (cross-engine reproducible; DuckDB
# equivalent: ('0x' || substr(md5(s),1,15))::BIGINT). 15 hex digits = 60
# bits, always positive, no signed overflow in either engine.
# ---------------------------------------------------------------------------

def md5_hash60(col: Column, salt: str | None = None) -> Column:
    s = F.concat(F.lit(f"{salt}:"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Language ID — marker-token heuristic: exact token-membership counts per
# language, argmax with first-in-table tie preference; all-zero -> 'und'.
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "les", "des", "est", "une", "dans"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "zh": ["的", "是", "了", "在", "和", "有"],
}


def marker_hits(toks: Column, markers: list[str]) -> Column:
    """Number of tokens that are marker words (exact membership — avoids
    regex word-boundary divergence across engines). ``toks`` should be a
    materialized token-array column (see ``lang_id_table``) so the split
    isn't re-evaluated per language."""
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """argmax over per-language hit columns; earlier languages win ties;
    all-zero -> 'und'. Pass attribute references (pre-computed hit
    columns), not full expressions — the chain references each twice."""
    best_lang, best_hits = F.lit("und"), F.lit(0)
    for lang, h in hits.items():
        better = h > best_hits             # strict: earlier languages win ties
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, h).otherwise(best_hits)
    return best_lang


def lang_id_table(df, text_col: str, id_cols: list[str],
                  marker_table: dict[str, list[str]] | None = None):
    """Two-phase language ID: one projection materializes tokens + hit
    counts (single split, one filter per language), a second does the
    argmax — keeps every expensive expression evaluated exactly once."""
    table = marker_table or LANG_MARKERS
    toks = tokens(F.col(text_col))
    step = df.select(*id_cols, toks.alias("__toks"))
    step = step.select(
        *id_cols,
        *[marker_hits(F.col("__toks"), m).cast("bigint").alias(f"h_{lang}")
          for lang, m in table.items()],
    )
    hits = {lang: F.col(f"h_{lang}") for lang in table}
    return step.withColumn("predicted_lang", lang_id_from_hits(hits))


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / stopword ratios blended.
# ---------------------------------------------------------------------------

def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, "[^.,;:!?]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    hits = marker_hits(tokens(col), sw)
    n = token_count(col)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column, *, target_len: int = 300) -> Column:
    """0..100-ish heuristic: length closeness (50%) + stopword presence
    (capped, 40%) + punctuation moderation (capped, 10%). Deterministic
    per-row double arithmetic, identical association order in the oracle."""
    n = F.length(col).cast("double")
    len_score = F.lit(100.0) - F.least(
        F.abs(n - F.lit(float(target_len))) / F.lit(float(target_len)) * 100.0,
        F.lit(100.0))
    sw = stopword_ratio(col) * 100.0
    pr = punct_ratio(col) * 100.0
    return len_score * 0.5 + F.least(sw, F.lit(50.0)) * 0.8 + F.least(pr, F.lit(20.0)) * 0.5


# ---------------------------------------------------------------------------
# Document fingerprint — min over shingle hashes (1-function MinHash);
# array_min fold, no explode, no shuffle.
# ---------------------------------------------------------------------------

def doc_fingerprint(col: Column) -> Column:
    return F.array_min(F.transform(word_shingles(col), lambda s: md5_hash60(s)))


# ---------------------------------------------------------------------------
# PII detection / redaction — the scrub stage a training-data pipeline
# runs before corpus export. Pure native regexp expressions (JVM-side,
# whole-stage codegen; no UDFs): at 100 TB this is a map-only pass whose
# cost is regex throughput, so the pattern set is deliberately small and
# anchored. Patterns target the high-precision shapes (emails, IPv4,
# 13-19-digit card-like runs, intl/US phone shapes); recall-first
# scrubbing (names, addresses) needs an NER model and is out of scope.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — conservative charset, no quoted locals
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # dotted quad with 1-3 digit octets, word-bounded
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # 13-19 digits with single separators BETWEEN digits (card-shaped;
    # run length checked, not Luhn) — separators are never consumed at
    # the edges, so surrounding spacing survives redaction
    "card": r"\b\d(?:[ \-]?\d){12,18}\b",
    # +country or (area) prefixed groups of 3-5 digits: matches
    # "+91 98765 43210", "555-0123", "(022) 2345 6789"; the 3-digit
    # minimum per group rejects ISO dates like 2026-08-13
    "phone": r"(?:\+\d{1,3}[ \-]?)?(?:\(\d{2,4}\)[ \-]?)?\d{3,5}[ \-]\d{3,5}(?:[ \-]\d{3,5})?",
}


def pii_counts(col: Column) -> Column:
    """struct<email,ipv4,card,phone: int> of match counts — the audit
    signal (how much PII a doc carries) without rewriting text."""
    return F.struct(*[
        F.coalesce(F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))),
                   F.lit(0)).alias(name)
        for name, pat in PII_PATTERNS.items()
    ])


def redact_pii(col: Column, *, token: str = "[PII:{kind}]") -> Column:
    """Replace every PII match with a typed placeholder. Order matters:
    emails before phones (an email's digits must not be phone-chunked),
    cards before phones (a spaced 16-digit run is card-shaped first)."""
    out = col
    for name in ["email", "ipv4", "card", "phone"]:
        out = F.regexp_replace(out, PII_PATTERNS[name],
                               token.format(kind=name))
    return out


def luhn_valid(col: Column) -> Column:
    """True when the digit string in ``col`` (separators stripped, 13-19
    digits) passes the Luhn checksum — turns card-SHAPED matches
    (``PII_PATTERNS['card']``) into card-VALID ones. Pure expression
    fold (sequence + aggregate over the reversed digit string), no UDF:
    stays inside whole-stage codegen like the rest of the scrub pass."""
    digits = F.regexp_replace(col, "[^0-9]", "")
    rev = F.reverse(digits)
    n = F.length(digits)
    d = lambda i: F.substr(rev, i, F.lit(1)).cast("int")      # noqa: E731

    def step(acc, i):
        doubled = d(i) * 2
        return acc + F.when(i % 2 == 0,
                            F.when(doubled > 9, doubled - 9)
                            .otherwise(doubled)).otherwise(d(i))

    total = F.aggregate(F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                        F.lit(0), step)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def strip_markup(col: Column) -> Column:
    """Boilerplate scrub for scraped corpora: drop <script>/<style>
    blocks wholesale, remove remaining tags and HTML comments, decode
    the five core entities, collapse whitespace. Native regexp chain —
    map-only at any scale. (A DOM-accurate extraction needs an HTML
    parser; this is the high-recall regex tier used before tokenizing.)"""
    out = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                    ("&#39;", "'"), ("&amp;", "&")]:   # amp LAST
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))
