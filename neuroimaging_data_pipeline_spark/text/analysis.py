"""Text analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, fingerprinting.

All are pure Column expressions over built-in functions — JVM-side,
codegen-friendly, zero Python in the hot path. At 100 TB of documents
these run as a single narrow pass over the corpus scan (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (public-knowledge common
# words). Deliberately small: the operator is the n-gram/stopword-hit
# *heuristic* scaffold; swap in fuller tables at deployment.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
}

_WORD_SPLIT = r"\s+"


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), _WORD_SPLIT)


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish token estimate: count word-piece-like units via a regex
    split on word boundaries + digits + punctuation runs."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.split(c, r"(?<=\w)(?=\W)|(?<=\W)(?=\w)|\s+")
    return F.size(F.filter(pieces, lambda p: (F.trim(p) != "") & p.isNotNull()))


def punct_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[^\p{Punct}]", "")
    return F.try_divide(F.length(stripped), F.length(c))


def stopword_ratio(text: str | Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords — a standard
    quality signal (natural prose scores high, keyword spam low)."""
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    sw_arr = F.array(*[F.lit(s) for s in sw])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    return F.try_divide(hits, F.size(toks))


def mean_word_length(text: str | Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    return F.try_divide(total, F.size(toks))


def dup_word_frac(text: str | Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier
    word: 1 - distinct/total. The word-level analog of the
    duplicate-line fraction in published repetition filters (Gopher,
    RefinedWeb) — high values flag boilerplate/keyword-stuffed docs.
    Pure column expression (array_distinct), no shuffle."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(toks)), F.size(toks)
    )


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array — i.e.
    the count of the most frequent element — as ONE aggregate pass.

    Deliberately NOT the obvious
    ``transform(array_distinct(a), e -> size(filter(a, x -> x = e)))``:
    Catalyst inlines the array-construction expression into every
    lambda occurrence (no CSE across higher-order functions), turning
    that form into O(distinct x n x cost(build)) per row — measured
    32 s for 5k docs at sf0.1. The sort + single-pass fold is
    O(n log n) with the array built exactly once (sub-second same
    data). NULL init for ``prev`` makes the first element start a run
    of 1 (NULL-safe: x == NULL is NULL, so the when() falls through)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def top_word_frac(text: str | Column) -> Column:
    """Occurrence share of the single most frequent word — the
    top-1-gram fraction repetition signal. Fully JVM-side: sort the
    token array, one fold for the max run length; zero shuffle."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return F.try_divide(_max_run_length(F.array_sort(toks)), F.size(toks))


def word_bigrams(text: str | Column) -> Column:
    """Adjacent-word bigram array ('a b', 'b c', ...), empty for
    single-word docs.

    Pass a pre-materialized token ARRAY column here when combining
    with other token-array consumers (see t_repetition): ``tokens()``
    is a regex split, and Catalyst inlines a non-attribute expression
    into every ``element_at`` lambda occurrence — re-splitting the
    text per element. Against an attribute reference the split runs
    once per row."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return word_bigrams_of(toks)


def word_bigrams_of(toks: Column) -> Column:
    """word_bigrams over an existing token-array column."""
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )


def top_bigram_frac(text: str | Column) -> Column:
    """Occurrence share of the most frequent adjacent-word bigram —
    the top-2-gram repetition signal; catches looped phrases that
    single-word stats miss. Same sort + single-fold shape as
    top_word_frac (see _max_run_length for why)."""
    bgs = word_bigrams(text)
    return F.try_divide(_max_run_length(F.array_sort(bgs)), F.size(bgs))


def quality_score(text: str | Column) -> Column:
    """Composite quality score in [0,1]: rewards prose-like length,
    low punctuation density, stopword presence, sane word lengths.
    Deterministic, oracle-expressible (plain arithmetic)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.coalesce(punct_ratio(c), F.lit(0.0)) * 5.0
    )
    sw_score = F.least(
        F.coalesce(stopword_ratio(c), F.lit(0.0)) * 3.0, F.lit(1.0)
    )
    wl = F.coalesce(mean_word_length(c), F.lit(0.0))
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return (len_score + punct_pen + sw_score + wl_score) / 4.0


# --- tokenize-once variants ---------------------------------------------------
# The regex split is the expensive part of every token-derived signal,
# and Catalyst inlines non-attribute expressions into each consumer
# (see _max_run_length's docstring for the measured cost). When a query
# combines several signals, materialize the token array(s) ONCE as
# attributes and feed these *_of variants. Semantics match the
# text-taking forms exactly: lowercasing per token equals lowercasing
# the text before splitting (Unicode lowercasing never creates or
# removes \s+ boundaries).


def stopword_ratio_of(toks_low: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    sw_arr = F.array(*[F.lit(s) for s in sw])
    hits = F.size(F.filter(toks_low, lambda t: F.array_contains(sw_arr, t)))
    return F.try_divide(hits, F.size(toks_low))


def mean_word_length_of(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    return F.try_divide(total, F.size(toks))


def lang_scores_of(toks_low: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks_low, lambda t: F.array_contains(arr, t)))
    return out


def lang_id_of(toks_low: Column) -> Column:
    scores = lang_scores_of(toks_low)
    langs = sorted(scores)
    mx = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(mx <= 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == mx, F.lit(lang))
    return expr


def quality_score_of(text: Column, toks: Column, toks_low: Column) -> Column:
    """quality_score over pre-materialized token arrays — identical
    arithmetic, the text column only for length/punctuation."""
    n = F.length(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.coalesce(punct_ratio(text), F.lit(0.0)) * 5.0
    )
    sw_score = F.least(
        F.coalesce(stopword_ratio_of(toks_low), F.lit(0.0)) * 3.0, F.lit(1.0)
    )
    wl = F.coalesce(mean_word_length_of(toks), F.lit(0.0))
    wl_score = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return (len_score + punct_pen + sw_score + wl_score) / 4.0


def lang_scores(text: str | Column) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(text: str | Column) -> Column:
    """argmax language with deterministic tie-break: first language (in
    sorted code order) whose score equals the max; 'und' when no marker
    hits at all. Expressed as a when-chain so the exact same CASE is
    writable in ANSI SQL for the oracle."""
    scores = lang_scores(text)
    langs = sorted(scores)
    mx = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(mx <= 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == mx, F.lit(lang))
    return expr


#: PII-surface detectors, deliberately RE2-safe (no lookarounds, no
#: backreferences) so Spark's Java regex and an RE2-based oracle
#: (DuckDB) count the same non-overlapping matches.
PII_PATTERNS: dict[str, str] = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "intl_phones": r"\+\d{7,15}",
}


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-pattern non-overlapping match counts — the redaction-
    triage signal a safety filter runs before training. Pure JVM
    regexp_count columns, zero shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(c, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


#: Replacement tokens per detector; contain no regex-replacement
#: metacharacters ($, \\) and do not themselves match any detector,
#: so redaction is idempotent and order-stable.
PII_PLACEHOLDERS: dict[str, str] = {
    "emails": "<EMAIL>",
    "ipv4": "<IP>",
    "intl_phones": "<PHONE>",
}

#: Redaction ORDER is part of the operator contract: emails first
#: (an email local part may contain '+digits' that the phone pattern
#: would otherwise split), then IPs, then phones. Both engines apply
#: the same order, so redacted text is byte-identical.
PII_REDACTION_ORDER = ["emails", "ipv4", "intl_phones"]


#: C4-style line filters (Raffel et al. 2020, the public C4 cleaning
#: rules): a line survives iff it has >= C4_MIN_WORDS words, ends in
#: terminal punctuation, and contains none of the C4_BANNED markers
#: (the curly brace is the paper's code heuristic). Kept as data so
#: the DuckDB oracle twin applies literally the same constants.
C4_MIN_WORDS = 5
C4_TERMINAL_RE = r'[.!?"]$'
C4_BANNED = ["javascript", "lorem ipsum", "cookie", "policy", "{"]


def c4_keep_lines(lines: Column) -> Column:
    """Filter an array-of-lines column by the C4 rules — one JVM
    higher-order expression (no Python, no shuffle): the line-level
    cleaning pass a web corpus runs before any quality scoring."""
    def keep(line: Column) -> Column:
        low = F.lower(line)
        cond = (
            (F.size(F.split(F.trim(line), r"\s+")) >= C4_MIN_WORDS)
            & (low.rlike(C4_TERMINAL_RE))
        )
        for marker in C4_BANNED:
            cond = cond & ~low.contains(F.lit(marker))
        return cond

    return F.filter(lines, keep)


def pii_redact(text: str | Column) -> Column:
    """REDACT (not just count) PII surface: rewrite every detector
    match to its placeholder token, in PII_REDACTION_ORDER — the
    transform half a corpus release actually ships, twin to
    pii_counts' triage half. A chain of JVM regexp_replace calls:
    narrow, codegen-friendly, zero shuffle, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    for name in PII_REDACTION_ORDER:
        c = F.regexp_replace(
            c, PII_PATTERNS[name], PII_PLACEHOLDERS[name]
        )
    return c


def hash_bucket(
    col: str | Column, n_buckets: int, salt: str = "s42"
) -> Column:
    """Deterministic content-addressed bucket in [0, n_buckets):
    60-bit md5 prefix of (salt:value) mod n. The engine's sampling /
    split primitive — unlike rand()-based sampling it is reproducible
    across engines, runs, and partitionings (the md5-parity discipline
    the MinHash family already uses), so train/eval splits never leak
    rows when a pipeline is re-run."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(int(n_buckets))


def fingerprint(text: str | Column, prefix_len: int = 256) -> Column:
    """Document fingerprint: md5 of the normalized (lowercased,
    whitespace-collapsed) text prefix — the cheap stable content key
    used as the exact-dedup hash and as the shingle base."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(F.substring(norm, 1, prefix_len))


def winnow_fingerprints(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
):
    """Winnowed document fingerprints (Schleimer, Wilkerson, Aiken —
    the MOSS local fingerprinting algorithm): hash every k-gram, then
    for each window of ``w`` consecutive k-gram hashes keep the
    minimum; the DISTINCT kept hashes are the document's fingerprint
    set. Guarantee: any shared run of >= w + k - 1 tokens between two
    documents shares at least one fingerprint — the standard
    plagiarism/near-dup primitive with output density ~2/(w+1).

    Windows are anchored at every gram position and shrink at the tail
    (the last gram is always selected) — a well-defined variant
    mirrored exactly in the DuckDB oracle. Hashes are md5-derived
    60-bit longs (oracle-parity, dedup/minhash.py convention).

    Spark shape: one narrow pass (split -> transform -> posexplode ->
    running window min per doc) + one groupBy doc — no joins, no
    Python. Returns (id, fp) rows, one per selected distinct hash.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = F.split(norm, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    pos = (
        docs.select(F.col(id_col), F.posexplode(grams).alias("i", "gram"))
        .filter(F.col("gram") != "")
        .select(
            id_col,
            "i",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    return (
        pos.select(id_col, F.min("h").over(win).alias("fp"))
        .distinct()
    )
