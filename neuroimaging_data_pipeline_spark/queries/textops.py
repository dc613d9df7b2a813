"""Text-analysis + dedup query surface over ``documents``
(training-data pipeline operators; SURVEY.md engine additions).

Every query here is oracle-checked; the MinHash/SimHash/LSH paths
(md5-parity hashing since r3) live in ``simsearch`` and are
oracle-checked too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.dedup.exact import exact_dedup_keys
from neuroimaging_data_pipeline_spark.sources.tables import read_table
from neuroimaging_data_pipeline_spark.text.analysis import (
    LANG_MARKERS,
    PII_PATTERNS,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    stopword_ratio,
    token_count,
)

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


def t_token_count(spark, sf_dir):
    """Token counts per document: whitespace tokens AND the BPE-ish
    word-piece estimate (maximal runs of word chars or of
    non-word-non-space chars). The Spark side splits on \\w/\\W
    boundaries + whitespace and filters blanks; the oracle counts the
    equivalent maximal runs with RE2-safe ``regexp_extract_all``
    (DuckDB's RE2 has no lookarounds) — same count by construction."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        bpe_ish_token_count,
    )

    return read_table(spark, sf_dir, "documents", min_partitions="cores").select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_ish"),
    )


T_TOKEN_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS INT) AS n_bpe_ish
FROM documents
"""


def t_quality_signals(spark, sf_dir):
    """Quality-scoring signal columns: punctuation ratio, stopword
    ratio, mean word length (rounded for hash parity)."""
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return d.select(
        "doc_id",
        (F.round(F.coalesce(punct_ratio("text"), F.lit(0.0)), 6) + F.lit(0.0)).alias("punct_ratio"),
        (F.round(F.coalesce(stopword_ratio("text"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "stopword_ratio"
        ),
        (F.round(F.coalesce(mean_word_length("text"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "mean_word_len"
        ),
    )


T_QUALITY_SQL = f"""
SELECT doc_id,
  (ROUND(COALESCE(CAST(len(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        / NULLIF(len(text), 0), 0.0), 6) + 0.0) AS punct_ratio,
  (ROUND(COALESCE(CAST(len(list_filter({_TOKS_SQL}, t -> t IN ('the','and','of','to','is'))) AS DOUBLE)
        / NULLIF(len(regexp_split_to_array(trim(text), '\\s+')), 0), 0.0), 6) + 0.0) AS stopword_ratio,
  (ROUND(COALESCE(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> len(t))) AS DOUBLE)
        / NULLIF(len(regexp_split_to_array(trim(text), '\\s+')), 0), 0.0), 6) + 0.0) AS mean_word_len
FROM documents
"""


def t_lang_id(spark, sf_dir):
    """Heuristic language ID via stopword-marker hits."""
    return read_table(spark, sf_dir, "documents", min_partitions="cores").select(
        "doc_id", lang_id("text").alias("lang_pred")
    )


def _lang_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter({_TOKS_SQL}, t -> t IN ({markers})))"


T_LANG_SQL = f"""
WITH scores AS (
  SELECT doc_id,
         {_lang_hits_sql('de')} AS s_de,
         {_lang_hits_sql('en')} AS s_en,
         {_lang_hits_sql('es')} AS s_es,
         {_lang_hits_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id,
  CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
       WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM scores
"""


def t_fingerprint(spark, sf_dir):
    """Content fingerprint (md5 of normalized 256-char prefix)."""
    return read_table(spark, sf_dir, "documents", min_partitions="cores").select(
        "doc_id", fingerprint("text", 256).alias("fp")
    )


T_FP_SQL = f"""
SELECT doc_id, md5(substring({_NORM_SQL}, 1, 256)) AS fp
FROM documents
"""


def d_exact_dedup(spark, sf_dir):
    """Exact dedup groups: content hash -> (kept id, duplicate count)."""
    return exact_dedup_keys(read_table(spark, sf_dir, "documents", min_partitions="cores"))


D_EXACT_SQL = f"""
SELECT md5(substring({_NORM_SQL}, 1, 1000000)) AS content_hash,
       MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY 1
"""


#: Shingles appearing in more documents than this are boilerplate
#: ("terms of service"-class) and are excluded from the Jaccard — in
#: BOTH engines, so the semantics stay oracle-checkable. This is the
#: hot-key ceiling: a shingle with df=n contributes n² rows to the pair
#: join, so without the cap one boilerplate 3-gram floods a single
#: shuffle partition at corpus scale.
NGRAM_DF_CAP = 64


def d_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard over *discriminative* shingles (document
    frequency <= NGRAM_DF_CAP) for document pairs in the same source
    bucket; emits pairs with jaccard >= 0.2.

    The df cap bounds the worst-case join fan-out at df_cap per shingle
    occurrence regardless of corpus size; the hot set (df > cap) is by
    construction tiny (<= n_shingle_rows / cap members), so it is
    removed with a broadcast anti-join — a map-side filter, no extra
    shuffle of the fact table (dedup/ngram.py; flood behavior pinned in
    tests/test_dedup_text.py)."""
    from neuroimaging_data_pipeline_spark.dedup.ngram import ngram_jaccard_pairs

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    pairs = ngram_jaccard_pairs(
        docs, k=3, df_cap=NGRAM_DF_CAP, threshold=0.2, block_col="source"
    )
    return pairs.select(
        "id_a",
        "id_b",
        (F.round("jaccard", 6) + F.lit(0.0)).alias("jaccard"),
    )


D_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array({_NORM_SQL}, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, source, DISTINCT_SHINGLE AS shingle FROM (
    SELECT doc_id, source,
           UNNEST(list_distinct([array_to_string(t[i:i+2], ' ')
                                 for i in generate_series(1, GREATEST(len(t) - 2, 1))])) AS DISTINCT_SHINGLE
    FROM toks
  ) WHERE DISTINCT_SHINGLE <> ''
), kept AS (
  SELECT sh.* FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {NGRAM_DF_CAP}) disc USING (shingle)
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.source = b.source
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       (ROUND(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) + 0.0) AS jaccard
FROM inter
JOIN sizes za ON inter.id_a = za.doc_id
JOIN sizes zb ON inter.id_b = zb.doc_id
WHERE CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter) >= 0.2
"""




def t_entropy(spark, sf_dir):
    """Token-distribution Shannon entropy per document — the unigram
    diversity quality signal (low entropy = repetitive/boilerplate
    text, a standard pretraining-corpus filter). Pure aggregations:
    token counts -> per-doc total -> -sum(p*log2(p))."""
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = d.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    # Log identity H = log2(n) - (sum c*log2 c)/n folds the old
    # counts-join-totals (3 shuffles) into ONE two-level aggregate —
    # no join, no broadcast, 2 exchanges total. The inner sum is an
    # exact decimal sum so partial-agg order can't move the round-6
    # output (w7b lesson).
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum((F.col("c") * F.log2("c")).cast("decimal(28,10)"))
        .cast("double")
        .alias("sclc"),
        F.count(F.lit(1)).alias("n_unique_tokens"),
    )
    return agg.select(
        "doc_id",
        (
            F.round(
                F.log2("n")
                - F.try_divide(F.col("sclc"), F.col("n").cast("double")),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy"),
        "n_unique_tokens",
    )


T_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, tok
  FROM documents,
       UNNEST(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t(tok)
  WHERE tok <> ''
), counts AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
), agg AS (
  SELECT doc_id, SUM(c) AS n,
         CAST(SUM(CAST(c * LOG2(c) AS DECIMAL(28,10))) AS DOUBLE) AS sclc,
         COUNT(*) AS nu
  FROM counts GROUP BY doc_id
)
SELECT doc_id,
       (ROUND(LOG2(n) - sclc / n, 6) + 0.0) AS entropy,
       CAST(nu AS BIGINT) AS n_unique_tokens
FROM agg
"""


def t_winnow(spark, sf_dir):
    """Winnowed fingerprints (MOSS, Schleimer et al. SIGMOD'03) per
    document, summarized: fingerprint-set size, min/max fingerprint,
    and selection density vs gram count (expected ~2/(w+1)).
    text/analysis.py:winnow_fingerprints; fully oracle-checked — the
    window-min selection is plain SQL window functions."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        winnow_fingerprints,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    fps = winnow_fingerprints(d, k=4, w=5)
    grams = d.select(
        "doc_id",
        (
            F.greatest(
                F.size(
                    F.split(
                        F.regexp_replace(
                            F.lower(F.trim(F.col("text"))), r"\s+", " "
                        ),
                        " ",
                    )
                )
                - 4,
                F.lit(0),
            )
            + 1
        ).alias("n_grams"),
    )
    agg = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )
    return agg.join(grams, "doc_id").select(
        "doc_id",
        "n_fps",
        "min_fp",
        "max_fp",
        (
            F.round(
                F.col("n_fps") / F.col("n_grams").cast("double"), 6
            )
            + F.lit(0.0)
        ).alias("density"),
    )


T_WINNOW_SQL = """
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i,
         array_to_string(list_slice(toks, i + 1, i + 4), ' ') AS gram
  FROM base, UNNEST(range(0, greatest(len(toks) - 4, 0) + 1)) AS t(i)
  WHERE array_to_string(list_slice(toks, i + 1, i + 4), ' ') <> ''
), hashed AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
  FROM grams
), wins AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
  FROM hashed
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
         MIN(fp) AS min_fp, MAX(fp) AS max_fp
  FROM fps GROUP BY doc_id
), ng AS (
  SELECT doc_id, greatest(len(toks) - 4, 0) + 1 AS n_grams FROM base
)
SELECT a.doc_id, a.n_fps, a.min_fp, a.max_fp,
       (ROUND(CAST(a.n_fps AS DOUBLE) / ng.n_grams, 6) + 0.0) AS density
FROM agg a JOIN ng USING (doc_id)
"""


def t_repetition(spark, sf_dir):
    """Repetition-based quality filters (the Gopher/RefinedWeb family
    adapted to word level — this corpus has no line structure):
    duplicate-word fraction, top-word occurrence share, top-bigram
    occurrence share. All three are pure nested higher-order column
    expressions (array_distinct + per-distinct-element count + max) —
    JVM-side, zero shuffle, linear scan at 100 TB. The oracle
    recomputes them relationally (UNNEST words/bigrams, GROUP BY,
    MAX) — two entirely different formulations that must agree."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        _max_run_length,
        tokens,
        word_bigrams_of,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    # Materialize the token array ONCE as an attribute: the regex
    # split is expensive and referenced by every signal, and Catalyst
    # only avoids duplicating it across Project boundaries when it is
    # an attribute, not an inline expression (measured 3.2 s -> see
    # PLANS notes) .
    ws = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("ws"))
    arrs = ws.select(
        "doc_id",
        F.size("ws").alias("n"),
        F.size(F.array_distinct("ws")).alias("nd"),
        F.array_sort("ws").alias("sws"),
        F.array_sort(word_bigrams_of(F.col("ws"))).alias("sbgs"),
    )
    return arrs.select(
        "doc_id",
        (
            F.round(
                F.coalesce(
                    F.lit(1.0) - F.try_divide("nd", "n"), F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("dup_word_frac"),
        (
            F.round(
                F.coalesce(
                    F.try_divide(_max_run_length(F.col("sws")), F.col("n")),
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("top_word_frac"),
        (
            F.round(
                F.coalesce(
                    F.try_divide(
                        _max_run_length(F.col("sbgs")), F.size("sbgs")
                    ),
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("top_bigram_frac"),
    )


T_REPETITION_SQL = f"""
WITH base AS (
  SELECT doc_id, {_TOKS_SQL} AS ws FROM documents
), words AS (
  SELECT doc_id, ws[i] AS w
  FROM base, UNNEST(range(1, len(ws) + 1)) AS t(i)
), wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
), wagg AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS topw
  FROM wc GROUP BY doc_id
), bigrams AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
  FROM base, UNNEST(range(1, len(ws))) AS t(i)
), bc AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
), bagg AS (
  SELECT doc_id, SUM(c) AS nb, MAX(c) AS topb FROM bc GROUP BY doc_id
)
SELECT w.doc_id,
       (ROUND(1.0 - nd / CAST(n AS DOUBLE), 6) + 0.0) AS dup_word_frac,
       (ROUND(topw / CAST(n AS DOUBLE), 6) + 0.0) AS top_word_frac,
       (ROUND(COALESCE(topb / CAST(nb AS DOUBLE), 0.0), 6) + 0.0) AS top_bigram_frac
FROM wagg w LEFT JOIN bagg b USING (doc_id)
"""


def e2_corpus_pipeline(spark, sf_dir):
    """E2: the training-corpus preparation flow composed END-TO-END as
    ONE lazy plan — the engine's 'run your whole pipeline' showcase:

      documents
        -> exact dedup, keep the min-id representative per content hash
        -> quality scoring (length / punctuation / stopword / word-len
           composite), keep round(score,6) >= 0.5
        -> heuristic language ID
        -> per-language corpus stats (docs kept, total whitespace
           tokens, mean quality)

    Every stage is the same operator the standalone queries exercise
    (dedup/exact.py, text/analysis.py), so the oracle reuses their
    already-proven SQL twins CTE-by-CTE; the per-language aggregate
    seals the whole flow under one hash check. Plan: scan -> hash-agg
    dedup (one shuffle) -> narrow column expressions -> final partial
    agg; nothing row-Python, nothing driver-side."""
    from neuroimaging_data_pipeline_spark.functions.stats import dec_avg
    from neuroimaging_data_pipeline_spark.text.analysis import (
        lang_id_of,
        quality_score_of,
        tokens,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    keep = exact_dedup_keys(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    kept = docs.join(keep, on="doc_id", how="left_semi")
    # tokenize ONCE (one split + per-token lower), then feed the
    # attributes into every signal — the same Catalyst-inlining trap
    # t_repetition documents (a text-taking signal re-splits the
    # document per consumer, ~7x here)
    base = kept.select(
        "doc_id", "text", tokens(F.col("text")).alias("ws")
    ).withColumn("wl", F.transform(F.col("ws"), lambda t: F.lower(t)))
    scored = base.select(
        "doc_id",
        lang_id_of(F.col("wl")).alias("lang_pred"),
        F.size("ws").alias("n_tokens"),
        F.round(
            quality_score_of(F.col("text"), F.col("ws"), F.col("wl")), 6
        ).alias("q"),
    ).filter(F.col("q") >= 0.5)
    # q is a round-6 fixed-decimal double: dec_avg keeps the rounded
    # mean summation-order-independent (registry INVARIANT; plain avg
    # could flip a boundary case between engines/partitionings)
    return scored.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("n_tokens"),
        (F.round(dec_avg("q"), 6) + F.lit(0.0)).alias("avg_quality"),
    )


_QSCORE_SQL = f"""(
  least(len(text) / 500.0, 1.0)
  + greatest(0.0, 1.0 - COALESCE(CAST(len(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        / NULLIF(len(text), 0), 0.0) * 5.0)
  + least(COALESCE(CAST(len(list_filter({_TOKS_SQL}, t -> t IN ('the','and','of','to','is'))) AS DOUBLE)
        / NULLIF(len(regexp_split_to_array(trim(text), '\\s+')), 0), 0.0) * 3.0, 1.0)
  + CASE WHEN COALESCE(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> len(t))) AS DOUBLE)
        / NULLIF(len(regexp_split_to_array(trim(text), '\\s+')), 0), 0.0) BETWEEN 3.0 AND 10.0
    THEN 1.0 ELSE 0.5 END
) / 4.0"""


E2_PIPE_SQL = f"""
WITH kept AS (
  SELECT * FROM documents
  QUALIFY doc_id = MIN(doc_id) OVER (
    PARTITION BY md5(substring({_NORM_SQL}, 1, 1000000))
  )
), scores AS (
  SELECT doc_id,
         {_lang_hits_sql('de')} AS s_de,
         {_lang_hits_sql('en')} AS s_en,
         {_lang_hits_sql('es')} AS s_es,
         {_lang_hits_sql('fr')} AS s_fr,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         ROUND({_QSCORE_SQL}, 6) AS q
  FROM kept
), scored AS (
  SELECT CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
              WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
              WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
              WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
              ELSE 'fr' END AS lang_pred,
         n_tokens, q
  FROM scores WHERE q >= 0.5
)
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       (ROUND(CAST(SUM(CAST(q AS DECIMAL(28,10))) AS DOUBLE) / COUNT(q), 6) + 0.0) AS avg_quality
FROM scored GROUP BY lang_pred
"""


def t_pii_signals(spark, sf_dir):
    """PII-surface counts per document (emails / IPv4 / intl phone
    shapes) — the redaction-triage filter. Patterns are RE2-safe so
    both engines count identical non-overlapping matches; the pytest
    side proves nonzero counts on planted PII (this corpus is clean,
    so the driver rows are honest zeros)."""
    from neuroimaging_data_pipeline_spark.text.analysis import pii_counts

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    counts = pii_counts("text")
    cols = [counts[k].alias(f"n_{k}") for k in sorted(counts)]
    total = None
    for k in sorted(counts):
        total = counts[k] if total is None else total + counts[k]
    return d.select("doc_id", *cols, total.alias("n_pii_total"))


def _pii_sql_count(pat: str) -> str:
    # DuckDB single-quoted strings do NOT process backslash escapes —
    # embed the regex verbatim (doubling backslashes would turn \d
    # into a literal-backslash-d RE2 atom and the oracle would count 0
    # on real PII, making the twin check vacuous). Only ' needs care.
    esc = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all(text, '{esc}')) AS INT)"


T_PII_SQL = f"""
SELECT doc_id,
       {_pii_sql_count(PII_PATTERNS['emails'])} AS n_emails,
       {_pii_sql_count(PII_PATTERNS['intl_phones'])} AS n_intl_phones,
       {_pii_sql_count(PII_PATTERNS['ipv4'])} AS n_ipv4,
       {_pii_sql_count(PII_PATTERNS['emails'])}
       + {_pii_sql_count(PII_PATTERNS['ipv4'])}
       + {_pii_sql_count(PII_PATTERNS['intl_phones'])} AS n_pii_total
FROM documents
"""


def _plant_pii_col():
    """Deterministic planted PII per document (email always, IPv4 for
    doc_id%3>0, intl phone for even ids) appended to the clean corpus
    text — makes the redaction row NON-vacuous: the md5 below hashes
    text that genuinely went through rewrite, not an identity pass."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact doc"), did.cast("string"), F.lit("@example.com"),
        F.when(
            did % 3 > 0,
            F.concat(F.lit(" from 10."), (did % 200).cast("string"),
                     F.lit(".0.1")),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(F.lit(" tel +9115550"),
                     F.lpad((did % 100000).cast("string"), 5, "0")),
        ).otherwise(F.lit("")),
    )


def t_pii_redact(spark, sf_dir):
    """PII REDACTION per document — the transform twin of
    t_pii_signals' triage counts: every detector match rewritten to
    its placeholder token (<EMAIL>/<IP>/<PHONE>) in the contract
    order emails -> IPs -> phones (text/analysis.py pii_redact).
    Deterministic PII is planted per doc first, so n_pii_before,
    the redacted text's md5 and length, and the zero n_pii_after all
    certify an actual rewrite. Pure JVM regexp_replace chain: one
    narrow pass, zero shuffle, no Python."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        pii_counts,
        pii_redact,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    planted = d.withColumn("_planted", _plant_pii_col())
    red = planted.withColumn("_red", pii_redact(F.col("_planted")))

    def total(col):
        cs = pii_counts(col)
        out = None
        for k in sorted(cs):
            out = cs[k] if out is None else out + cs[k]
        return out

    return red.select(
        "doc_id",
        total(F.col("_planted")).alias("n_pii_before"),
        total(F.col("_red")).alias("n_pii_after"),
        F.length("_red").alias("redacted_len"),
        F.md5(F.col("_red")).alias("redacted_md5"),
    )


def _pii_sql_redact(expr: str) -> str:
    """The DuckDB twin of pii_redact: same patterns, same placeholder
    tokens, same order, global replacement."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        PII_PLACEHOLDERS,
        PII_REDACTION_ORDER,
    )

    for name in PII_REDACTION_ORDER:
        pat = PII_PATTERNS[name].replace("'", "''")
        expr = (
            f"regexp_replace({expr}, '{pat}',"
            f" '{PII_PLACEHOLDERS[name]}', 'g')"
        )
    return expr


_PII_PLANT_SQL = (
    "text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || CASE WHEN doc_id % 3 > 0 THEN ' from 10.' ||"
    " CAST(doc_id % 200 AS VARCHAR) || '.0.1' ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN ' tel +9115550' ||"
    " lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') ELSE '' END"
)


def _pii_sql_count_expr(expr: str, pat: str) -> str:
    esc = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{esc}')) AS INT)"


T_PII_REDACT_SQL = f"""
WITH planted AS (
  SELECT doc_id, {_PII_PLANT_SQL} AS p FROM documents
), red AS (
  SELECT doc_id, p, {_pii_sql_redact('p')} AS r FROM planted
)
SELECT doc_id,
       {_pii_sql_count_expr('p', PII_PATTERNS['emails'])}
       + {_pii_sql_count_expr('p', PII_PATTERNS['ipv4'])}
       + {_pii_sql_count_expr('p', PII_PATTERNS['intl_phones'])}
         AS n_pii_before,
       {_pii_sql_count_expr('r', PII_PATTERNS['emails'])}
       + {_pii_sql_count_expr('r', PII_PATTERNS['ipv4'])}
       + {_pii_sql_count_expr('r', PII_PATTERNS['intl_phones'])}
         AS n_pii_after,
       CAST(LENGTH(r) AS INT) AS redacted_len,
       md5(r) AS redacted_md5
FROM red
"""


def t_c4_line_filters(spark, sf_dir):
    """C4-style line-level cleaning (text/analysis.py c4_keep_lines —
    the published Raffel et al. 2020 rules: >=5 words, terminal
    punctuation, no javascript / lorem ipsum / cookie / policy /
    curly-brace lines). Each document becomes a deterministic "page"
    of 7 candidate lines (the corpus text as a good sentence, plus
    id-keyed decoration lines that each trip exactly one rule), both
    engines build the identical page, and the kept-line set is
    md5-pinned. One JVM higher-order filter expression: no Python,
    no shuffle, page-parallel at any corpus size."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        c4_keep_lines,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    did = F.col("doc_id")
    lines = F.array(
        F.concat(F.col("text"), F.lit(".")),
        F.when(did % 2 == 0, F.lit("too short line.")).otherwise(
            F.lit("this perfectly fine sentence has enough words.")
        ),
        F.when(did % 3 == 0,
               F.lit("please enable javascript to view this page."))
        .otherwise(F.lit("a second good sentence keeps the page alive.")),
        F.when(did % 5 == 0, F.lit("lorem ipsum dolor sit amet consectetur."))
        .otherwise(F.lit("genuine prose continues with more words here.")),
        F.when(did % 4 == 0, F.lit("function f() { return 1; }"))
        .otherwise(F.lit("no code markers appear in this line at all.")),
        F.when(did % 7 == 0,
               F.lit("read our cookie policy before continuing today."))
        .otherwise(F.lit("closing sentence wraps the page up nicely.")),
        F.concat(F.lit("trailing line without terminal punctuation doc "),
                 did.cast("string")),
    )
    kept = c4_keep_lines(lines)
    return d.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        (F.size(kept) >= 4).alias("keep_page"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
    )


def _c4_sql_lines() -> str:
    return """[
      text || '.',
      CASE WHEN doc_id % 2 = 0 THEN 'too short line.'
           ELSE 'this perfectly fine sentence has enough words.' END,
      CASE WHEN doc_id % 3 = 0
           THEN 'please enable javascript to view this page.'
           ELSE 'a second good sentence keeps the page alive.' END,
      CASE WHEN doc_id % 5 = 0
           THEN 'lorem ipsum dolor sit amet consectetur.'
           ELSE 'genuine prose continues with more words here.' END,
      CASE WHEN doc_id % 4 = 0 THEN 'function f() { return 1; }'
           ELSE 'no code markers appear in this line at all.' END,
      CASE WHEN doc_id % 7 = 0
           THEN 'read our cookie policy before continuing today.'
           ELSE 'closing sentence wraps the page up nicely.' END,
      'trailing line without terminal punctuation doc '
        || CAST(doc_id AS VARCHAR)
    ]"""


T_C4_SQL = f"""
WITH pages AS (
  SELECT doc_id, {_c4_sql_lines()} AS lines FROM documents
), kept AS (
  SELECT doc_id, lines,
         list_filter(lines, x ->
           len(regexp_split_to_array(trim(x), '\\s+')) >= 5
           AND regexp_matches(lower(x), '[.!?"]$')
           AND NOT contains(lower(x), 'javascript')
           AND NOT contains(lower(x), 'lorem ipsum')
           AND NOT contains(lower(x), 'cookie')
           AND NOT contains(lower(x), 'policy')
           AND NOT contains(lower(x), '{{')
         ) AS keep
  FROM pages
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(keep) AS INT) AS n_kept,
       (len(keep) >= 4) AS keep_page,
       md5(list_aggregate(keep, 'string_agg', chr(10))) AS clean_md5
FROM kept
"""


def t_sample(spark, sf_dir):
    """Deterministic 1-in-10 corpus sample via content-addressed
    hash buckets (text/analysis.py hash_bucket) — reproducible across
    engines/runs/partitionings, unlike rand() sampling; the primitive
    behind leak-free train/eval splits. Keeps bucket 0 of 10."""
    from neuroimaging_data_pipeline_spark.text.analysis import hash_bucket

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return d.select(
        "doc_id", hash_bucket("doc_id", 10).alias("bucket")
    ).filter(F.col("bucket") == 0)


T_SAMPLE_SQL = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 10 AS bucket
  FROM documents
)
SELECT doc_id, bucket FROM b WHERE bucket = 0
"""


def d_passage_dedup(spark, sf_dir):
    """Passage-level dedup (dedup/passage.py): CCNet/RefinedWeb-style
    sub-document dedup — consecutive 10-word passages are hashed,
    first occurrence corpus-wide wins (ordered by (doc_id, idx)), and
    each document reports how many of its passages/words survive.
    Unlike whole-document dedup this strips repeated boilerplate
    spans while keeping the unique remainder. The shuffle carries
    only (md5, doc_id, idx); the keep choice is a min-struct
    aggregate (map-side partial), not a corpus-wide window."""
    from neuroimaging_data_pipeline_spark.dedup.passage import (
        passage_dedup_stats,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return passage_dedup_stats(d).select(
        "doc_id", "n_passages", "n_kept", "n_words_kept"
    )


D_PASSAGE_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '),
                     x -> x <> '') AS ws
  FROM documents
), p AS (
  SELECT doc_id, i.i AS passage_idx,
         array_to_string(ws[i.i * 10 + 1 : i.i * 10 + 10], ' ') AS passage
  FROM w, UNNEST(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i(i)
  WHERE len(ws) > 0
), h AS (
  SELECT doc_id, passage_idx, md5(passage) AS passage_hash,
         len(string_split(passage, ' ')) AS n_words
  FROM p
), f AS (
  -- linearized (doc_id, passage_idx) key: the 1e9 multiplier keeps
  -- it lexicographic as long as a document has < 1e9 passages
  -- (~1e10 words — physically impossible); the Spark side uses a
  -- true struct-min
  SELECT passage_hash,
         MIN(doc_id * 1000000000 + passage_idx) AS first_key
  FROM h GROUP BY passage_hash
), v AS (
  SELECT h.doc_id, h.n_words,
         (h.doc_id * 1000000000 + h.passage_idx = f.first_key) AS kept
  FROM h JOIN f USING (passage_hash)
), s AS (
  SELECT doc_id,
         COUNT(*) AS n_passages,
         SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
         SUM(CASE WHEN kept THEN n_words ELSE 0 END) AS n_words_kept
  FROM v GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_passages, 0) AS BIGINT) AS n_passages,
       CAST(COALESCE(s.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(s.n_words_kept, 0) AS BIGINT) AS n_words_kept
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


def t_tfidf(spark, sf_dir):
    """Corpus-level TF-IDF: the keyword-extraction / relevance-scoring
    primitive. Terms are lowercased whitespace tokens; tf = raw count
    per (doc, term); df = number of docs containing the term (the tf
    table is already distinct per (doc, term), so df is a plain count
    — no countDistinct shuffle); idf = ln((N+1)/(df+1)) + 1 with N
    from a broadcast 1-row aggregate (stays lazy, no driver action).
    Top-3 terms per doc selected by the INTEGER ordering (tf desc,
    df asc, term asc) — rarity-broken and engine-deterministic, no
    float-rank flips from last-ulp ln() differences; the float score
    is emitted round-6 like every transcendental in this repo.

    Scale: explode is JVM-side codegen; two hash aggs (map-side
    partial) + one equi-join on term (AQE skew-safe); the per-doc
    top-3 window partitions by doc_id — millions of small groups, no
    global sort."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
        lambda w: w != "",
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df_t").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df_t",
            "rank",
            (
                F.round(
                    F.col("tf")
                    * (
                        F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0))
                        + 1.0
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("score"),
        )
    )


T_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, t.term AS term
  FROM documents,
       UNNEST(list_filter(string_split(lower(COALESCE(text, '')), ' '),
                          x -> x <> '')) AS t(term)
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfreq.df_t ASC, tf.term ASC
         ) AS rank,
         tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df_t + 1.0)) + 1.0) AS raw
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term,
       CAST(tf AS BIGINT) AS tf,
       CAST(df_t AS BIGINT) AS df_t,
       CAST(rank AS INT) AS rank,
       (ROUND(raw, 6) + 0.0) AS score
FROM ranked WHERE rank <= 3
"""


def d_fuzzy_pairs(spark, sf_dir):
    """Fuzzy near-duplicate pairs by bounded edit distance
    (dedup/fuzzy.py): blocked (length-bucket, prefix) self-join with
    a flood cap, JVM-side levenshtein on 48-char normalized prefixes,
    pairs at distance <= 8. Catches the OCR/typo/template-drift
    near-dups whose single-character edits break every shingle that
    token-set MinHash relies on. Both engines run the textbook DP
    levenshtein, so the oracle recomputes distances exactly."""
    from neuroimaging_data_pipeline_spark.dedup.fuzzy import fuzzy_pairs

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return fuzzy_pairs(d, max_dist=8)


D_FUZZY_SQL = """
WITH base AS (
  SELECT doc_id AS _id,
         regexp_replace(lower(trim(COALESCE(text, ''))), '\\s+', ' ', 'g')
           AS _norm
  FROM documents
), b AS (
  SELECT _id,
         substr(_norm, 1, 48) AS _prefix,
         CAST(len(_norm) // 16 AS INT) AS lb,
         substr(_norm, 1, 12) AS pfx
  FROM base
), ok AS (
  SELECT lb, pfx FROM b GROUP BY lb, pfx
  HAVING COUNT(*) > 1 AND COUNT(*) <= 64
), blocked AS (
  SELECT b._id, b._prefix, b.lb, b.pfx FROM b JOIN ok USING (lb, pfx)
)
SELECT DISTINCT a._id AS id_a, c._id AS id_b,
       CAST(levenshtein(a._prefix, c._prefix) AS INT) AS dist
FROM blocked a
JOIN blocked c ON a.lb = c.lb AND a.pfx = c.pfx AND a._id < c._id
WHERE levenshtein(a._prefix, c._prefix) <= 8
"""


def e8_entity_resolution(spark, sf_dir):
    """E8 — entity resolution as ONE composed plan: two independent
    evidence channels produce candidate same-entity edges — exact
    normalized-content-hash groups (the cheap channel) and bounded
    edit-distance fuzzy pairs (the OCR/typo channel, blocked +
    flood-capped) — their union feeds hash-min connected components,
    and every document gets a transitive entity label. This is the
    canonical record-linkage shape (block -> match -> cluster), and
    the transitive step is what pairwise dedup outputs cannot give:
    A~B (exact) and B~C (fuzzy) must land A, C in one entity. Oracle:
    the same two edge channels as SQL subqueries, symmetrized, then
    transitive closure via WITH RECURSIVE + MIN(label)."""
    from neuroimaging_data_pipeline_spark.dedup.cluster import (
        connected_components,
    )
    from neuroimaging_data_pipeline_spark.dedup.fuzzy import fuzzy_pairs

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    h = d.select(
        "doc_id",
        F.md5(F.substring(_norm_col(), 1, 1000000)).alias("_h"),
    )
    keep = h.groupBy("_h").agg(F.min("doc_id").alias("_keep"))
    exact_edges = (
        h.join(keep, "_h")
        .filter(F.col("doc_id") != F.col("_keep"))
        .select(F.col("_keep").alias("src"), F.col("doc_id").alias("dst"))
    )
    fz = fuzzy_pairs(d, max_dist=8).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    edges = exact_edges.unionByName(fz)
    cc = connected_components(
        d.select("doc_id"), edges, id_col="doc_id"
    )
    return cc.select(F.col("id").alias("doc_id"), F.col("cluster_id").alias("entity_id"))


def _norm_col():
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


E8_SQL = f"""
WITH RECURSIVE fz AS (
  SELECT id_a AS src, id_b AS dst FROM (
{{fuzzy_body}}
  )
), ex AS (
  SELECT k._keep AS src, h.doc_id AS dst FROM (
    SELECT doc_id, md5(substring({_NORM_SQL}, 1, 1000000)) AS _h
    FROM documents
  ) h JOIN (
    SELECT _h, MIN(doc_id) AS _keep FROM (
      SELECT doc_id, md5(substring({_NORM_SQL}, 1, 1000000)) AS _h
      FROM documents
    ) GROUP BY _h
  ) k USING (_h)
  WHERE h.doc_id <> k._keep
), edges AS (
  SELECT src AS s, dst AS d FROM ex UNION ALL SELECT dst, src FROM ex
  UNION ALL
  SELECT src, dst FROM fz UNION ALL SELECT dst, src FROM fz
), reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id, MIN(lbl) AS entity_id FROM reach GROUP BY id
"""
E8_SQL = E8_SQL.replace("{fuzzy_body}", D_FUZZY_SQL.strip())


def d_contamination(spark, sf_dir):
    """Benchmark-contamination report (dedup/contamination.py): the
    n-gram collision check every LLM data pipeline runs before
    training — docs 0..9 stand in for an evaluation set, and every
    OTHER document reports how many of its distinct 8-word shingles
    appear in that probe set. The probe's shingle set broadcasts
    (benchmarks are small by definition), so the check is one
    linear pass + one aggregate shuffle regardless of corpus size."""
    from neuroimaging_data_pipeline_spark.dedup.contamination import (
        contamination_overlap,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    probe = d.filter(F.col("doc_id") < 10)
    train = d.filter(F.col("doc_id") >= 10)
    return contamination_overlap(train, probe, k=8)


D_CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS t
  FROM documents
), sh AS (
  SELECT doc_id, S AS shingle FROM (
    SELECT doc_id,
           UNNEST(list_distinct([array_to_string(t[i:i+7], ' ')
                                 for i in generate_series(1, GREATEST(len(t) - 7, 1))])) AS S
    FROM toks
  ) WHERE S <> ''
), probe AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id < 10
), train AS (
  SELECT * FROM sh WHERE doc_id >= 10
), totals AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
), hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hits
  FROM train t JOIN probe p ON t.shingle = p.shingle
  GROUP BY t.doc_id
)
SELECT totals.doc_id,
       CAST(totals.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       (ROUND(COALESCE(hits.n_hits, 0) / CAST(totals.n_shingles AS DOUBLE), 6) + 0.0)
         AS overlap_frac
FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
"""


def t_bigram_xent(spark, sf_dir):
    """Per-document cross-entropy under the CORPUS's own word-bigram
    model — the KenLM-style fluency/quality signal (high = the doc's
    word transitions are unusual for the corpus; the perplexity
    filter's core). MLE probabilities P(w2|w1) = C(w1,w2)/C(w1,*)
    from the full corpus (every observed doc bigram has positive
    probability by construction, so no smoothing is needed for
    finiteness); per-doc score = -mean ln P over the doc's bigram
    OCCURRENCES (multiplicities kept).

    Scale: one bigram explode (JVM-side), two map-side-partial count
    aggregates for the model (computed CONCURRENTLY from the same
    exploded scan), one equi-join of doc bigrams against the model
    (AQE-skew-safe — 'of the' is a hot key; at bench SFs the model
    side is small enough that AQE turns this into a broadcast join on
    its own), one per-doc aggregate with decimal-exact log sums.

    r6 A/B (VERDICT r5 #4, interleaved same-session at sf0.1, 6 runs
    each): THIS plan median 1.15 s (1.02–1.49); a reshaped variant
    deriving C(w1,*) from pair counts with the log precomputed on the
    distinct-bigram model table median 1.37 s — the reshape removes
    an occurrence-scale w1 aggregate but serializes the stage chain,
    and with the model tiny relative to occurrences the parallel
    aggregates win. The r5 driver reading of 2.14 s does not
    reproduce on the unchanged plan (r4 driver: 1.40 s): harness
    variance, discharged."""
    from neuroimaging_data_pipeline_spark.functions.stats import dec_sum

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    bg = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .filter(F.col("bg").contains(" "))
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
    )
    pair_c = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_c = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    return (
        bg.join(pair_c, "bg")
        .join(w1_c, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.round(
                    -F.try_divide(
                        dec_sum(
                            F.log(
                                F.col("c_bg") / F.col("c_w1").cast("double")
                            )
                        ),
                        F.count(F.lit(1)).cast("double"),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("xent"),
        )
    )


T_BIGRAM_XENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, B AS bg, string_split(B, ' ')[1] AS w1 FROM (
    SELECT doc_id,
           UNNEST([array_to_string(t[i:i+1], ' ')
                   for i in generate_series(1, GREATEST(len(t) - 1, 1))]) AS B
    FROM toks
  ) WHERE contains(B, ' ')
), pair_c AS (
  SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg
), w1_c AS (
  SELECT w1, COUNT(*) AS c_w1 FROM bg GROUP BY w1
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       (ROUND(-(CAST(SUM(CAST(ln(pair_c.c_bg / CAST(w1_c.c_w1 AS DOUBLE))
                              AS DECIMAL(28,10))) AS DOUBLE))
              / COUNT(*), 6) + 0.0) AS xent
FROM bg
JOIN pair_c USING (bg)
JOIN w1_c USING (w1)
GROUP BY bg.doc_id
"""


def t_kn_bigram(spark, sf_dir):
    """Per-document cross-entropy under an interpolated KNESER-NEY
    bigram model trained on the corpus itself — the smoothing KenLM
    actually ships (t_bigram_xent is the MLE baseline; KN replaces
    raw frequency with absolute discounting plus a CONTINUATION
    distribution, so words that appear in many contexts get backoff
    mass even when a specific transition is rare):

      P(w|v) = (c(vw) - D)/c(v) + (D * N1+(v.)/c(v)) * N1+(.w)/T

    with D = 0.75, N1+(v.) = distinct continuations of v, N1+(.w) =
    distinct contexts of w, T = distinct bigram types. Training and
    scoring share the corpus, so every scored bigram has c(vw) >= 1
    and the discounted term stays positive; the continuation term is
    exercised on every evaluation. Both engines compute P with the
    IDENTICAL operation order (same IEEE doubles in, same bits out),
    and per-doc log sums use the decimal-exact discipline.

    Scale: one bigram explode; the model-side joins (pair counts x
    context stats) run at bigram-TYPE scale; ONE fact-to-model
    equi-join at occurrence scale (AQE-skew-safe, same shape as
    t_bigram_xent); T rides a broadcast single-row aggregate. r7 A/B
    (interleaved same-session at sf0.1, 4 runs each): c(v) derived as
    SUM(c_bg) from the type-scale pair table (chained) median 2.90 s
    vs a parallel occurrence-scale w1 aggregate 3.12 s — KN must
    chain through pair_c for N1+(v.) anyway, so unlike t_bigram_xent
    (whose r6 A/B kept parallel aggregates) the chained form is
    strictly less work here."""
    from neuroimaging_data_pipeline_spark.functions.stats import dec_sum

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    bg = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .filter(F.col("bg").contains(" "))
    )
    pair_c = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .withColumn("w2", F.split(F.col("bg"), " ")[1])
    )
    # r14 (guide §1.2 "remove unnecessary passes"): pair_c feeds FOUR
    # consumers (w1_stats, n1_bwd, types, the model join) and Catalyst
    # does not share the subtree across join branches — the committed
    # r13 plan re-scanned and re-exploded the corpus five times for
    # one logical tokenize. Persisting the TYPE-scale pair table (931
    # rows at sf0.1; always |types| <= |occurrences|) cuts the query
    # to two corpus passes (model build + scoring probe), the same
    # mid-plan-reuse discipline as dedup/minhash.py.
    from pyspark import StorageLevel

    pair_c = pair_c.persist(StorageLevel.MEMORY_AND_DISK)
    # c(v) = sum_w c(vw) and N1+(v.) come from ONE type-scale
    # aggregate over the pair table — no second occurrence-scale
    # shuffle (unlike t_bigram_xent, whose A/B kept the parallel
    # occurrence aggregates, the KN model must touch pair_c anyway)
    w1_stats = pair_c.groupBy("w1").agg(
        F.sum("c_bg").alias("c_w1"), F.count(F.lit(1)).alias("n1f")
    )
    n1_bwd = pair_c.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = pair_c.agg(F.count(F.lit(1)).alias("t_types"))
    model = (
        pair_c.join(w1_stats, "w1")
        .join(n1_bwd, "w2")
        .crossJoin(F.broadcast(types))
    )
    dd = F.lit(0.75)
    p_kn = (
        (F.col("c_bg").cast("double") - dd)
        / F.col("c_w1").cast("double")
        + (dd * F.col("n1f").cast("double") / F.col("c_w1").cast("double"))
        * (F.col("n1b").cast("double") / F.col("t_types").cast("double"))
    )
    # r14: force the TYPE-scale model to be the broadcast build side.
    # Catalyst's estimate for the 3-join model chain is far above the
    # post-explode bg estimate, so it was broadcasting the OCCURRENCE
    # side (BuildLeft, 265k rows / 931 distinct keys at sf0.1) — a
    # duplicate-chained HashedRelation whose build cost scales with
    # corpus size and whose driver-heap footprint made this query the
    # slowest text row under full-suite heap pressure (6.1 s in-suite
    # vs 2.4 s isolated). The model is bigram-TYPE scale — strictly
    # smaller than the occurrence side at any corpus size — the same
    # model-broadcast decision nbayes/tfidf already make explicitly.
    scored = bg.join(F.broadcast(model.select("bg", p_kn.alias("p"))), "bg")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.round(
                -F.try_divide(
                    dec_sum(F.log(F.col("p"))),
                    F.count(F.lit(1)).cast("double"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("xent_kn"),
    )


T_KN_BIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, B AS bg FROM (
    SELECT doc_id,
           UNNEST([array_to_string(t[i:i+1], ' ')
                   for i in generate_series(1, GREATEST(len(t) - 1, 1))]) AS B
    FROM toks
  ) WHERE contains(B, ' ')
), pair_c AS (
  SELECT bg, COUNT(*) AS c_bg,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2
  FROM bg GROUP BY bg
), w1_stats AS (
  SELECT w1, SUM(c_bg) AS c_w1, COUNT(*) AS n1f FROM pair_c GROUP BY w1
), n1_bwd AS (
  SELECT w2, COUNT(*) AS n1b FROM pair_c GROUP BY w2
), model AS (
  SELECT pair_c.bg,
         (CAST(c_bg AS DOUBLE) - 0.75) / CAST(c_w1 AS DOUBLE)
         + (0.75 * CAST(n1f AS DOUBLE) / CAST(c_w1 AS DOUBLE))
         * (CAST(n1b AS DOUBLE)
            / CAST((SELECT COUNT(*) FROM pair_c) AS DOUBLE)) AS p
  FROM pair_c
  JOIN w1_stats USING (w1)
  JOIN n1_bwd USING (w2)
)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       (ROUND(-(CAST(SUM(CAST(ln(model.p) AS DECIMAL(28,10))) AS DOUBLE))
              / COUNT(*), 6) + 0.0) AS xent_kn
FROM bg JOIN model USING (bg)
GROUP BY bg.doc_id
"""


def d_url_dedup(spark, sf_dir):
    """URL-canonicalization dedup (text/urls.py) — the first dedup
    pass of a crawl pipeline: the same resource hides behind case,
    default ports, utm_* tracking params, parameter order, fragments
    and trailing slashes; canonicalize, then hash-group on the
    canonical key. Map-only string expressions + one partial-agg
    shuffle on the canonical URL.

    The fixture builds adversarial URLs from doc_id formulas (each
    rule exercised); BOTH engines canonicalize independently — the
    engine with text/urls.py column expressions, the oracle with
    DuckDB string/list functions — so the rules themselves are what
    is being matched, not a shared implementation."""
    from neuroimaging_data_pipeline_spark.text.urls import canonical_url

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    n = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    scheme = (
        F.when(n % 3 == 0, "HTTP").when(n % 3 == 1, "https").otherwise("HtTpS")
    )
    host = F.when(
        n % 2 == 0,
        F.concat(F.lit("WWW.SITE"), s(n % 40), F.lit(".ORG")),
    ).otherwise(F.concat(F.lit("www.site"), s(n % 40), F.lit(".org")))
    port = (
        F.when(n % 5 == 0, ":443")
        .when(n % 5 == 1, ":80")
        .when(n % 5 == 2, ":8080")
        .otherwise("")
    )
    path = (
        F.when(n % 4 == 0, F.concat(F.lit("/a/b"), s(n % 7), F.lit("/")))
        .when(n % 4 == 1, F.concat(F.lit("/a/b"), s(n % 7)))
        .when(n % 4 == 2, "")
        .otherwise("/")
    )
    query = (
        F.when(
            n % 3 == 0,
            F.concat(F.lit("?utm_source=tw&id="), s(n % 9), F.lit("&ref=x")),
        )
        .when(n % 3 == 1, F.concat(F.lit("?ref=x&id="), s(n % 9)))
        .otherwise("")
    )
    frag = F.when(n % 2 == 0, "#frag").otherwise("")
    url = F.concat(scheme, F.lit("://"), host, port, path, query, frag)
    return (
        d.select("doc_id", canonical_url(url).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_id"),
        )
    )


D_URL_SQL = """
WITH u AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'HtTpS' END)
    || '://' ||
    (CASE doc_id % 2 WHEN 0 THEN 'WWW.SITE' || CAST(doc_id % 40 AS VARCHAR) || '.ORG'
                     ELSE 'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.org' END)
    || (CASE doc_id % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
                        WHEN 2 THEN ':8080' ELSE '' END)
    || (CASE doc_id % 4 WHEN 0 THEN '/a/b' || CAST(doc_id % 7 AS VARCHAR) || '/'
                        WHEN 1 THEN '/a/b' || CAST(doc_id % 7 AS VARCHAR)
                        WHEN 2 THEN '' ELSE '/' END)
    || (CASE doc_id % 3 WHEN 0 THEN '?utm_source=tw&id=' || CAST(doc_id % 9 AS VARCHAR) || '&ref=x'
                        WHEN 1 THEN '?ref=x&id=' || CAST(doc_id % 9 AS VARCHAR)
                        ELSE '' END)
    || (CASE doc_id % 2 WHEN 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
), s1 AS (
  SELECT doc_id, regexp_replace(url, '#.*', '') AS nofrag FROM u
), s2 AS (
  SELECT doc_id,
         lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM s1
), s3 AS (
  SELECT *,
         split_part(split_part(rest, '/', 1), '?', 1) AS hostport,
         substr(rest, len(split_part(split_part(rest, '/', 1), '?', 1)) + 1) AS pathq
  FROM s2
), s4 AS (
  SELECT *,
         lower(split_part(hostport, ':', 1)) AS host,
         CASE WHEN contains(hostport, ':')
              THEN split_part(hostport, ':', 2) ELSE '' END AS port,
         split_part(pathq, '?', 1) AS path,
         CASE WHEN contains(pathq, '?')
              THEN substr(pathq, len(split_part(pathq, '?', 1)) + 2)
              ELSE '' END AS query
  FROM s3
), s5 AS (
  SELECT doc_id, scheme, host,
         CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                   OR (scheme = 'http' AND port = '80')
              THEN '' ELSE ':' || port END AS portpart,
         CASE WHEN regexp_replace(path, '/+$', '') = ''
              THEN '/' ELSE regexp_replace(path, '/+$', '') END AS pathn,
         list_sort(list_filter(string_split(query, '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS params
  FROM s4
), canon AS (
  SELECT doc_id,
         scheme || '://' || host || portpart || pathn ||
         CASE WHEN len(params) > 0
              THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
  FROM s5
)
SELECT canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       MIN(doc_id) AS keep_id
FROM canon GROUP BY canon_url
"""


def e6_decontam_split(spark, sf_dir):
    """E6: leak-free train/eval split assembled end-to-end as ONE
    lazy plan — the step every LLM data pipeline must run before a
    benchmark number can be trusted:

      documents
        -> deterministic 10% eval split (content-addressed md5
           bucket, the t_sample primitive — never rand())
        -> decontaminate train: drop any training doc sharing an
           8-word shingle with the eval side (the d_contamination
           machinery, probe = the eval split itself)
        -> per-source report: eval size, kept/dropped train docs,
           surviving token budget.

    Scale: the split is map-only; eval's distinct shingle set
    broadcasts (10% split of benchmark-ish size); the flagged-id
    anti-join is id-keyed fact-to-fact (a contaminated set is a
    corpus fraction in the worst case — same declared-SMJ class as
    the other keep-set joins); stats are per-source dims."""
    from neuroimaging_data_pipeline_spark.dedup.contamination import (
        contamination_overlap,
    )
    from neuroimaging_data_pipeline_spark.text.analysis import hash_bucket

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    b = d.withColumn("bucket", hash_bucket("doc_id", 10))
    ev = b.filter(F.col("bucket") == 0)
    tr = b.filter(F.col("bucket") != 0)
    flagged = (
        contamination_overlap(tr, ev, k=8)
        .filter(F.col("n_hits") > 0)
        .select("doc_id")
    )
    kept = tr.join(flagged, "doc_id", "left_anti")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    kept_stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train_kept"),
        F.sum(F.size(F.split(norm, " ")).cast("long")).alias("kept_tokens"),
    )
    dropped = (
        tr.join(flagged, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_train_dropped"))
    )
    eval_stats = ev.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_eval")
    )
    spine = d.select("source").distinct()
    return (
        spine.join(F.broadcast(eval_stats), "source", "left")
        .join(F.broadcast(kept_stats), "source", "left")
        .join(F.broadcast(dropped), "source", "left")
        .na.fill(
            {
                "n_eval": 0,
                "n_train_kept": 0,
                "kept_tokens": 0,
                "n_train_dropped": 0,
            }
        )
    )


E6_SQL = f"""
WITH b AS (
  SELECT doc_id, source, text,
         CAST(('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 10 AS bucket
  FROM documents
), toks AS (
  SELECT doc_id, bucket, regexp_split_to_array({_NORM_SQL}, ' ') AS t FROM b
), sh AS (
  SELECT doc_id, bucket, S AS shingle FROM (
    SELECT doc_id, bucket,
           UNNEST(list_distinct([array_to_string(t[i:i+7], ' ')
                                 for i in generate_series(1, GREATEST(len(t) - 7, 1))])) AS S
    FROM toks
  ) WHERE S <> ''
), probe AS (
  SELECT DISTINCT shingle FROM sh WHERE bucket = 0
), flagged AS (
  SELECT DISTINCT s.doc_id
  FROM sh s JOIN probe p ON s.shingle = p.shingle
  WHERE s.bucket <> 0
), tr AS (
  SELECT * FROM b WHERE bucket <> 0
), kept AS (
  SELECT t.* FROM tr t
  WHERE t.doc_id NOT IN (SELECT doc_id FROM flagged)
), kept_stats AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_train_kept,
         CAST(SUM(len(regexp_split_to_array({_NORM_SQL}, ' '))) AS BIGINT)
           AS kept_tokens
  FROM kept GROUP BY source
), dropped AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_dropped
  FROM tr WHERE doc_id IN (SELECT doc_id FROM flagged)
  GROUP BY source
), eval_stats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_eval
  FROM b WHERE bucket = 0 GROUP BY source
), spine AS (
  SELECT DISTINCT source FROM b
)
SELECT spine.source,
       COALESCE(eval_stats.n_eval, 0) AS n_eval,
       COALESCE(kept_stats.n_train_kept, 0) AS n_train_kept,
       COALESCE(kept_stats.kept_tokens, 0) AS kept_tokens,
       COALESCE(dropped.n_train_dropped, 0) AS n_train_dropped
FROM spine
LEFT JOIN eval_stats ON spine.source = eval_stats.source
LEFT JOIN kept_stats ON spine.source = kept_stats.source
LEFT JOIN dropped ON spine.source = dropped.source
"""


def d_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup report (dedup/cdc.py): chunk
    boundaries chosen by a window-content hash (md5-parity, 16-char
    window, divisor 64) so an insertion only disturbs the chunks it
    touches — the shift-resistant complement to fixed-stride passage
    dedup (the rsync/LBFS principle). Per doc: chunk count, mean
    chunk length, and how many chunks are corpus-unique. Chunking is
    map-only; the single shuffle is the chunk-frequency aggregate on
    compact (md5, count) pairs."""
    from neuroimaging_data_pipeline_spark.dedup.cdc import cdc_dedup_stats

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return cdc_dedup_stats(d)


D_CDC_SQL = f"""
WITH dd AS (
  SELECT doc_id, {_NORM_SQL} AS s, len({_NORM_SQL}) AS L
  FROM documents WHERE len({_NORM_SQL}) > 0
), cutl AS (
  SELECT doc_id, s, L,
         list_sort(list_distinct(list_append(
           list_filter(
             [CASE WHEN CAST(('0x' || substr(md5(substr(s, i, 16)), 1, 4))
                        AS BIGINT) % 64 = 0
                   THEN i + 15 ELSE -1 END
              for i in generate_series(1, GREATEST(L - 15, 0))],
             x -> x <> -1),
           L))) AS ends
  FROM dd
), chunks AS (
  SELECT doc_id, k.k AS chunk_idx,
         substr(s,
                CASE WHEN k.k = 0 THEN 1 ELSE ends[k.k] + 1 END,
                ends[k.k + 1]
                  - (CASE WHEN k.k = 0 THEN 1 ELSE ends[k.k] + 1 END) + 1
         ) AS chunk
  FROM cutl, UNNEST(range(0, len(ends))) AS k(k)
), h AS (
  SELECT doc_id, md5(chunk) AS chunk_md5, len(chunk) AS chunk_len
  FROM chunks
), freq AS (
  SELECT chunk_md5, COUNT(*) AS n_occ FROM h GROUP BY chunk_md5
)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       (ROUND(AVG(h.chunk_len), 6) + 0.0) AS avg_chunk_len,
       CAST(SUM(CASE WHEN freq.n_occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corpus_unique
FROM h JOIN freq ON h.chunk_md5 = freq.chunk_md5
GROUP BY h.doc_id
"""


def t_inverted_index(spark, sf_dir):
    """Inverted-index build — the retrieval-infrastructure artifact
    BM25/keyword search reads at query time: per term, its document
    frequency, total term frequency, and the top-3 posting entries by
    (tf desc, doc_id asc). Restricted to terms with df >= 50 so the
    output is the dictionary HEAD (the part that matters for caching;
    the full index is the same plan without the filter). Shape: one
    tokenize explode, one (term, doc) count aggregate with map-side
    partials, one per-term window for the posting head — all on
    compact (term, doc_id, tf) triples."""
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    from pyspark.sql import Window

    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    head = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    return (
        head.join(stats, "term")
        .filter(F.col("df") >= 50)
        .select("term", "df", "total_tf", "rank", "doc_id", "tf")
    )


T_INVIDX_SQL = f"""
WITH toks AS (
  SELECT doc_id, w.w AS term
  FROM documents, UNNEST(string_split({_NORM_SQL}, ' ')) AS w(w)
  WHERE w.w <> ''
), tf AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
), stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM tf GROUP BY term
), head AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id ASC
         ) AS rank
  FROM tf
)
SELECT h.term, s.df, s.total_tf, CAST(h.rank AS INT) AS rank,
       h.doc_id, h.tf
FROM head h JOIN stats s USING (term)
WHERE h.rank <= 3 AND s.df >= 50
"""


def _gen_pages(d):
    """Deterministic raw-HTML pages from ``documents`` — the shared
    fixture generator for t_html_extract and e9_web_pipeline (the
    DuckDB twin is _HTML_GEN_CTES). Markup noise per page: a script
    (with the doc id inside — stripped content must not leak it), a
    style block, a comment, entity-escaped body text; every 5th doc a
    nav link-farm, every 3rd a related-link paragraph, every 7th a
    truncated body. All VISIBLE text is either the escaped body or
    constant strings, so two docs with equal text and equal modulo
    classes extract to equal clean text (what exact dedup keys on)."""
    sid = F.col("doc_id").cast("string")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    body = F.when(F.col("doc_id") % 7 == 0, F.substring(esc, 1, 40)).otherwise(esc)
    nav = F.when(
        F.col("doc_id") % 5 == 0,
        F.lit(
            '<nav><a href="/">Home page</a> <a href="/about">About the site'
            '</a> <a href="/contact">Contact us</a> <a href="/tags">All '
            "tags</a></nav>"
        ),
    ).otherwise(F.lit(""))
    related = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit('<p>See <a href="/doc/'),
            sid,
            F.lit('">item &amp; notes</a></p>'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Corpus page</title>"),
        F.lit('<script type="text/javascript">var id='),
        sid,
        F.lit(";</script><style>.m{color:red}</style></head><body>"),
        nav,
        F.lit("<!-- generated "),
        sid,
        F.lit(' --><div class="content"><p>'),
        body,
        F.lit("</p></div>"),
        related,
        F.lit("<footer>Footer &nbsp;text</footer></body></html>"),
    )
    return d.select("doc_id", "source", html.alias("html"))


def t_html_extract(spark, sf_dir):
    """HTML tag-strip + boilerplate-density extraction (text/html.py;
    VERDICT r5 missing #1). Raw pages are generated DETERMINISTICALLY
    from ``documents`` (entity-escaped body, script/style/comment
    noise, a nav link-farm every 5th doc, a truncated body every 7th)
    so both engines strip the identical markup independently; the
    clean text is md5-pinned, so the extraction itself is
    value-hash-checked, not just counted. One narrow zero-shuffle
    pass: every feature is a JVM regexp/replace column over the scan —
    at 100 TB this is the ingest map stage, no Python, no exchange."""
    from neuroimaging_data_pipeline_spark.text.html import (
        anchor_text_chars,
        n_links,
        strip_html,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    pages = _gen_pages(d).select(
        "doc_id",
        "html",
        strip_html("html").alias("clean"),
        anchor_text_chars("html").alias("link_chars"),
        n_links("html").alias("nl"),
    )
    link_frac = F.try_divide(F.col("link_chars"), F.length("clean"))
    return pages.select(
        "doc_id",
        F.md5(F.col("clean")).alias("clean_md5"),
        F.length("clean").cast("int").alias("clean_len"),
        F.col("nl").cast("int").alias("n_links"),
        F.col("link_chars").cast("int").alias("link_chars"),
        (F.round(F.coalesce(link_frac, F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "link_frac"
        ),
        (
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.length("html") - F.length("clean"), F.length("html")
                    ),
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("markup_frac"),
        F.coalesce(link_frac > F.lit(0.25), F.lit(False)).alias("boiler"),
    )


#: shared DuckDB CTE chain for the deterministic page fixture +
#: extraction (twin of _gen_pages + text/html.strip_html); reused by
#: T_HTML_SQL and E9_WEB_SQL
_HTML_GEN_CTES = r"""esc AS (
  SELECT doc_id, source,
         replace(replace(replace(text, '&', '&amp;'),
                 '<', '&lt;'), '>', '&gt;') AS e
  FROM documents
), gen AS (
  SELECT doc_id, source,
    '<html><head><title>Corpus page</title>' ||
    '<script type="text/javascript">var id=' ||
    CAST(doc_id AS VARCHAR) ||
    ';</script><style>.m{color:red}</style></head><body>' ||
    CASE WHEN doc_id % 5 = 0 THEN
      '<nav><a href="/">Home page</a> <a href="/about">About the site' ||
      '</a> <a href="/contact">Contact us</a> <a href="/tags">All ' ||
      'tags</a></nav>'
    ELSE '' END ||
    '<!-- generated ' || CAST(doc_id AS VARCHAR) ||
    ' --><div class="content"><p>' ||
    CASE WHEN doc_id % 7 = 0 THEN substr(e, 1, 40) ELSE e END ||
    '</p></div>' ||
    CASE WHEN doc_id % 3 = 0 THEN
      '<p>See <a href="/doc/' || CAST(doc_id AS VARCHAR) ||
      '">item &amp; notes</a></p>'
    ELSE '' END ||
    '<footer>Footer &nbsp;text</footer></body></html>' AS html
  FROM esc
), stripped AS (
  SELECT doc_id, source, html,
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          html,
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?s)<script[^>]*>.*?</script\s*>', ' ', 'g'),
          '(?s)<style[^>]*>.*?</style\s*>', ' ', 'g'),
          '<[^>]+>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      '\s+', ' ', 'g')) AS clean
  FROM gen
), feats AS (
  SELECT doc_id, source, html, clean,
    COALESCE(list_sum(list_transform(
      regexp_extract_all(html, '(?s)<a[^>]*>(.*?)</a>', 1),
      x -> len(x))), 0) AS link_chars,
    len(regexp_extract_all(html, '<a[\s>]')) AS nl
  FROM stripped
)"""

T_HTML_SQL = f"""
WITH {_HTML_GEN_CTES}
SELECT doc_id,
  md5(clean) AS clean_md5,
  CAST(len(clean) AS INT) AS clean_len,
  CAST(nl AS INT) AS n_links,
  CAST(link_chars AS INT) AS link_chars,
  (ROUND(COALESCE(CAST(link_chars AS DOUBLE) / NULLIF(len(clean), 0),
                  0.0), 6) + 0.0) AS link_frac,
  (ROUND(COALESCE(CAST(len(html) - len(clean) AS DOUBLE)
                  / NULLIF(len(html), 0), 0.0), 6) + 0.0) AS markup_frac,
  COALESCE(CAST(link_chars AS DOUBLE) / NULLIF(len(clean), 0) > 0.25,
           FALSE) AS boiler
FROM feats
"""


def e9_web_pipeline(spark, sf_dir):
    """E9: the WEB-corpus ingest flow composed end-to-end as ONE lazy
    plan — the html-ingest twin of e2's clean-text pipeline:

      raw pages (deterministic fixture from ``documents``)
        -> tag-strip / entity-decode extraction (text/html.py)
        -> boilerplate filter (link-density <= 0.25) + min-length 40
        -> exact dedup of the EXTRACTED text, keep min-doc_id
           representative per clean-text md5
        -> per-source stats (pages kept, clean chars, mean rounded
           link density)

    Every stage is the operator the standalone queries exercise
    (t_html_extract's extraction, d_exact_dedup's keep-representative
    shape), and the oracle reuses the shared _HTML_GEN_CTES chain
    CTE-by-CTE. Plan: scan -> narrow regexp columns -> hash-agg dedup
    (one shuffle on the md5 key) -> per-source partial agg; no
    Python, no driver loop."""
    from neuroimaging_data_pipeline_spark.functions.stats import dec_avg
    from neuroimaging_data_pipeline_spark.text.html import strip_html
    from neuroimaging_data_pipeline_spark.text.html import (
        anchor_text_chars,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    ext = _gen_pages(d).select(
        "doc_id",
        "source",
        strip_html("html").alias("clean"),
        anchor_text_chars("html").alias("link_chars"),
    )
    link_frac = F.try_divide(F.col("link_chars"), F.length("clean"))
    kept = (
        ext.withColumn("lf6", F.round(F.coalesce(link_frac, F.lit(0.0)), 6))
        .filter(
            F.coalesce(link_frac <= 0.25, F.lit(True))
            & (F.length("clean") >= 40)
        )
        .withColumn("h", F.md5(F.col("clean")))
    )
    winners = kept.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    dedup = kept.join(winners, ["h", "doc_id"], "left_semi")
    return dedup.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("clean").cast("long")).alias("clean_chars"),
        (F.round(dec_avg("lf6"), 6) + F.lit(0.0)).alias("avg_link_frac"),
    )


E9_WEB_SQL = f"""
WITH {_HTML_GEN_CTES}, lf AS (
  SELECT doc_id, source, clean,
         CAST(link_chars AS DOUBLE) / NULLIF(len(clean), 0) AS link_frac
  FROM feats
), kept AS (
  SELECT doc_id, source, clean,
         ROUND(COALESCE(link_frac, 0.0), 6) AS lf6,
         md5(clean) AS h
  FROM lf
  WHERE COALESCE(link_frac <= 0.25, TRUE) AND len(clean) >= 40
), winners AS (
  SELECT h, MIN(doc_id) AS doc_id FROM kept GROUP BY h
), dedup AS (
  SELECT kept.* FROM kept JOIN winners USING (h, doc_id)
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_pages,
  CAST(SUM(len(clean)) AS BIGINT) AS clean_chars,
  (ROUND(CAST(SUM(CAST(lf6 AS DECIMAL(28,10))) AS DOUBLE)
         / COUNT(lf6), 6) + 0.0) AS avg_link_frac
FROM dedup GROUP BY source
"""


#: rolling-gram width / minimum reported span for d_dup_spans
DUP_SPAN_K = 24
DUP_SPAN_MIN = 40


def d_dup_spans(spark, sf_dir):
    """SUBSTRING-level exact dedup — maximal cross-document duplicated
    character spans (the 'Deduplicating Training Data Makes Language
    Models Better' primitive, re-expressed for a shuffle engine):

      1. every char offset emits its K=24-char rolling gram (JVM
         transform over a position sequence — no Python; the RAW gram
         is the group key: at K=24 it is the same width as a hex
         digest, so hashing would only add CPU);
      2. a gram is DUPLICATED when >= 2 distinct docs contain it
         (count-distinct agg with map-side partials);
      3. per doc, consecutive duplicated offsets merge into maximal
         islands (pos - row_number grouping) and spans shorter than
         MIN=40 chars are dropped.

    Output: (doc_id, span_start, span_len) — the byte ranges a
    substring-dedup pass would cut. 100 TB posture: the gram explode
    is ~16 bytes/char of shuffle — the distributed analogue of the
    suffix-array sort the reference-paper implementation pays; at
    corpus scale you run the cheap winnowed-fingerprint screen
    (t_winnow) first and this exact pass over the candidate subset
    only. Both stages are here and compose."""
    K, MINLEN = DUP_SPAN_K, DUP_SPAN_MIN
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    positions = F.sequence(F.lit(1), F.length("text") - K + 1)
    g = (
        d.filter(F.length("text") >= K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    positions,
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        F.substring(F.col("text"), i, K).alias("h"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "g.pos", "g.h")
    )
    # >=2 distinct docs <=> min(doc_id) != max(doc_id): plain min/max
    # partials are cheaper than count-distinct's dedup pass
    dup = (
        g.groupBy("h")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("h")
    )
    hits = g.join(dup, "h").select("doc_id", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") - F.min("pos") + K).cast("int").alias("span_len"),
        )
        .filter(F.col("span_len") >= MINLEN)
        .select("doc_id", "span_start", "span_len")
    )


D_DUP_SPANS_SQL = f"""
WITH g AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         substr(text, CAST(i AS INT), {DUP_SPAN_K}) AS h
  FROM documents, UNNEST(range(1, len(text) - {DUP_SPAN_K} + 2)) AS r(i)
  WHERE len(text) >= {DUP_SPAN_K}
), dup AS (
  SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)
), isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id,
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + {DUP_SPAN_K} AS INT) AS span_len
FROM isl GROUP BY doc_id, grp
HAVING MAX(pos) - MIN(pos) + {DUP_SPAN_K} >= {DUP_SPAN_MIN}
"""


def t_gopher_repetition(spark, sf_dir):
    """Gopher-rule repetition signals (Rae et al. 2021 §A1.1 — the
    quality filters every large-corpus curation pass applies before
    training): per document the top-word fraction, the
    duplicate-word-occurrence fraction (1 - distinct/total) and the
    top adjacent-bigram fraction, with deterministic tie-breaks (max
    count, then lexicographically LAST token, pinned identically in
    both engines via struct-max / filtered-max). All JVM: split ->
    explode -> two doc-keyed partial-agg counts -> one join; bigrams
    built with an index-aware array transform, no self-join. At
    100 TB this is the standard doc-keyed aggregation shape — AQE
    handles the long-doc skew, nothing is quadratic in doc length."""
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    words = d.select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("ws"),
    )
    uni = words.select("doc_id", F.explode("ws").alias("tok"))
    big = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (w, i) -> concat(w, ' ', ws[i + 1]))"
            )
        ).alias("tok"),
    )

    def top_frac(toks, prefix):
        c = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
        return c.groupBy("doc_id").agg(
            F.sum("cnt").alias(f"{prefix}_n"),
            F.countDistinct("tok").alias(f"{prefix}_nd"),
            F.max(F.struct("cnt", "tok")).alias(f"{prefix}_top"),
        )
    u = top_frac(uni, "w")
    b = top_frac(big, "b")
    return (
        u.join(b, "doc_id", "left")
        .select(
            "doc_id",
            F.col("w_n").alias("n_words"),
            F.col("w_top.tok").alias("top_word"),
            (F.round(F.col("w_top.cnt") / F.col("w_n"), 6) + F.lit(0.0))
            .alias("top_word_frac"),
            (F.round(F.lit(1.0) - F.col("w_nd") / F.col("w_n"), 6)
             + F.lit(0.0)).alias("dup_word_frac"),
            F.col("b_top.tok").alias("top_bigram"),
            (F.round(
                F.coalesce(F.col("b_top.cnt") / F.col("b_n"), F.lit(0.0)), 6
            ) + F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


T_GOPHER_SQL = f"""
WITH w AS (
  SELECT doc_id, t AS tok
  FROM documents, UNNEST({_TOKS_SQL}) AS u(t)
), wc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2
), wt AS (
  SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS nd, MAX(cnt) AS mx
  FROM wc GROUP BY 1
), wtop AS (
  SELECT wc.doc_id, MAX(wc.tok) AS top_tok
  FROM wc JOIN wt ON wc.doc_id = wt.doc_id AND wc.cnt = wt.mx
  GROUP BY 1
), toks AS (
  SELECT doc_id, {_TOKS_SQL} AS ws FROM documents
), b AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS tok
  FROM toks, UNNEST(range(1, len(ws))) AS r(i)
), bc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt FROM b GROUP BY 1, 2
), bt AS (
  SELECT doc_id, SUM(cnt) AS n, MAX(cnt) AS mx FROM bc GROUP BY 1
), btop AS (
  SELECT bc.doc_id, MAX(bc.tok) AS top_tok
  FROM bc JOIN bt ON bc.doc_id = bt.doc_id AND bc.cnt = bt.mx
  GROUP BY 1
)
SELECT wt.doc_id,
       CAST(wt.n AS BIGINT) AS n_words,
       wtop.top_tok AS top_word,
       (ROUND(CAST(wt.mx AS DOUBLE) / wt.n, 6) + 0.0) AS top_word_frac,
       (ROUND(1.0 - CAST(wt.nd AS DOUBLE) / wt.n, 6) + 0.0)
         AS dup_word_frac,
       btop.top_tok AS top_bigram,
       (ROUND(COALESCE(CAST(bt.mx AS DOUBLE) / bt.n, 0.0), 6) + 0.0)
         AS top_bigram_frac
FROM wt
JOIN wtop ON wt.doc_id = wtop.doc_id
LEFT JOIN bt ON wt.doc_id = bt.doc_id
LEFT JOIN btop ON wt.doc_id = btop.doc_id
"""


_ROBOTS_RULES = [
    ("/", 1),
    ("/private", 0),
    ("/private/pub", 1),
    ("/tmp", 0),
    ("/p", 0),
    ("/dual", 0),
    ("/dual", 1),  # equal-length allow/disallow tie -> allow (RFC 9309)
]
_ROBOTS_PATHS = [
    "/", "/private/x", "/private/pub/x", "/tmp/y", "/pub", "/dual/z",
]


def t_robots_filter(spark, sf_dir):
    """Robots-exclusion filtering (RFC 9309 longest-match semantics)
    — the fetch-policy stage of a web-corpus pipeline, next to URL
    dedup and WARC ingest. Each document gets a crawl path from a
    fixed menu; a tiny allow/disallow prefix-rule dimension is
    BROADCAST and matched with a startswith theta-join (the correct
    plan for a KB rule set: BroadcastNestedLoopJoin, no shuffle of
    the fact side); the per-URL winner is the longest matching rule,
    allow beating disallow on equal length (the /dual rules pin that
    tie), unmatched URLs default to allowed. The winner is picked
    with max(struct(len, allow)) under groupBy — a PARTIAL-AGGREGABLE
    form (map-side combine before the one doc-keyed exchange), not a
    row_number window whose per-partition sort a 100 TB URL table
    cannot afford."""
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    paths = F.array(*[F.lit(p) for p in _ROBOTS_PATHS])
    urls = d.select(
        "doc_id",
        F.element_at(paths, (F.col("doc_id") % len(_ROBOTS_PATHS) + 1)
                     .cast("int")).alias("path"),
    )
    rules = spark.createDataFrame(_ROBOTS_RULES, "prefix string, allow int")
    j = urls.join(
        F.broadcast(rules),
        F.col("path").startswith(F.col("prefix")),
        "left",
    )
    # (len, allow) ties only between identical prefixes, so the
    # 2-key struct max IS the RFC order; prefix rides along for output
    best = j.groupBy("doc_id", "path").agg(
        F.max(
            F.struct(
                F.length("prefix").alias("l"),
                F.col("allow").alias("allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("win")
    )
    return best.select(
        "doc_id",
        "path",
        F.col("win.prefix").alias("matched_prefix"),
        F.coalesce(F.col("win.allow"), F.lit(1)).alias("allowed"),
    )


_ROBOTS_RULES_SQL = ", ".join(f"('{p}', {a})" for p, a in _ROBOTS_RULES)
_ROBOTS_PATHS_SQL = ", ".join(f"'{p}'" for p in _ROBOTS_PATHS)

T_ROBOTS_SQL = f"""
WITH rules(prefix, allow) AS (VALUES {_ROBOTS_RULES_SQL}),
urls AS (
  SELECT doc_id,
         ([{_ROBOTS_PATHS_SQL}])[CAST(doc_id % {len(_ROBOTS_PATHS)} + 1
                                      AS INT)] AS path
  FROM documents
), matched AS (
  SELECT u.doc_id, u.path, r.prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY u.doc_id
           ORDER BY LEN(r.prefix) DESC, r.allow DESC, r.prefix
         ) AS rn
  FROM urls u LEFT JOIN rules r ON u.path LIKE r.prefix || '%'
)
SELECT doc_id, path,
       prefix AS matched_prefix,
       CAST(COALESCE(allow, 1) AS INT) AS allowed
FROM matched WHERE rn = 1
"""


def t_encoding_repair(spark, sf_dir):
    """Charset sanitation (text/encoding.py) — the stage crawled
    bytes pass before any text operator: a from-scratch RFC 3629
    UTF-8 validator (overlongs, surrogates, >U+10FFFF all rejected;
    fuzz-pinned against the stdlib decoder), the double-encoding
    mojibake probe (decoded text that round-trips through Latin-1
    back into valid multibyte UTF-8 was saved twice — the round-trip
    IS the repair), and the CP1252-vs-Latin-1 split on the 0x80-0x9F
    punctuation block. Each document's text is deterministically
    scrambled by id % 4 (clean UTF-8 / Latin-1 / mojibake / CP1252,
    each with a per-case non-ASCII suffix), so the oracle recomputes
    charset, mojibake flag, non-ASCII count and the repaired md5 per
    document — a validator, probe-order or repair bug breaks the
    hash. Narrow mapInPandas both ways, zero shuffle."""
    from neuroimaging_data_pipeline_spark.text.encoding import (
        encoding_repair,
        synthesize_encoded_docs,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    raw = synthesize_encoded_docs(d, id_col="doc_id", text_col="text")
    return encoding_repair(raw)


# suffixes mirror text/encoding.py SUFFIXES; md5 is over the repaired
# (canonical) text, which detection recovers exactly in all 4 cases
T_ENCODING_SQL = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 1 THEN 'latin-1' WHEN 3 THEN 'cp1252'
            ELSE 'utf-8' END AS charset,
       (doc_id % 4 = 2) AS mojibake,
       CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 4 ELSE 3 END AS BIGINT)
         AS n_nonascii,
       md5(text || CASE doc_id % 4
             WHEN 0 THEN ' — naïve café №0'
             WHEN 1 THEN ' café déjà ±1'
             WHEN 2 THEN ' — smörgåsbord'
             ELSE ' “quoted” – dash' END) AS repaired_md5
FROM documents
"""


def t_idn_hosts(spark, sf_dir):
    """IDN host canonicalization (text/idn.py) — the URL-dedup gap
    internationalized domains open: the same host spelled unicode vs
    ACE ("münchen.example" vs "xn--mnchen-3ya.example") must
    canonicalize together. Full RFC 3492 bootstring both directions,
    from scratch, fuzz-pinned byte-for-byte against the stdlib
    punycode codec in pytest. Hosts are synthesized per doc with an
    id%4 decoration label (ASCII / German / Cyrillic / Japanese); the
    query ACE-encodes then decodes BACK, and the oracle recomputes
    label counts, the exact ACE length and the md5 of the
    round-tripped unicode host — an off-by-one anywhere in the
    insertion-ordering state machine breaks the hash. Narrow
    mapInPandas, zero shuffle."""
    from neuroimaging_data_pipeline_spark.text.idn import (
        idn_canonicalize,
        synthesize_idn_hosts,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    hosts = synthesize_idn_hosts(d, id_col="doc_id")
    return idn_canonicalize(hosts)


# ACE label lengths are constants of the fixture decorations:
# xn--mnchen-3ya = 14, xn--e1afmkfd = 12, xn--r8jz45g = 11
T_IDN_SQL = """
SELECT doc_id,
       (doc_id % 4 <> 0) AS needs_idn,
       CAST(CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 3 END AS INT) AS n_labels,
       CAST(LENGTH('w' || CAST(doc_id AS VARCHAR)) +
            CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 23
                 WHEN 2 THEN 21 ELSE 20 END AS BIGINT) AS ascii_len,
       md5('w' || CAST(doc_id AS VARCHAR) ||
           CASE doc_id % 4 WHEN 0 THEN '.example'
                WHEN 1 THEN '.münchen.example'
                WHEN 2 THEN '.пример.example'
                ELSE '.例え.example' END) AS host_md5
FROM documents
"""


def e10_release_pipeline(spark, sf_dir):
    """E10: the corpus RELEASE-PREP flow composed end-to-end as ONE
    lazy plan from this round's sanitation operators:

      raw crawled bytes (deterministic charset scrambling, id %% 4)
        -> charset detect + mojibake repair (text/encoding.py)
        -> IDN host canonicalization (text/idn.py) joined per doc
        -> PII redaction of the repaired text (text/analysis.py
           pii_redact; deterministic contact lines planted per doc so
           the rewrite is non-vacuous — sum_pii_after certifies the
           released text carries ZERO remaining detector hits)
        -> exact dedup on the REPAIRED text md5, keep min-doc_id
        -> deterministic epoch shuffle of the kept docs into 8
           loader shards (text/mixing.py)
        -> per-shard release stats

    Every stage is the operator its standalone query exercises
    (t_encoding_repair, t_idn_hosts, t_pii_redact, d_exact_dedup's
    winner shape, t_epoch_shuffle), and the oracle recomputes the
    whole chain from the fixture formulas. max_pos == n_docs pins that
    the shard ranks were computed over exactly the deduped set. Plan:
    two narrow Arrow stages (the redaction chain is JVM regexp
    columns riding the same stage) -> one dedup shuffle -> one shard
    window -> one final agg; no driver loop."""
    from neuroimaging_data_pipeline_spark.text.analysis import (
        pii_counts,
        pii_redact,
    )
    from neuroimaging_data_pipeline_spark.text.encoding import (
        encoding_repair,
        synthesize_encoded_docs,
    )
    from neuroimaging_data_pipeline_spark.text.idn import (
        idn_canonicalize,
        synthesize_idn_hosts,
    )
    from neuroimaging_data_pipeline_spark.text.mixing import epoch_shuffle

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    repaired = encoding_repair(synthesize_encoded_docs(d), emit_text=True)
    hosts = idn_canonicalize(synthesize_idn_hosts(d)).select(
        "doc_id", "needs_idn"
    )
    enriched = repaired.join(hosts, "doc_id")
    # release-grade sanitation: plant a deterministic contact line,
    # then redact it — n_pii per doc is what the rewrite removed
    planted = F.concat(
        F.col("repaired"), F.lit(" contact doc"),
        F.col("doc_id").cast("string"), F.lit("@crawl.example"),
    )
    red = pii_redact(planted)

    def _total(col):
        cs = pii_counts(col)
        out = None
        for k in sorted(cs):
            out = cs[k] if out is None else out + cs[k]
        return out

    # r14 (guide §8 "decide with small rows"): every decision below —
    # dedup winners, epoch shards, the per-shard report — depends only
    # on doc_id + per-doc STATS, never on the repaired text. The old
    # shape reused `enriched` (two Arrow stages + the whole pii regexp
    # chain over KB texts) from four plan branches, and Catalyst
    # re-executed that chain per branch. Project the narrow stats frame
    # once, persist it (~50 B/row at any corpus scale), and let the
    # winner/shard branches reuse it; the heavy text chain runs exactly
    # once. Isolated min-of-3 at sf0.1: 3.38 -> measured below.
    from pyspark import StorageLevel

    stats = enriched.select(
        "doc_id",
        "repaired_md5",
        "mojibake",
        "needs_idn",
        "n_nonascii",
        _total(planted).alias("n_pii"),
        _total(red).alias("n_pii_left"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    winners = stats.groupBy("repaired_md5").agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = stats.join(winners, ["repaired_md5", "doc_id"], "left_semi")
    sharded = kept.join(epoch_shuffle(kept.select("doc_id")), "doc_id")
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("mojibake").cast("long")).alias("n_mojibake"),
        F.sum(F.col("needs_idn").cast("long")).alias("n_idn"),
        F.sum("n_nonascii").alias("sum_nonascii"),
        F.sum("n_pii").cast("long").alias("n_pii_redacted"),
        F.sum("n_pii_left").cast("long").alias("sum_pii_after"),
        F.max("pos").cast("long").alias("max_pos"),
    )


E10_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE doc_id % 4
               WHEN 0 THEN ' — naïve café №0'
               WHEN 1 THEN ' café déjà ±1'
               WHEN 2 THEN ' — smörgåsbord'
               ELSE ' “quoted” – dash' END AS repaired,
         text || CASE doc_id % 4
               WHEN 0 THEN ' — naïve café №0'
               WHEN 1 THEN ' café déjà ±1'
               WHEN 2 THEN ' — smörgåsbord'
               ELSE ' “quoted” – dash' END
           || ' contact doc' || CAST(doc_id AS VARCHAR)
           || '@crawl.example' AS p
  FROM documents
), rep AS (
  SELECT doc_id,
         (doc_id % 4 = 2) AS mojibake,
         (doc_id % 4 <> 0) AS needs_idn,
         CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 4 ELSE 3 END AS BIGINT)
           AS n_nonascii,
         md5(repaired) AS repaired_md5,
         {_pii_sql_count_expr('p', PII_PATTERNS['emails'])}
         + {_pii_sql_count_expr('p', PII_PATTERNS['ipv4'])}
         + {_pii_sql_count_expr('p', PII_PATTERNS['intl_phones'])}
           AS n_pii,
         {_pii_sql_count_expr(_pii_sql_redact('p'), PII_PATTERNS['emails'])}
         + {_pii_sql_count_expr(_pii_sql_redact('p'), PII_PATTERNS['ipv4'])}
         + {_pii_sql_count_expr(_pii_sql_redact('p'),
                                PII_PATTERNS['intl_phones'])}
           AS n_pii_left
  FROM planted
), kept AS (
  SELECT * FROM rep
  WHERE doc_id = (SELECT MIN(r2.doc_id) FROM rep r2
                  WHERE r2.repaired_md5 = rep.repaired_md5)
), sharded AS (
  SELECT kept.*,
         md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
         CAST(CAST(('0x' || substr(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS INT) AS shard
  FROM kept
), ranked AS (
  SELECT sharded.*,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key) AS pos
  FROM sharded
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN mojibake THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake,
       CAST(SUM(CASE WHEN needs_idn THEN 1 ELSE 0 END) AS BIGINT) AS n_idn,
       CAST(SUM(n_nonascii) AS BIGINT) AS sum_nonascii,
       CAST(SUM(n_pii) AS BIGINT) AS n_pii_redacted,
       CAST(SUM(n_pii_left) AS BIGINT) AS sum_pii_after,
       CAST(MAX(pos) AS BIGINT) AS max_pos
FROM ranked GROUP BY shard
"""


def t_unigram_train(spark, sf_dir):
    """Unigram-LM (SentencePiece-style) tokenizer TRAINING
    (text/unigram.py, closes VERDICT r7 #7) — the subword algorithm
    real pipelines choose against BPE (Kudo 2018): substring seed
    vocab (top-48 + all chars), then 2 hard-EM rounds of distributed
    Viterbi segmentation (E-step: one narrow Arrow pass over the
    DISTINCT-word table) and integer piece recount (M-step: one
    map-side-combinable groupBy; zero-count pieces pruned). Log-probs
    quantize to scaled int64 (round(ln(cnt/T)*1e9)) so every DP score
    is an exact integer — no float order dependence, ties resolved by
    the longer piece. The oracle unrolls BOTH rounds in SQL: forward
    Viterbi as a recursive CTE carrying a 4-deep best/token history,
    backtrack as a second recursive CTE over the recorded argmax
    choices — training is oracle-checked round-for-round, the BPE
    discipline. KB driver state per round (the <=75-piece vocab)."""
    from neuroimaging_data_pipeline_spark.text.unigram import unigram_train

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return unigram_train(docs)


def t_unigram_tokens(spark, sf_dir):
    """Unigram-LM train-then-tokenize end-to-end: learn the final
    vocabulary (2 EM rounds), then per-document token counts and the
    exact integer total log-likelihood via Viterbi over DISTINCT
    words joined back to the doc->word explosion (word multiplicity
    preserved, per_word broadcast). The oracle replays training plus
    a third forward DP and the same join/aggregation."""
    from neuroimaging_data_pipeline_spark.text.unigram import (
        unigram_token_counts,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    return unigram_token_counts(docs)


_UNI_TOKS = (
    "list_filter(string_split(regexp_replace(lower(trim(text)),"
    " '\\s+', ' ', 'g'), ' '), t -> t <> '')"
)
_UNI_SENT = "-9223372036854775807"


def _unigram_round_sql(r: int, prev: str, forward_only: bool = False) -> str:
    """CTE fragments for EM round r over vocabulary ``prev``: scaled
    int64 log-probs, forward Viterbi (recursive, 4-deep history +
    argmax choice), and unless forward_only the backtrack + recount
    producing vocab{r}."""
    c = [
        f"COALESCE(d.b0 + i1.ilp, {_UNI_SENT})",
        f"COALESCE(d.b1 + i2.ilp, {_UNI_SENT})",
        f"COALESCE(d.b2 + i3.ilp, {_UNI_SENT})",
        f"COALESCE(d.b3 + i4.ilp, {_UNI_SENT})",
    ]
    m = f"GREATEST({c[0]}, {c[1]}, {c[2]}, {c[3]})"
    lch = (
        f"CASE WHEN {c[3]} = {m} THEN 4 WHEN {c[2]} = {m} THEN 3"
        f" WHEN {c[1]} = {m} THEN 2 ELSE 1 END"
    )
    tok = (
        f"CASE {lch} WHEN 1 THEN d.t0 + 1 WHEN 2 THEN d.t1 + 1"
        f" WHEN 3 THEN d.t2 + 1 ELSE d.t3 + 1 END"
    )
    out = f"""
tot{r} AS MATERIALIZED (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM {prev}),
ilp{r} AS MATERIALIZED (
  SELECT piece,
         CAST(ROUND(ln(CAST(cnt AS DOUBLE) / (SELECT tot FROM tot{r}))
              * 1000000000.0) AS BIGINT) AS ilp
  FROM {prev}
),
dp{r} AS (
  SELECT w.word, 0 AS k,
         CAST(0 AS BIGINT) AS b0, CAST(NULL AS BIGINT) AS b1,
         CAST(NULL AS BIGINT) AS b2, CAST(NULL AS BIGINT) AS b3,
         0 AS t0, 0 AS t1, 0 AS t2, 0 AS t3, 0 AS lch
  FROM words w
  UNION ALL
  -- NULLIF: an uncoverable prefix stays NULL (the Python side's
  -- None) so it can never feed a checked int64 add of the sentinel
  SELECT d.word, d.k + 1,
         NULLIF({m}, {_UNI_SENT}), d.b0, d.b1, d.b2,
         {tok}, d.t0, d.t1, d.t2,
         {lch}
  FROM dp{r} d
  LEFT JOIN ilp{r} i1 ON i1.piece = substring(d.word, d.k + 1, 1)
  LEFT JOIN ilp{r} i2 ON d.k >= 1 AND i2.piece = substring(d.word, d.k, 2)
  LEFT JOIN ilp{r} i3 ON d.k >= 2 AND i3.piece = substring(d.word, d.k - 1, 3)
  LEFT JOIN ilp{r} i4 ON d.k >= 3 AND i4.piece = substring(d.word, d.k - 2, 4)
  WHERE d.k < strlen(d.word)
)"""
    if forward_only:
        return out
    return out + f""",
bt{r} AS (
  SELECT w.word, CAST(strlen(w.word) AS INT) AS pos,
         CAST(NULL AS VARCHAR) AS piece
  FROM words w
  UNION ALL
  SELECT b.word, b.pos - f.lch,
         substring(b.word, b.pos - f.lch + 1, f.lch)
  FROM bt{r} b JOIN dp{r} f ON f.word = b.word AND f.k = b.pos
  WHERE b.pos > 0
),
vocab{r} AS MATERIALIZED (
  SELECT b.piece, CAST(SUM(w.freq) AS BIGINT) AS cnt
  FROM bt{r} b JOIN words w ON w.word = b.word
  WHERE b.piece IS NOT NULL
  GROUP BY b.piece
)"""


_UNI_BASE_SQL = f"""
words AS MATERIALIZED (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, UNNEST({_UNI_TOKS}) AS u(tok)
  GROUP BY tok
),
subs AS MATERIALIZED (
  SELECT substring(w.word, CAST(p.p AS INT), CAST(l.l AS INT)) AS piece,
         l.l AS l, SUM(w.freq) AS cnt
  FROM words w,
       UNNEST(range(1, CAST(strlen(w.word) AS BIGINT) + 1)) AS p(p),
       UNNEST(range(1, 5)) AS l(l)
  WHERE p.p + l.l - 1 <= strlen(w.word)
  GROUP BY 1, 2
),
vocab0 AS MATERIALIZED (
  -- explicit UNION ALL + GROUP BY (the Spark side's union+max),
  -- NOT bare UNION: inside WITH RECURSIVE DuckDB gives a two-branch
  -- UNION the recursive anchor/step treatment and skips the dedup
  SELECT piece, MAX(cnt) AS cnt FROM (
    SELECT piece, cnt FROM
      (SELECT piece, cnt FROM subs ORDER BY cnt DESC, piece LIMIT 48) q
    UNION ALL
    SELECT piece, cnt FROM subs WHERE l = 1
  ) u GROUP BY piece
)"""


T_UNIGRAM_TRAIN_SQL = (
    "WITH RECURSIVE "
    + _UNI_BASE_SQL
    + ","
    + _unigram_round_sql(1, "vocab0")
    + ","
    + _unigram_round_sql(2, "vocab1")
    + """
SELECT piece, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank
FROM vocab2
"""
)


T_UNIGRAM_TOKENS_SQL = (
    "WITH RECURSIVE "
    + _UNI_BASE_SQL
    + ","
    + _unigram_round_sql(1, "vocab0")
    + ","
    + _unigram_round_sql(2, "vocab1")
    + ","
    + _unigram_round_sql(3, "vocab2", forward_only=True)
    + f""",
per_word AS MATERIALIZED (
  SELECT word, t0 AS n_tokens, b0 AS score
  FROM dp3 WHERE k = strlen(word)
),
docw AS MATERIALIZED (
  SELECT doc_id, tok AS word
  FROM documents, UNNEST({_UNI_TOKS}) AS u(tok)
)
SELECT doc_id,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(score) AS BIGINT) AS score
FROM docw JOIN per_word USING (word)
GROUP BY doc_id
"""
)


QUERIES = {
    "t_unigram_train": t_unigram_train,
    "t_unigram_tokens": t_unigram_tokens,
    "t_html_extract": t_html_extract,
    "e9_web_pipeline": e9_web_pipeline,
    "d_dup_spans": d_dup_spans,
    "t_gopher_repetition": t_gopher_repetition,
    "t_robots_filter": t_robots_filter,
    "t_encoding_repair": t_encoding_repair,
    "t_idn_hosts": t_idn_hosts,
    "e10_release_pipeline": e10_release_pipeline,
    "t_token_count": t_token_count,
    "t_inverted_index": t_inverted_index,
    "d_url_dedup": d_url_dedup,
    "e6_decontam_split": e6_decontam_split,
    "d_cdc_chunks": d_cdc_chunks,
    "d_passage_dedup": d_passage_dedup,
    "t_tfidf": t_tfidf,
    "d_fuzzy_pairs": d_fuzzy_pairs,
    "e8_entity_resolution": e8_entity_resolution,
    "d_contamination": d_contamination,
    "t_bigram_xent": t_bigram_xent,
    "t_kn_bigram": t_kn_bigram,
    "t_repetition": t_repetition,
    "e2_corpus_pipeline": e2_corpus_pipeline,
    "t_pii_signals": t_pii_signals,
    "t_pii_redact": t_pii_redact,
    "t_c4_line_filters": t_c4_line_filters,
    "t_sample": t_sample,
    "t_quality_signals": t_quality_signals,
    "t_lang_id": t_lang_id,
    "t_fingerprint": t_fingerprint,
    "t_entropy": t_entropy,
    "t_winnow": t_winnow,
    "d_exact_dedup": d_exact_dedup,
    "d_ngram_jaccard": d_ngram_jaccard,
}

ORACLE = {
    "t_unigram_train": T_UNIGRAM_TRAIN_SQL,
    "t_unigram_tokens": T_UNIGRAM_TOKENS_SQL,
    "t_html_extract": T_HTML_SQL,
    "e9_web_pipeline": E9_WEB_SQL,
    "d_dup_spans": D_DUP_SPANS_SQL,
    "t_token_count": T_TOKEN_SQL,
    "t_inverted_index": T_INVIDX_SQL,
    "d_url_dedup": D_URL_SQL,
    "e6_decontam_split": E6_SQL,
    "d_cdc_chunks": D_CDC_SQL,
    "d_passage_dedup": D_PASSAGE_SQL,
    "t_tfidf": T_TFIDF_SQL,
    "d_fuzzy_pairs": D_FUZZY_SQL,
    "e8_entity_resolution": E8_SQL,
    "d_contamination": D_CONTAM_SQL,
    "t_bigram_xent": T_BIGRAM_XENT_SQL,
    "t_kn_bigram": T_KN_BIGRAM_SQL,
    "t_repetition": T_REPETITION_SQL,
    "e2_corpus_pipeline": E2_PIPE_SQL,
    "t_pii_signals": T_PII_SQL,
    "t_pii_redact": T_PII_REDACT_SQL,
    "t_c4_line_filters": T_C4_SQL,
    "t_sample": T_SAMPLE_SQL,
    "t_quality_signals": T_QUALITY_SQL,
    "t_gopher_repetition": T_GOPHER_SQL,
    "t_robots_filter": T_ROBOTS_SQL,
    "t_encoding_repair": T_ENCODING_SQL,
    "t_idn_hosts": T_IDN_SQL,
    "e10_release_pipeline": E10_SQL,
    "t_lang_id": T_LANG_SQL,
    "t_fingerprint": T_FP_SQL,
    "t_entropy": T_ENTROPY_SQL,
    "t_winnow": T_WINNOW_SQL,
    "d_exact_dedup": D_EXACT_SQL,
    "d_ngram_jaccard": D_NGRAM_SQL,
}
