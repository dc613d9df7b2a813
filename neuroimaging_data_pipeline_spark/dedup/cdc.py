"""Content-defined chunking (CDC) — shift-resistant sub-document
dedup boundaries.

Fixed-stride passage dedup (dedup/passage.py) breaks when one word is
inserted: every later window shifts. CDC places chunk boundaries
where the CONTENT says so — a hash of the w-char window ending at a
position decides the cut — so an edit only disturbs the chunks it
touches (the rsync/LBFS/casync principle; Muthitacharoen et al.,
"A Low-Bandwidth Network File System", SOSP 2001).

Determinism/parity: the boundary test is md5 of the exact w-char
window with a 16-bit prefix mod D — the same md5-parity discipline as
the MinHash family, so the DuckDB oracle recomputes identical cuts.
(A gear/Rabin ROLLING hash is the constant-factor production variant;
the windowed-md5 form keeps the boundary semantics engine-checkable
while staying O(w·n) map-only. Both are embarrassingly parallel.)

Plan shape: chunking is pure column expressions (zero shuffle); the
only shuffle is the corpus-wide chunk-frequency aggregate on compact
(md5, count) pairs with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: window width (chars) and divisor: boundary where H(window) % D == 0
CDC_W = 16
CDC_D = 64  # expected chunk length ~ D chars


def _norm(text_col) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")


def cdc_chunks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, chunk_idx, chunk_len, chunk_md5) — one row per
    content-defined chunk of the normalized text. A cut lands after
    position i+w-1 whenever the 16-bit md5 prefix of the w-char
    window starting at i is ≡ 0 (mod D); the final chunk always ends
    at the document end. Empty docs yield no chunks. Map-only."""
    d = docs.select(F.col(id_col), _norm(F.col(text_col)).alias("s"))
    d = d.withColumn("L", F.length("s")).filter(F.col("L") > 0)
    win = lambda i: F.substring(F.col("s"), i, CDC_W)  # noqa: E731
    hmod = lambda i: (  # noqa: E731
        F.conv(F.substring(F.md5(win(i)), 1, 4), 16, 10).cast("long")
        % CDC_D
    )
    starts = F.when(
        F.col("L") >= CDC_W,
        F.sequence(F.lit(1), F.col("L") - CDC_W + 1),
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        F.transform(
            starts,
            lambda i: F.when(hmod(i) == 0, i + CDC_W - 1).otherwise(F.lit(-1)),
        ),
        lambda x: x != -1,
    )
    ends = F.array_distinct(
        F.concat(cuts.cast("array<int>"), F.array(F.col("L").cast("int")))
    )
    d = d.withColumn("ends", ends)
    idx = F.posexplode(F.col("ends"))
    d = d.select(id_col, "s", "ends", idx.alias("chunk_idx", "end"))
    start = F.when(
        F.col("chunk_idx") == 0, F.lit(1)
    ).otherwise(F.element_at("ends", F.col("chunk_idx")) + 1)
    chunk = F.substring(
        F.col("s"), start, F.col("end") - start + 1
    )
    return d.select(
        id_col,
        "chunk_idx",
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


def cdc_dedup_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per document: (id, n_chunks, avg_chunk_len, n_corpus_unique) —
    how many of its content-defined chunks occur exactly once in the
    whole corpus (the storable-savings signal CDC dedup acts on)."""
    ch = cdc_chunks(docs, id_col, text_col)
    freq = ch.groupBy("chunk_md5").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        ch.join(freq, "chunk_md5")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.round(F.avg("chunk_len"), 6) + F.lit(0.0)).alias(
                "avg_chunk_len"
            ),
            F.sum(F.when(F.col("n_occ") == 1, 1).otherwise(0)).alias(
                "n_corpus_unique"
            ),
        )
    )
