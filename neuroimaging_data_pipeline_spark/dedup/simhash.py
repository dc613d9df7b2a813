"""SimHash near-duplicate fingerprints.

64-bit SimHash over word tokens: each token hashes to 64 bits
(xxhash64); per bit, sum +1/-1 across tokens; the sign vector is the
fingerprint. Near-dups = small Hamming distance.

Spark-first: the bit unpacking and summation are array expressions —
no Python, one groupBy per doc (map-side combinable). Banding the
fingerprint into 4x16-bit chunks gives the LSH-style bucket join for
candidate pairing (two docs within Hamming distance 3 share at least
one identical chunk by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: long) — sign-aggregated token-hash bits."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = docs.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    # Per-bit ±1 sign sum, computed branch-free: with S_b = sum of raw
    # bit b over tokens and n = token count, the sign sum is 2*S_b - n,
    # so sign_b > 0  <=>  2*S_b > n. Summing the raw bit is one AND +
    # shift per (token, bit) — half the expression work of a CASE, and
    # the groupBy stays map-side combinable (64 longs + count per doc).
    contribs = toks.select(
        id_col,
        *[
            F.shiftright(h, b).bitwiseAND(F.lit(1)).alias(f"b{b}")
            for b in range(bits)
        ],
    )
    sums = contribs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)],
    )
    fp = None
    for b in range(bits):
        bit = (2 * F.col(f"b{b}") > F.col("_n")).cast("long")
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(id_col, fp.alias("simhash"))


def hamming_distance(a, b) -> F.Column:
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def simhash_candidate_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Bucket-join on 16-bit chunks, then exact Hamming filter.
    (id_a, id_b, hamming) with id_a < id_b."""
    width = 64 // chunks
    mask = (1 << width) - 1
    chunked = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "simhash", "cv.chunk", "cv.chunk_val")
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "chunk_val"
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "chunk_val"
    )
    return (
        a.join(b, on=["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        # filter BEFORE distinct: the Hamming test is a map-side
        # expression, so the dedup shuffle carries only surviving pairs
        # instead of every multi-chunk candidate collision.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
