"""SimHash near-duplicate fingerprints.

64-bit SimHash over word tokens: each token hashes to 64 bits; per
bit, sum +1/-1 across tokens; the sign vector is the fingerprint.
Near-dups = small Hamming distance.

Hash family (oracle-parity): the 64 token-hash bits are the first 16
hex chars of ``md5(token)`` read as a big-endian integer H — a hash
DuckDB can recompute exactly (``md5()`` + hex slicing), unlike
xxhash64. Spark extracts the bits cheaply with ONE ``conv`` of the
first 15 hex chars (60 bits, safely inside a signed long) plus the
last nibble via ``ascii``; the oracle extracts the same bits
nibble-by-nibble. Both define bit b as ``(H >> b) & 1``.

Spark-first: the bit unpacking and summation are array expressions —
no Python, one groupBy per doc (map-side combinable). Banding the
fingerprint into 4x16-bit chunks gives the LSH-style bucket join for
candidate pairing (two docs within Hamming distance 3 share at least
one identical chunk by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_words(m) -> tuple[F.Column, F.Column]:
    """The 64-bit token hash H = first 16 hex chars of md5 read
    big-endian, split as (l0, nib15): l0 = chars 1-15 (bits 4-63, one
    conv into a 60-bit long — safely inside a signed long), nib15 =
    char 16 (bits 0-3). Materialized ONCE per row as real columns so
    the 64 bit extractions are plain shift/AND on longs — relying on
    codegen CSE across 64 projected expressions is not guaranteed."""
    a = F.ascii(F.substring(m, 16, 1))
    nib15 = F.when(a >= 97, a - 87).otherwise(a - 48).cast("long")
    l0 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    return l0, nib15


def _word_bit(b: int) -> F.Column:
    """Bit b of H from the materialized (_l0, _n15) columns."""
    if b < 4:
        return F.shiftright(F.col("_n15"), b).bitwiseAND(F.lit(1))
    return F.shiftright(F.col("_l0"), b - 4).bitwiseAND(F.lit(1))


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
    l0, nib15 = _md5_words(F.md5("tok"))
    hashed = toks.select(id_col, l0.alias("_l0"), nib15.alias("_n15"))
    # Per-bit ±1 sign sum, computed branch-free: with S_b = sum of raw
    # bit b over tokens and n = token count, the sign sum is 2*S_b - n,
    # so sign_b > 0  <=>  2*S_b > n. Summing the raw bit keeps the
    # groupBy map-side combinable (64 longs + count per doc).
    contribs = hashed.select(
        id_col,
        *[_word_bit(b).alias(f"b{b}") for b in range(bits)],
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
    max_bucket_size: int | None = None,
    persist_chunks: bool = True,
) -> DataFrame:
    """Bucket-join on 16-bit chunks, then exact Hamming filter.
    (id_a, id_b, hamming) with id_a < id_b.

    ``max_bucket_size`` is the flood guard for corpus scale (mirrors
    ``dedup/minhash.py:lsh_candidate_pairs``): a chunk value shared by
    n docs contributes n² candidate rows, so one degenerate chunk
    (short/boilerplate docs collapsing to the same 16 bits) floods a
    single shuffle partition. Chunk buckets above the cap are dropped
    via a broadcast anti-join — the flooded set has <= n_rows/cap
    members by construction, so the broadcast is always small. Bounded
    recall loss for a hard fan-out ceiling; run exact dedup first so
    identical-document floods never reach this operator."""
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
    if persist_chunks:
        # The chunked fingerprint table (4 rows per doc — tiny relative
        # to the token stage that produces it) feeds THREE consumers:
        # the flood-guard aggregate, and both sides of the self-join.
        # Without persistence Spark re-runs the whole explode+md5+64-sum
        # fingerprint pipeline once per consumer — at sf0.1 that is ~4x
        # the query's useful work. MEMORY_AND_DISK spills instead of
        # OOMing at corpus scale.
        from pyspark import StorageLevel

        chunked = chunked.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket_size is not None:
        flooded = (
            chunked.groupBy("chunk", "chunk_val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("chunk", "chunk_val")
        )
        chunked = chunked.join(
            F.broadcast(flooded), ["chunk", "chunk_val"], "left_anti"
        )
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
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int")
            .alias("hamming"),
        )
        # filter BEFORE distinct: the Hamming test is a map-side
        # expression, so the dedup shuffle carries only surviving pairs
        # instead of every multi-chunk candidate collision.
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
