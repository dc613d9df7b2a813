"""MinHash + LSH near-duplicate detection (shingle -> minhash ->
band -> bucket-join), plus n-gram Jaccard verification.

Spark-first design for 100 TB:
- shingling + hashing are narrow (explode + builtin hash fns);
- the LSH bucket join is an equi-join on (band_id, band_hash) —
  candidates only, never all-pairs;
- Jaccard verification joins shingle sets only for candidate pairs.

Portable hashing (oracle parity): the permutation family is
``md5(f"{i}:" + shingle)`` compared AS A HEX STRING — the
lexicographic min of a fixed-width lowercase-hex string is exactly
the numeric min of the 128-bit hash, and DuckDB's ``md5()`` produces
byte-identical hex, so the whole signature (and the band keys, which
are md5 of the concatenated band slice) is recomputable in the oracle
SQL. JVM-side throughput is fine: md5 of short strings is
codegen'd, and the min-agg is map-side combinable either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """k-word shingles, distinct per doc: (id, shingle)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = F.split(norm, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def minhash_signatures(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min over shingles of
    md5(f"{i}:" + shingle), compared as hex strings (== numeric min of
    the 128-bit hash). One groupBy; map-side partial min."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy(id_col).agg(*aggs)
    return wide.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures, bucket-join on (band, band_hash):
    (id_a, id_b) candidate pairs with id_a < id_b.

    ``max_bucket_size`` is the flood guard for corpus scale: a bucket
    holding n docs contributes n² candidate rows, so one degenerate
    bucket (boilerplate-dominated signatures) can flood a shuffle
    partition. Buckets above the cap are dropped via a broadcast
    anti-join (the flooded set has <= n_rows/cap members by
    construction, so the broadcast is always small). This trades
    bounded recall — a pair only hashed together in flooded buckets is
    missed — for a hard ceiling on join fan-out; run exact dedup first
    so identical-document floods never reach this operator."""
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # md5 of the '|'-joined band slice: a compact
                        # 32-char join key DuckDB reproduces exactly
                        # (vs F.hash/murmur, which has no SQL twin)
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    if max_bucket_size is not None:
        flooded = (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("band", "band_hash")
        )
        banded = banded.join(
            F.broadcast(flooded), ["band", "band_hash"], "left_anti"
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), "band", "band_hash"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band", "band_hash"
    )
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs:
    |A ∩ B| / |A ∪ B| via a shingle equi-join restricted to candidates."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, on="id_a")
        .join(zb, on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    persist_shingles: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash -> LSH -> verify.

    The shingle set feeds BOTH the signature path and the Jaccard
    verification join; without persistence Spark recomputes the
    regex/explode pipeline once per consumer — at corpus scale that is
    the single largest cost in the DAG, so it is persisted
    (memory-and-disk, spills instead of OOM) by default.
    """
    sh = shingles(docs, id_col, text_col, k)
    if persist_shingles:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, bands, max_bucket_size)
    return jaccard_verify(cand, sh, id_col, threshold)
