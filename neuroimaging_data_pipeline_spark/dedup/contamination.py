"""Benchmark-contamination detection — the n-gram collision check
(the GPT-3/PaLM decontamination method): training documents that
share long word n-grams with an evaluation set leak the benchmark
into the training corpus and must be flagged before training.

Scale design: the probe side (the benchmark) is SMALL by definition —
its distinct k-gram set broadcasts; the training corpus explodes to
(doc, shingle-hash) pairs map-side and the hit-count is a broadcast
semi-join + partial-aggregated count. One shuffle (the per-doc
aggregate), no pair explosion, no corpus self-join — contamination
checking stays linear in corpus size no matter how many benchmarks
are stacked into the probe set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.dedup.minhash import shingles

CONTAM_K = 8


def contamination_overlap(
    docs: DataFrame,
    probe: DataFrame,
    k: int = CONTAM_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per training document, the overlap of its distinct k-word
    shingles with the probe set's: (doc_id, n_shingles, n_hits,
    overlap_frac). Documents with zero hits are kept (a complete
    decontamination report, not only the flagged tail)."""
    probe_sh = F.broadcast(
        shingles(probe, id_col, text_col, k=k).select("shingle").distinct()
    )
    train_sh = shingles(docs, id_col, text_col, k=k)
    totals = train_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        train_sh.join(probe_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                F.round(
                    F.coalesce("n_hits", F.lit(0))
                    / F.col("n_shingles").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("overlap_frac"),
        )
    )
