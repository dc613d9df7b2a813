"""Passage-level dedup (dedup/passage.py): planted-boilerplate
semantics, empty-document handling, and partitioning invariance."""

from __future__ import annotations

from neuroimaging_data_pipeline_spark.dedup.passage import (
    passage_dedup_stats,
    passages,
)

BOILER = "all rights reserved no part may be reproduced without permission"
UNIQUE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten",
    "red orange yellow green blue indigo violet black white gray",
]


def test_passages_unit(spark):
    """10-word chunking: word counts, trailing short passage, empty
    doc yields no rows."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),  # 12 words -> 10 + 2
            (2, ""),
            (3, None),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    p = passages(docs).toPandas().sort_values(["doc_id", "passage_idx"])
    assert list(p["doc_id"]) == [1, 1, 4]
    assert list(p["n_words"]) == [10, 2, 1]


def test_boilerplate_stripped_but_documents_survive(spark):
    """Three documents share a leading boilerplate passage; each keeps
    its unique tail, and only the FIRST doc (min doc_id) keeps the
    boilerplate — the span-level semantics whole-doc dedup cannot
    express."""
    rows = [(i, f"{BOILER} {u}") for i, u in enumerate(UNIQUE)]
    rows.append((99, ""))  # empty doc must not vanish
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        passage_dedup_stats(docs.repartition(3))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 4
    # each non-empty doc = 2 passages (10-word boiler + 10-word unique)
    assert list(out.loc[[0, 1, 2], "n_passages"]) == [2, 2, 2]
    # doc 0 keeps both; docs 1,2 lose the boilerplate, keep the unique
    assert list(out.loc[[0, 1, 2], "n_kept"]) == [2, 1, 1]
    assert list(out.loc[[0, 1, 2], "n_words_kept"]) == [20, 10, 10]
    assert out.loc[99, "n_passages"] == 0
    assert out.loc[99, "n_kept"] == 0


def test_fuzzy_pairs_semantics(spark):
    """Edit-distance pairing: typo'd near-dups pair within their
    block, distance is the true levenshtein, unrelated docs don't
    pair, and a flooded block is dropped by the cap."""
    from neuroimaging_data_pipeline_spark.dedup.fuzzy import fuzzy_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    typo = "the quick brwon fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, typo),  # one transposition -> dist 2 on the 48-prefix
        (3, "completely different content that matches nothing else at all"),
    ]
    # flood block: 70 same-prefix docs exceed max_block=64 -> dropped
    rows += [(100 + i, f"flood flood flood flood flood doc {i}") for i in range(70)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = fuzzy_pairs(docs.repartition(4), max_dist=8).toPandas()
    pairs = {(r.id_a, r.id_b): r.dist for r in out.itertuples()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 2
    assert all(a not in (3,) and b not in (3,) for a, b in pairs)
    assert not any(a >= 100 for a, b in pairs)  # flooded block dropped


def test_partitioning_invariance(spark):
    """First-occurrence is ordered by (doc_id, idx), not partition
    layout: results identical at 1 and 7 partitions."""
    rows = [(i, f"{UNIQUE[i % 3]} {BOILER}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = (
        passage_dedup_stats(docs.coalesce(1))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        passage_dedup_stats(docs.repartition(7))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # 3 distinct unique-passages + 1 boilerplate = 4 kept corpus-wide
    assert int(a["n_kept"].sum()) == 4


def test_pagerank_hand_computed(spark):
    """3-iteration PageRank on a path graph A-B-C plus isolated D:
    matches the recurrence computed by hand; the center node B
    outranks the ends; the isolated node holds the teleport floor."""
    from neuroimaging_data_pipeline_spark.dedup.cluster import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "id_a long, id_b long"
    )
    out = (
        pagerank(nodes, pairs, n_iter=3)
        .toPandas()
        .set_index("id")["pr"]
        .to_dict()
    )
    # hand recurrence: N=4, d=0.85; deg A=1 B=2 C=1, D isolated
    n, d = 4, 0.85
    pr = {v: 1 / n for v in range(4)}
    for _ in range(3):
        nxt = {}
        for v in range(4):
            if v == 0:
                s = pr[1] / 2
            elif v == 1:
                s = pr[0] / 1 + pr[2] / 1
            elif v == 2:
                s = pr[1] / 2
            else:
                s = 0.0
            nxt[v] = (1 - d) / n + d * s
        pr = nxt
    for v in range(4):
        assert abs(out[v] - pr[v]) < 1e-9, (v, out[v], pr[v])
    assert out[1] > out[0] == out[2] > out[3]


def test_contamination_planted(spark):
    """Contamination detection: a training doc embedding a probe's
    exact 8-gram is flagged with the right hit count; clean docs
    report zero; partial (7-word) overlaps do NOT count."""
    from neuroimaging_data_pipeline_spark.dedup.contamination import (
        contamination_overlap,
    )

    bench = "the quick brown fox jumps over the lazy dog every day"
    rows_probe = [(0, bench)]
    rows_train = [
        # contains the probe's words 1..8 verbatim (one 8-gram hit,
        # plus the 8-gram starting at word 2 = words 2..9 -> 2 hits)
        (10, "prefix words " + bench + " suffix"),
        # shares only 7 consecutive words -> ZERO 8-gram hits
        (11, "the quick brown fox jumps over the cat sat here now"),
        (12, "completely unrelated text with nothing shared at all here ok"),
    ]
    probe = spark.createDataFrame(rows_probe, "doc_id long, text string")
    train = spark.createDataFrame(rows_train, "doc_id long, text string")
    out = (
        contamination_overlap(train, probe, k=8)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[10, "n_hits"] == 4  # probe has 4 distinct 8-grams, all present
    assert out.loc[11, "n_hits"] == 0
    assert out.loc[12, "n_hits"] == 0
    assert out.loc[10, "overlap_frac"] > 0
