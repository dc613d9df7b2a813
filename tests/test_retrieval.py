"""BM25 retrieval semantics (text/retrieval.py): hand-computed scores
on a tiny corpus, rarity and length normalization behavior."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.retrieval import bm25_topk


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).withColumns(
        {"lang": F.lit("en"), "source": F.lit("s"), "n_chars": F.lit(1)}
    )


def test_bm25_hand_computed(spark):
    # 4 docs; "rare" in one doc, "common" in all
    rows = [
        (0, "rare common common"),
        (1, "common alpha beta"),
        (2, "common common common"),
        (3, "common"),
    ]
    docs = _mkdocs(spark, rows)
    out = bm25_topk(docs, [(0, "rare"), (1, "common")], k=4).toPandas()

    n, avgdl = 4, (3 + 3 + 3 + 1) / 4.0
    # query 0: only doc 0 contains "rare"
    q0 = out[out.query_id == 0]
    assert list(q0.doc_id) == [0]
    np.testing.assert_allclose(
        q0.score.iloc[0], round(_bm25(1, 1, n, 3, avgdl), 6), atol=1e-9
    )
    # query 1: every doc matches; higher tf wins, shorter doc wins at
    # equal tf (doc 3: tf=1, dl=1 beats doc 1: tf=1, dl=3)
    q1 = out[out.query_id == 1].sort_values("score", ascending=False)
    assert len(q1) == 4
    assert q1.doc_id.iloc[0] == 2  # tf=3
    scores = {r.doc_id: r.score for r in q1.itertuples()}
    assert scores[3] > scores[1]
    np.testing.assert_allclose(
        scores[2], round(_bm25(3, 4, n, 3, avgdl), 6), atol=1e-9
    )


def test_bm25_multi_term_sum_and_k(spark):
    rows = [
        (0, "x y"),
        (1, "x x x x"),
        (2, "y"),
        (3, "z z"),
    ]
    docs = _mkdocs(spark, rows)
    out = bm25_topk(docs, [(7, "x y")], k=2).toPandas()
    # doc 0 matches both terms -> its score is the SUM of both
    # contributions and beats the single-term docs; k=2 truncates.
    assert len(out) == 2
    assert out.sort_values("score", ascending=False).doc_id.iloc[0] == 0
    n, avgdl = 4, (2 + 4 + 1 + 2) / 4.0
    want = round(
        _bm25(1, 2, n, 2, avgdl) + _bm25(1, 2, n, 2, avgdl), 6
    )
    np.testing.assert_allclose(out.score.max(), want, atol=1e-9)


def test_bm25_ignores_dup_query_terms_and_case(spark):
    rows = [(0, "alpha beta"), (1, "beta")]
    docs = _mkdocs(spark, rows)
    a = bm25_topk(docs, [(0, "Alpha ALPHA alpha")], k=5).toPandas()
    b = bm25_topk(docs, [(0, "alpha")], k=5).toPandas()
    assert a.equals(b)


def _knn_brute(V, ids, k):
    """Reference top-k with the same (rounded cosine desc, id asc) key."""
    import numpy as np

    n = np.sqrt((V * V).sum(axis=1))
    S = np.round((V @ V.T) / np.outer(n, n), 6)
    out = set()
    for i in range(len(ids)):
        cand = [
            (-S[i, j], ids[j]) for j in range(len(ids)) if ids[j] != ids[i]
        ]
        for negc, nid in sorted(cand)[:k]:
            out.add((ids[i], nid, -negc))
    return out


def test_knn_graph_matches_brute_force(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.cosine import knn_graph

    rng = np.random.default_rng(7)
    V = rng.normal(size=(40, 8))
    # plant an exact duplicate pair: 13 is a copy of 5
    V[13] = V[5]
    ids = list(range(40))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_id, r.nbr_id, r.cosine)
        for r in knn_graph(emb, k=3, n_blocks=3).collect()
    }
    want = _knn_brute(V, ids, 3)
    assert got == want
    # the planted duplicate is its twin's top neighbor at cosine 1.0
    assert (5, 13, 1.0) in got and (13, 5, 1.0) in got


def test_semdedup_keeps_one_representative(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.dedup.semantic import semantic_dedup

    # two orthogonal directions -> two k-means cells (seeds = ids 0,1);
    # near-dup groups only form within a direction
    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = [
        (0, [float(x) for x in a]),
        (1, [float(x) for x in b]),
        (2, [float(x) for x in a * 3]),    # dup of 0 -> dropped (0 < 2)
        (3, [float(x) for x in b * 0.5]),  # dup of 1 -> dropped
        (4, [0.0, 0.9, 0.1, 0.0]),  # near 1 (cos ~ .994) -> dropped
        (5, [0.7, 0.0, 0.714, 0.0]),  # cos to a ~ .70: survives at t=.9
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r.vec_id: (r.cid, r.kept)
        for r in semantic_dedup(
            emb, n_cells=2, lloyd_iters=0, threshold=0.9
        ).collect()
    }
    assert len(out) == 6
    # threshold .9: 2 dups 0, 3 and 4 dup 1; 5 (cos .70 to a) survives
    assert out[0][1] == 1 and out[1][1] == 1 and out[5][1] == 1
    assert out[2][1] == 0 and out[3][1] == 0 and out[4][1] == 0
    # cluster blocking: same-direction vectors share a cell
    assert out[0][0] == out[2][0] == out[5][0]
    assert out[1][0] == out[3][0] == out[4][0]


def test_semdedup_identical_corpus_keeps_min_id(spark):
    from neuroimaging_data_pipeline_spark.dedup.semantic import semantic_dedup

    v = [0.5, 0.5, 0.5]
    emb = spark.createDataFrame(
        [(i, v) for i in range(9)], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup(emb, n_cells=3, lloyd_iters=1, threshold=0.99)
    kept = sorted(r.vec_id for r in out.filter("kept = 1").collect())
    # identical vectors all land in one cell; only the smallest id survives
    assert kept == [0]


def test_mixture_sample_semantics(spark):
    from neuroimaging_data_pipeline_spark.text.mixing import (
        MIX_BUCKETS,
        mixture_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        df, {"a": MIX_BUCKETS, "b": MIX_BUCKETS // 2}
    ).toPandas()
    # full-rate group keeps everything; halved group keeps ~half,
    # and exactly the rows whose bucket < 500
    assert (out[out.source == "a"].shape[0]) == 200
    nb = out[out.source == "b"].shape[0]
    assert 60 <= nb <= 140
    assert (out.bucket < MIX_BUCKETS).all()
    # absent group = dropped (allowlist semantics)
    out2 = mixture_sample(df, {"a": MIX_BUCKETS}).toPandas()
    assert set(out2.source) == {"a"}
    # determinism under repartitioning
    out3 = mixture_sample(
        df.repartition(13), {"a": MIX_BUCKETS, "b": MIX_BUCKETS // 2}
    ).toPandas()
    assert sorted(out3.doc_id) == sorted(out.doc_id)


def test_chunk_sliding_semantics(spark):
    from neuroimaging_data_pipeline_spark.text.chunking import chunk_sliding

    text = " ".join(f"w{i}" for i in range(33))  # 33 tokens
    docs = spark.createDataFrame(
        [(0, text), (1, "a b"), (2, "   ")], "doc_id long, text string"
    )
    out = chunk_sliding(docs, chunk_size=32, stride=24).toPandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_idx")
    # starts 0 and 24: [0..32) full, [24..33) short
    assert list(d0.start_tok) == [0, 24]
    assert list(d0.n_tokens) == [32, 9]
    # short doc -> one short chunk; empty doc -> no chunks
    d1 = out[out.doc_id == 1]
    assert list(d1.n_tokens) == [2]
    assert (out.doc_id == 2).sum() == 0
    # chunk content hash matches the slice it claims
    import hashlib

    toks = text.split()
    want = hashlib.md5(" ".join(toks[24:33]).encode()).hexdigest()
    assert d0[d0.chunk_idx == 1].chunk_md5.iloc[0] == want


def test_pack_blocks_semantics(spark):
    from neuroimaging_data_pipeline_spark.text.chunking import pack_blocks

    rows = [
        (0, "s", " ".join(["x"] * 100)),
        (1, "s", " ".join(["x"] * 50)),
        (2, "s", " ".join(["x"] * 10)),
        (3, "t", " ".join(["x"] * 5)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r.doc_id: r for r in pack_blocks(docs, block_size=64).collect()
    }
    # stream s: doc0 [0,100) blocks 0-1; doc1 [100,150) blocks 1-2;
    # doc2 [150,160) block 2. stream t packs independently.
    assert (out[0].start_tok, out[0].first_block, out[0].last_block) == (0, 0, 1)
    assert (out[1].start_tok, out[1].first_block, out[1].last_block) == (100, 1, 2)
    assert (out[2].start_tok, out[2].first_block, out[2].last_block) == (150, 2, 2)
    assert (out[3].start_tok, out[3].first_block, out[3].last_block) == (0, 0, 0)


def test_source_cap_semantics(spark):
    from neuroimaging_data_pipeline_spark.text.mixing import source_cap

    rows = [(i, "big" if i < 30 else "small") for i in range(35)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_cap(df, cap=10).toPandas()
    assert (out.source == "big").sum() == 10      # capped
    assert (out.source == "small").sum() == 5     # under cap: all kept
    assert out.rk.max() <= 10
    # deterministic across partitionings
    out2 = source_cap(df.repartition(7), cap=10).toPandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_quantize_int8_roundtrip_error_bound(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.quantize import (
        quantize_int8_summary,
    )

    rng = np.random.default_rng(5)
    rows = [
        (0, [float(x) for x in rng.normal(size=16)]),
        (1, [2.5] * 8),                      # constant vector
        (2, [float(i) for i in range(256)]),  # exactly representable grid
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in quantize_int8_summary(emb).collect()}
    # error bounded by half a quantization step
    v0 = np.array(rows[0][1])
    step = (v0.max() - v0.min()) / 255.0
    assert out[0].mean_abs_err <= step / 2 + 1e-12
    # constant vector: zero codes, zero error
    assert out[1].code_sum == 0 and out[1].mean_abs_err == 0.0
    assert out[1].vmin == 2.5 and out[1].vmax == 2.5
    # 0..255 grid quantizes exactly: codes 0..255, zero error
    assert out[2].code_sum == sum(range(256))
    assert out[2].mean_abs_err == 0.0


def test_weighted_sample_semantics(spark):
    import collections

    from neuroimaging_data_pipeline_spark.text.mixing import weighted_sample

    rows = [(i, "g", 1000 if i < 5 else 1) for i in range(105)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = weighted_sample(df, k=10, weight_col="n_chars").toPandas()
    assert len(out) == 10
    # 1000x weight: the 5 heavy docs are near-certainly all sampled
    heavy = set(out[out.doc_id < 5].doc_id)
    assert heavy == {0, 1, 2, 3, 4}
    # determinism across partitionings
    out2 = weighted_sample(
        df.repartition(9), k=10, weight_col="n_chars"
    ).toPandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)
    # zero/negative weights excluded
    df0 = spark.createDataFrame(
        [(0, "g", 0), (1, "g", -3), (2, "g", 7)],
        "doc_id long, source string, n_chars long",
    )
    out3 = weighted_sample(df0, k=5, weight_col="n_chars").toPandas()
    assert list(out3.doc_id) == [2]

    # frequency sanity over many disjoint groups: heavier doc wins
    # its group most of the time (w=4 vs 1 -> P(win) = 4/5)
    rows = []
    for g in range(200):
        rows += [(2 * g, f"s{g}", 4), (2 * g + 1, f"s{g}", 1)]
    big = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    won = collections.Counter(
        "heavy" if r.doc_id % 2 == 0 else "light"
        for r in weighted_sample(big, k=1, weight_col="n_chars").collect()
    )
    assert 130 <= won["heavy"] <= 190  # E=160, sd~5.7


def test_logreg_gd_matches_numpy(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.operators.logreg import logreg_gd

    rng = np.random.default_rng(9)
    X = np.column_stack(
        [np.ones(120), rng.normal(size=120), rng.normal(size=120)]
    )
    true_w = np.array([0.3, -1.2, 0.7])
    y = (1 / (1 + np.exp(-(X @ true_w))) > 0.5).astype(float)
    feats = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t)) for a, b, c, t in
         np.column_stack([X, y])],
        "x0 double, x1 double, x2 double, y double",
    )
    traj = logreg_gd(feats, ["x0", "x1", "x2"], "y", n_iters=5, lr=0.5)

    # numpy reference of the same full-batch GD
    w = np.zeros(3)
    ref = []
    for _ in range(5):
        g = ((y - 1 / (1 + np.exp(-(X @ w))))[:, None] * X).sum(axis=0)
        w = w + 0.5 * (g / len(y))
        ref.append(w.copy())
    for got, want in zip(traj, ref):
        np.testing.assert_allclose(got, want, rtol=1e-9)
    # training moves toward the separator: accuracy improves over w=0
    final = np.asarray(traj[-1])
    acc = ((1 / (1 + np.exp(-(X @ final))) > 0.5) == (y > 0.5)).mean()
    assert acc > 0.85


def test_incremental_dedup_statuses(spark):
    from neuroimaging_data_pipeline_spark.dedup.exact import incremental_dedup

    index = spark.createDataFrame(
        [(100, "old news here"), (101, "other old text")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (0, "Old   NEWS here"),   # normalizes to an index doc
            (1, "fresh content"),     # new
            (2, "fresh  CONTENT"),    # within-batch repeat of 1
            (3, "fresh content"),     # another repeat of 1
            (4, "also unseen"),       # new
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.status
        for r in incremental_dedup(batch, index).collect()
    }
    assert got == {
        0: "dup_of_index",
        1: "new",
        2: "dup_in_batch",
        3: "dup_in_batch",
        4: "new",
    }


def _ks_ref(a, b):
    """Reference exact two-sample KS on integer samples."""
    import numpy as np

    pts = sorted(set(a) | set(b))
    a, b = np.asarray(a), np.asarray(b)
    return max(
        abs((a <= v).mean() - (b <= v).mean()) for v in pts
    )


def test_ks_drift_matches_reference(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.operators.drift import ks_drift

    rng = np.random.default_rng(3)
    rows = []
    samples = {
        "g0": rng.integers(0, 50, 200),     # uniform low
        "g1": rng.integers(25, 75, 150),    # shifted
        "g2": rng.integers(0, 50, 100),     # same law as g0
    }
    for g, vals in samples.items():
        rows += [(g, int(v)) for v in vals]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: (r.n, r.ks) for r in ks_drift(df, "n_chars", "source").collect()}
    for g, vals in samples.items():
        rest = np.concatenate([v for k, v in samples.items() if k != g])
        want = round(_ks_ref(list(vals), list(rest)), 6)
        assert got[g][0] == len(vals)
        assert abs(got[g][1] - want) < 1e-9, (g, got[g], want)
    # shifted group drifts much harder than the twin groups
    assert got["g1"][1] > got["g0"][1] and got["g1"][1] > got["g2"][1]


def test_auc_drift_matches_reference(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.operators.drift import auc_drift

    rng = np.random.default_rng(13)
    samples = {
        "lo": rng.integers(0, 40, 120),
        "hi": rng.integers(20, 60, 90),
        "mid": rng.integers(10, 50, 100),
    }
    rows = [(g, int(v)) for g, vals in samples.items() for v in vals]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: (r.n, r.auc) for r in auc_drift(df, "n_chars", "source").collect()}

    def ref_auc(a, rest):
        a = np.asarray(a)[:, None]
        r = np.asarray(rest)[None, :]
        return ((a > r).sum() + 0.5 * (a == r).sum()) / (a.size * r.size)

    for g, vals in samples.items():
        rest = np.concatenate([v for k, v in samples.items() if k != g])
        want = round(float(ref_auc(vals, rest)), 6)
        assert got[g][0] == len(vals)
        assert abs(got[g][1] - want) < 1e-9, (g, got[g][1], want)
    # directionality: the high group dominates (auc > .5), low is below
    assert got["hi"][1] > 0.5 > got["lo"][1]


def test_ks_drift_disjoint_is_one(spark):
    from neuroimaging_data_pipeline_spark.operators.drift import ks_drift

    rows = [("a", v) for v in range(10)] + [("b", v + 100) for v in range(10)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r.ks for r in ks_drift(df, "n_chars", "source").collect()}
    assert got == {"a": 1.0, "b": 1.0}


def test_drift_null_values_excluded(spark):
    """ADVICE r4 (medium): NULLs in value_col must be EXCLUDED — not
    dropped from one CDF while still counted in n_g/g_cum, and not
    subject to the engines' opposite NULL ordering. Contract: result
    on a nullable column == result on the pre-filtered column, and
    the DuckDB twin agrees on the same data."""
    import duckdb
    import pandas as pd

    from neuroimaging_data_pipeline_spark.operators.drift import (
        auc_drift,
        auc_drift_sql,
        ks_drift,
        ks_drift_sql,
    )

    rows = (
        [("a", v) for v in range(20)]
        + [("b", v + 10) for v in range(15)]
        + [("a", None)] * 7          # NULL-heavy group
        + [("b", None)] * 2
    )
    df = spark.createDataFrame(rows, "source string, n_chars long")
    clean = df.na.drop(subset=["n_chars"])

    for op in (ks_drift, auc_drift):
        with_nulls = {
            tuple(r) for r in op(df, "n_chars", "source").collect()
        }
        without = {
            tuple(r) for r in op(clean, "n_chars", "source").collect()
        }
        assert with_nulls == without, op.__name__
        # n excludes the NULL rows
        ns = {r[0]: r[1] for r in with_nulls}
        assert ns == {"a": 20, "b": 15}, op.__name__

    # oracle twin parity on the identical nullable data
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["source", "n_chars"])
    con.register("documents", pdf)
    for op, sql in (
        (ks_drift, ks_drift_sql("n_chars", "source")),
        (auc_drift, auc_drift_sql("n_chars", "source")),
    ):
        eng = {tuple(r) for r in op(df, "n_chars", "source").collect()}
        ora = {
            tuple(r)
            for r in con.execute(sql).df().itertuples(index=False)
        }
        assert eng == ora, op.__name__


def test_knn_graph_block_count_invariance(spark):
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.cosine import knn_graph

    rng = np.random.default_rng(11)
    V = rng.normal(size=(25, 6))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(25)],
        "vec_id long, embedding array<double>",
    )
    a = {
        tuple(r) for r in knn_graph(emb, k=2, n_blocks=1).collect()
    }
    b = {
        tuple(r) for r in knn_graph(emb, k=2, n_blocks=5).collect()
    }
    assert a == b


def test_ivfpq_refine_recall_clustered(spark):
    """The shipped s_ivfpq_topk config (n_cells=16, nprobe=2, m=4,
    k_codes=32, refine_r=100) reaches recall@5 >= 0.8 against exact
    L2 on a CLUSTERED fixture (16-Gaussian mixture — the regime real
    embedding corpora live in; r4's structureless-uniform grid
    measured 0.24 because there was no structure to exploit). Scan
    cost stays nprobe/n_cells = 12.5% of codes + exact math on
    refine_r/n = 5% of raw vectors."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.pq import ivfpq_topk
    from tools.ann_recall_grid import clustered_fixture, exact_l2_top5

    n = 2000
    pts, _ = clustered_fixture(n, 16)
    qids = list(range(5))
    truth = exact_l2_top5(pts.astype(np.float64), qids)

    emb = spark.createDataFrame(
        [(i, [float(v) for v in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    queries = emb.filter(F.col("vec_id") < len(qids))
    res = ivfpq_topk(
        emb, queries, n_cells=16, nprobe=2, m=4, k_codes=32, k=5,
        refine_r=100,
    ).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, []).append(r.vec_id)
    hits = sum(len(set(got.get(q, [])) & set(truth[q])) for q in qids)
    recall = hits / (5 * len(qids))
    assert recall >= 0.8, recall


def test_naive_bayes_classifies_separable_corpus(spark):
    """NB trained on a clearly separable labeled corpus predicts the
    training labels back (self-scoring sanity) and matches a
    hand-computed score on a tiny case."""
    import math

    from neuroimaging_data_pipeline_spark.text.nbayes import nb_train_score

    rows = (
        [(i, "le chat mange du pain", "fr") for i in range(5)]
        + [(10 + i, "the dog eats some bread", "en") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: (r.predicted, r.score)
           for r in nb_train_score(docs).collect()}
    for i in range(5):
        assert out[i][0] == "fr", out[i]
        assert out[10 + i][0] == "en", out[10 + i]
    # hand-check doc 0: V=10 distinct words, N_fr=25 tokens,
    # every fr token count = 5 -> ll = 5 * ln(6/35); prior = ln(0.5)
    want = round(5 * round(math.log(6 / 35) * 1e10) / 1e10
                 + math.log(0.5), 6)
    assert abs(out[0][1] - want) < 2e-6, (out[0][1], want)


def test_mmr_diversifies_near_duplicate_pool(spark):
    """Planted structure: the top of the relevance pool is a cluster
    of near-identical vectors plus one moderately relevant but
    DIFFERENT vector. Plain top-k returns the clones; MMR (lambda=.7)
    must pull the diverse vector in early and never pick two clones
    back to back at ranks 1-2."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.mmr import mmr_rerank

    # Worked numbers at lambda=.7: identical clones at rel=.9 score
    # .7*.9 - .3*1.0 = .33 once one is picked; the diverse vector at
    # rel=.85 with sim-to-clone = .85*.9 = .765 scores
    # .7*.85 - .3*.765 = .3655 > .33 -> MMR must take it at rank 2,
    # which plain top-k never would (all clones outrank it on rel).
    e = lambda i: [1.0 if j == i else 0.0 for j in range(8)]  # noqa: E731
    clone = [0.9, 0.0, (1 - 0.81) ** 0.5, 0.0, 0.0, 0.0, 0.0, 0.0]
    diverse = [0.85, (1 - 0.7225) ** 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [(0, e(0))]
    rows += [(i, list(clone)) for i in range(1, 6)]
    rows.append((6, diverse))
    rows += [(i, e(3 + i % 4)) for i in range(7, 12)]  # irrelevant filler
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id = 0")
    out = sorted(
        (r.rank, r.vec_id)
        for r in mmr_rerank(emb, queries, k=3, pool=10).collect()
    )
    picked = [v for _, v in out]
    assert picked[0] == 1, picked       # highest-rel clone, id tie-break
    assert picked[1] == 6, picked       # diversity beats the twin clones
    assert picked[2] in {2, 3, 4, 5}, picked


def test_epoch_shuffle_semantics(spark):
    from neuroimaging_data_pipeline_spark.text.mixing import epoch_shuffle

    rows = [(i,) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long")
    out = epoch_shuffle(df, key_col="doc_id").toPandas()
    # a permutation: every input row exactly once
    assert sorted(out.doc_id) == list(range(500))
    # pos ranks are dense 1..n within each shard, in shuffle_key order
    for shard, grp in out.groupby("shard"):
        grp = grp.sort_values("pos")
        assert list(grp.pos) == list(range(1, len(grp) + 1))
        assert list(grp.shuffle_key) == sorted(grp.shuffle_key)
    # md5 hash is uniform: no shard is empty or hot at n=500, k=8
    sizes = out.groupby("shard").size()
    assert len(sizes) == 8 and sizes.min() > 30 and sizes.max() < 100
    # determinism under repartitioning (rand() would fail this)
    out2 = epoch_shuffle(df.repartition(17), key_col="doc_id").toPandas()
    merged = out.merge(out2, on="doc_id", suffixes=("", "_b"))
    assert (merged.shard == merged.shard_b).all()
    assert (merged.pos == merged.pos_b).all()
    # a different epoch seed is a different permutation
    out3 = epoch_shuffle(df, key_col="doc_id", seed="epoch8").toPandas()
    m3 = out.merge(out3, on="doc_id", suffixes=("", "_c"))
    assert not ((m3.shard == m3.shard_c) & (m3.pos == m3.pos_c)).all()
