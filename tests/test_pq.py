"""Product quantization (similarity/pq.py) — parity with an
independent pure-numpy implementation of the same deterministic
discipline, plus the compression invariants."""

from __future__ import annotations

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.similarity.pq import pq_codebooks, pq_codes

SF_DIR = "/root/testdata/sf0.001"
M, K, SUB = 4, 8, 16


def _numpy_pq(vecs: dict[int, np.ndarray], lloyd_iters: int = 1):
    """Independent reference: same seeding/rounding/tie-break rules,
    written against numpy instead of DataFrame ops."""
    ids = sorted(vecs)
    cb = {
        (s, cid): np.array(vecs[cid][s * SUB : (s + 1) * SUB], dtype=np.float64)
        for s in range(M)
        for cid in ids[:K]
    }

    def assign(s, v):
        best = None
        for cid in sorted(cid for (ss, cid) in cb if ss == s):
            d = round(float(((v - cb[(s, cid)]) ** 2).sum()), 6)
            if best is None or d < best[1] or (d == best[1] and cid < best[0]):
                best = (cid, d)
        return best

    for _ in range(lloyd_iters):
        members: dict[tuple[int, int], list[np.ndarray]] = {}
        for i in ids:
            for s in range(M):
                v = vecs[i][s * SUB : (s + 1) * SUB].astype(np.float64)
                cid, _ = assign(s, v)
                members.setdefault((s, cid), []).append(v)
        for key, vs in members.items():
            cb[key] = np.round(np.mean(vs, axis=0), 6)
    return {
        (i, s): assign(s, vecs[i][s * SUB : (s + 1) * SUB].astype(np.float64))
        for i in ids
        for s in range(M)
    }


@pytest.fixture(scope="module")
def emb(spark):
    from neuroimaging_data_pipeline_spark.sources.tables import read_table

    return read_table(spark, SF_DIR, "embeddings").limit(60).cache()


def test_pq_codes_match_numpy(spark, emb):
    cbs = pq_codebooks(emb, m=M, k=K, lloyd_iters=1)
    got = {
        (r["vec_id"], r["subspace"]): (r["code"], r["sq_err"])
        for r in pq_codes(emb, cbs).collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in emb.collect()
    }
    want = _numpy_pq(vecs)
    assert set(got) == set(want)
    mismatched = {kk for kk in got if got[kk][0] != want[kk][0]}
    assert not mismatched, sorted(mismatched)[:5]
    for kk in got:
        assert got[kk][1] == pytest.approx(want[kk][1], abs=2e-6)


def test_lloyd_pass_reduces_total_error(spark, emb):
    seed_err = (
        pq_codes(emb, pq_codebooks(emb, m=M, k=K, lloyd_iters=0))
        .groupBy()
        .sum("sq_err")
        .first()[0]
    )
    trained_err = (
        pq_codes(emb, pq_codebooks(emb, m=M, k=K, lloyd_iters=1))
        .groupBy()
        .sum("sq_err")
        .first()[0]
    )
    assert trained_err < seed_err  # Lloyd monotonically improves
    codes = pq_codes(emb, pq_codebooks(emb, m=M, k=K, lloyd_iters=1))
    n_vec = emb.count()
    assert codes.count() == n_vec * M  # one code per (vector, subspace)


def test_ivfpq_recall_and_shape(spark, emb):
    """IVF-PQ returns k pruned-and-quantized neighbors per query and
    keeps usable recall against the exact L2 brute force (quality is
    bounded by nprobe pruning + 4x8 quantization — pinned to a floor,
    not to exactness, which is the whole point of the approximation)."""
    import numpy as np

    from neuroimaging_data_pipeline_spark.similarity.pq import ivfpq_topk

    queries = emb.filter("vec_id < 5")
    got = ivfpq_topk(emb, queries, n_cells=8, nprobe=2, m=M, k_codes=K, k=5)
    rows = got.collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert set(len(v) for v in by_q.values()) == {5}
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    recalls = []
    for qid, approx in by_q.items():
        d = {
            vid: float(((v - vecs[qid]) ** 2).sum())
            for vid, v in vecs.items()
            if vid != qid
        }
        exact = [vid for vid, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:5]]
        recalls.append(len(set(approx) & set(exact)) / 5)
    # Floor, not exactness: at this toy scale (60 vectors, 8-vector
    # seeded codebooks, nprobe=2 of 8 cells) pruning+quantization is
    # deliberately lossy — the floor is far above random (5/59≈0.08)
    # and the oracle pins the EXACT ADC semantics separately.
    assert sum(recalls) / len(recalls) >= 0.15, recalls
