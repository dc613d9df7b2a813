"""Content-defined chunking (dedup/cdc.py): boundary semantics and
the shift-resistance property that justifies CDC over fixed-stride
passage dedup."""

from __future__ import annotations

import hashlib

import pytest

from neuroimaging_data_pipeline_spark.dedup.cdc import (
    CDC_D,
    CDC_W,
    cdc_chunks,
)

TEXT = (
    "the quick brown fox jumps over the lazy dog while a crawler "
    "collects pages and a pipeline chunks them into pieces for dedup "
    "across very many shards of a very large corpus of documents"
) * 3


def _py_chunks(s: str) -> list[str]:
    """Independent pure-Python reference of the same boundary rule."""
    cuts = [
        i + CDC_W - 1
        for i in range(1, len(s) - CDC_W + 2)
        if int(hashlib.md5(s[i - 1 : i - 1 + CDC_W].encode()).hexdigest()[:4], 16)
        % CDC_D
        == 0
    ]
    ends = sorted(set(cuts + [len(s)]))
    out, prev = [], 0
    for e in ends:
        out.append(s[prev:e])
        prev = e
    return out


@pytest.fixture(scope="module")
def chunk_of(spark):
    def _run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = cdc_chunks(df).collect()
        out: dict[int, list[tuple[int, int, str]]] = {}
        for r in rows:
            out.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_len"], r["chunk_md5"])
            )
        return {k: [x[1:] for x in sorted(v)] for k, v in out.items()}

    return _run


def test_matches_python_reference(chunk_of):
    got = chunk_of([TEXT])[0]
    want = [
        (len(c), hashlib.md5(c.encode()).hexdigest()) for c in _py_chunks(TEXT)
    ]
    assert got == want
    assert len(got) > 3  # the fixture really produces multiple chunks
    assert sum(l for l, _ in got) == len(TEXT)  # chunks tile the doc


def test_shift_resistance(chunk_of):
    """Prepending text changes only a bounded prefix of chunks: the
    chunk-hash multiset of the shifted doc shares its whole tail with
    the original — the property fixed-stride windows lack."""
    shifted = "inserted preamble words here " + TEXT
    res = chunk_of([TEXT, shifted])
    orig_hashes = [h for _, h in res[0]]
    shif_hashes = [h for _, h in res[1]]
    # all original chunks except a bounded prefix survive verbatim
    common_tail = 0
    while (
        common_tail < min(len(orig_hashes), len(shif_hashes))
        and orig_hashes[-1 - common_tail] == shif_hashes[-1 - common_tail]
    ):
        common_tail += 1
    assert common_tail >= len(orig_hashes) - 2, (
        common_tail,
        len(orig_hashes),
    )


def test_short_doc_single_chunk(chunk_of):
    got = chunk_of(["tiny"])[0]
    assert got == [(4, hashlib.md5(b"tiny").hexdigest())]


def test_vectorized_md5_kernel_matches_hashlib():
    """The r5 numpy-vectorized single-block MD5 boundary kernel is
    bit-exact against per-window hashlib, including batch slicing
    (no window may cross a document boundary), empties, sub-window
    docs, and the non-ASCII fallback path."""
    import random
    import string

    import numpy as np

    from neuroimaging_data_pipeline_spark.dedup.cdc import (
        _cut_ends,
        _cut_ends_batch,
        _md5_prefix16_all_windows,
    )

    rng = random.Random(99)
    s = "".join(rng.choice(string.printable[:95]) for _ in range(400))
    pref = _md5_prefix16_all_windows(
        np.frombuffer(s.encode(), dtype=np.uint8), CDC_W
    )
    for p in range(len(s) - CDC_W + 1):
        want = int.from_bytes(
            hashlib.md5(s[p : p + CDC_W].encode()).digest()[:2], "big"
        )
        assert int(pref[p]) == want, p

    texts = [
        "".join(
            rng.choice(string.ascii_lowercase + " .,")
            for _ in range(rng.randint(0, 800))
        )
        for _ in range(60)
    ] + ["", "tiny", "x" * CDC_W, "y" * (CDC_W - 1), "naïve façade " * 20]
    assert _cut_ends_batch(texts) == [_cut_ends(t) for t in texts]
