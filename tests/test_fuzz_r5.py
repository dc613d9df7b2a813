"""Property tests over the round-5 operator family: sketch bounds,
salting balance, LZW/GIF fuzz, incremental-refresh associativity.
Pure-local (no Spark) where possible so the fuzz budget goes to the
algorithms, not session startup."""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=1, max_value=20000), st.integers(0, 2**31))
def test_hll_math_error_bound(n_distinct, seed):
    """The register/estimate math (replicated locally with the exact
    md5 bucketing) stays within 5 standard errors (~33%) of the true
    cardinality for any cardinality and value population."""
    from neuroimaging_data_pipeline_spark.operators.sketches import (
        HLL_P,
        HLL_W,
        _hll_alpha,
    )

    m = 1 << HLL_P
    rng = random.Random(seed)
    regs: dict[int, int] = {}
    for _ in range(n_distinct):
        v = rng.randrange(2**60)
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
        b = h >> HLL_W
        w = h & ((1 << HLL_W) - 1)
        rho = HLL_W + 1 if w == 0 else HLL_W + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    nz = len(regs)
    ssum = sum(2.0 ** -mj for mj in regs.values()) + (m - nz)
    e_raw = _hll_alpha(m) * m * m / ssum
    if e_raw <= 2.5 * m and nz < m:
        import math

        est = m * math.log(m / (m - nz))
    else:
        est = e_raw
    # 256 registers -> se ~6.5%; allow 5 se (and absolute slack for
    # tiny cardinalities where duplicates-by-hash dominate)
    assert abs(est - n_distinct) <= max(0.33 * n_distinct, 10), (
        n_distinct, est,
    )


@settings(max_examples=20, deadline=None)
@given(st.sets(st.integers(0, 10**9), min_size=0, max_size=400),
       st.sets(st.integers(0, 10**9), min_size=0, max_size=400))
def test_bloom_math_no_false_negatives(build, probe):
    """Local replica of the salted-position math: every build member
    probes positive, always."""
    from neuroimaging_data_pipeline_spark.operators.sketches import (
        BLOOM_K,
        BLOOM_M,
    )

    def pos(v):
        h = hashlib.md5(f"bloom:{v}".encode()).hexdigest()
        return [int(h[4 * k : 4 * k + 4], 16) % BLOOM_M
                for k in range(BLOOM_K)]

    bits = {p for v in build for p in pos(v)}
    for v in build:
        assert all(p in bits for p in pos(v))
    # false positives exist but members never read negative
    for v in probe & build:
        assert all(p in bits for p in pos(v))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=0, max_size=6000),
       st.sampled_from([2, 3, 5, 8]))
def test_lzw_fuzz_roundtrip(vals, nbits):
    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        lzw_decode,
        lzw_encode,
    )

    data = bytes(v % (1 << nbits) for v in vals)
    assert lzw_decode(lzw_encode(data, max(2, nbits)), max(2, nbits)) == data


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 2**31),
    st.sampled_from([2, 4, 8]),
    st.integers(1, 6),
    st.integers(0, 40),
)
def test_lzw_fuzz_width12_reset_boundaries(seed, nbits, n_motifs, jitter):
    """Randomized dictionary-reset fuzz (VERDICT r5 #8): COMPRESSIBLE
    streams (repeated random motifs) drive the code width to 12 and
    across multiple 4096-entry resets, with per-example jitter so the
    reset lands at a different phrase offset every time; random bytes
    alone rarely reach width 12 before overflowing."""
    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        lzw_decode,
        lzw_encode,
    )

    rng = random.Random(seed)
    motifs = [
        bytes(rng.randrange(1 << nbits) for _ in range(rng.randint(1, 9)))
        for _ in range(n_motifs)
    ]
    # long enough to cross >= 2 resets even at slow dict growth
    stream = bytearray(rng.randrange(1 << nbits) for _ in range(jitter))
    while len(stream) < 30_000:
        stream += rng.choice(motifs)
    data = bytes(stream)
    assert lzw_decode(lzw_encode(data, max(2, nbits)), max(2, nbits)) == data


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31))
def test_salt_positions_spread_hot_key(seed):
    """The salted-join discriminator hash spreads a hot key's rows
    over most of the S salt values (no degenerate bucketing)."""
    rng = random.Random(seed)
    n_salt = 8
    base = rng.randrange(10**6)
    salts = set()
    for i in range(200):
        h = hashlib.md5(f"salt:{base + i}".encode()).hexdigest()
        salts.add(int(h[:4], 16) % n_salt)
    assert len(salts) >= 6  # 200 draws over 8 cells: near-certain


def test_gif_fixture_fuzz_ids():
    """Every doc id in a wide range round-trips through the full
    encode/decode pipeline (exercises both even/odd frame counts and
    all palette indices)."""
    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        decode_gif,
        encode_gif_fixture,
        gif_frame_index,
    )

    for d in range(0, 120, 7):
        g = decode_gif(encode_gif_fixture(d))
        assert len(g["frames"]) == 2 + d % 3
        for i, (_, px) in enumerate(g["frames"]):
            assert (px == gif_frame_index(d, i)).all()
