"""CBOR codec (sources/cbor.py) pinned against the RFC 8949
Appendix A examples as literal hex — an external conformance pin
(encode must produce the published bytes, decode the published
value), plus indefinite-length forms and half-float edges."""

from __future__ import annotations

import math
import random

import pytest

from neuroimaging_data_pipeline_spark.sources.cbor import (
    UNDEFINED,
    Tag,
    decode,
    encode,
    float_to_half,
    half_to_float,
)

# (value, hex) rows straight from RFC 8949 Appendix A. Every row is
# checked BOTH ways: encode(value) == bytes and decode(bytes) == value.
APPENDIX_A = [
    (0, "00"),
    (1, "01"),
    (10, "0a"),
    (23, "17"),
    (24, "1818"),
    (25, "1819"),
    (100, "1864"),
    (1000, "1903e8"),
    (1000000, "1a000f4240"),
    (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"),
    (-10, "29"),
    (-100, "3863"),
    (-1000, "3903e7"),
    (0.0, "f90000"),
    (-0.0, "f98000"),
    (1.0, "f93c00"),
    (1.1, "fb3ff199999999999a"),
    (1.5, "f93e00"),
    (65504.0, "f97bff"),
    (100000.0, "fa47c35000"),
    (3.4028234663852886e38, "fa7f7fffff"),
    (1.0e300, "fb7e37e43c8800759c"),
    (5.960464477539063e-8, "f90001"),
    (0.00006103515625, "f90400"),
    (-4.0, "f9c400"),
    (-4.1, "fbc010666666666666"),
    (math.inf, "f97c00"),
    (-math.inf, "f9fc00"),
    (False, "f4"),
    (True, "f5"),
    (None, "f6"),
    (UNDEFINED, "f7"),
    (b"", "40"),
    (b"\x01\x02\x03\x04", "4401020304"),
    ("", "60"),
    ("a", "6161"),
    ("IETF", "6449455446"),
    ('"\\', "62225c"),
    ("ü", "62c3bc"),
    ("水", "63e6b0b4"),
    ([], "80"),
    ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    (list(range(1, 26)),
     "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
    ({}, "a0"),
    ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    (["a", {"b": "c"}], "826161a161626163"),
    ({"a": "A", "b": "B", "c": "C", "d": "D", "e": "E"},
     "a56161614161626142616361436164614461656145"),
    (Tag(0, "2013-03-21T20:04:00Z"),
     "c074323031332d30332d32315432303a30343a30305a"),
    (Tag(1, 1363896240), "c11a514b67b0"),
    (Tag(1, 1363896240.5), "c1fb41d452d9ec200000"),
    (Tag(23, b"\x01\x02\x03\x04"), "d74401020304"),
]


@pytest.mark.parametrize("value,hexs", APPENDIX_A,
                         ids=[h for _, h in APPENDIX_A])
def test_appendix_a_both_directions(value, hexs):
    blob = bytes.fromhex(hexs)
    assert encode(value) == blob
    got = decode(blob)
    if isinstance(value, float) and value == 0.0:
        # distinguish 0.0 from -0.0
        assert math.copysign(1.0, got) == math.copysign(1.0, value)
    assert got == value


def test_appendix_a_nan():
    assert encode(math.nan) == bytes.fromhex("f97e00")
    assert math.isnan(decode(bytes.fromhex("f97e00")))


# Appendix A indefinite-length rows (decode-only: the encoder always
# emits definite forms, which IS preferred serialization)
APPENDIX_A_INDEFINITE = [
    (b"\x01\x02\x03\x04\x05", "5f42010243030405ff"),
    ("streaming", "7f657374726561646d696e67ff"),
    ([], "9fff"),
    ([1, [2, 3], [4, 5]], "9f01820203820405ff"),
    ([1, [2, 3], [4, 5]], "9f018202039f0405ffff"),
    ([1, [2, 3], [4, 5]], "83018202039f0405ff"),
    ([1, [2, 3], [4, 5]], "83019f0203ff820405"),
    (list(range(1, 26)),
     "9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff"),
    ({"a": 1, "b": [2, 3]}, "bf61610161629f0203ffff"),
    (["a", {"b": "c"}], "826161bf61626163ff"),
    ({"Fun": True, "Amt": -2}, "bf6346756ef563416d7421ff"),
]


@pytest.mark.parametrize("value,hexs", APPENDIX_A_INDEFINITE,
                         ids=[h for _, h in APPENDIX_A_INDEFINITE])
def test_appendix_a_indefinite_decode(value, hexs):
    assert decode(bytes.fromhex(hexs)) == value


def test_half_float_exhaustive_roundtrip():
    # every one of the 65536 binary16 patterns decodes, and every
    # non-NaN decode re-encodes to a half (shortest form is itself)
    for h in range(0x10000):
        x = half_to_float(h)
        if math.isnan(x):
            continue
        h2 = float_to_half(x)
        assert h2 is not None
        assert half_to_float(h2) == x and math.copysign(
            1.0, half_to_float(h2)
        ) == math.copysign(1.0, x)


def test_preferred_serialization_is_shortest():
    # a double that fits a single must not be emitted as a double
    assert encode(100000.0)[0] == 0xFA
    assert encode(1.5)[0] == 0xF9
    assert encode(1.1)[0] == 0xFB
    assert len(encode(23)) == 1 and len(encode(24)) == 2
    assert len(encode(255)) == 2 and len(encode(256)) == 3


def test_structure_fuzz_roundtrip():
    rng = random.Random(11)

    def gen(depth=0):
        kinds = ["int", "neg", "str", "bytes", "float", "bool", "none"]
        if depth < 3:
            kinds += ["list", "dict", "tag"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randrange(0, 1 << 62)
        if k == "neg":
            return -rng.randrange(1, 1 << 62)
        if k == "str":
            return "".join(rng.choice("abcü水") for _ in range(rng.randrange(6)))
        if k == "bytes":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(6)))
        if k == "float":
            return rng.choice([0.5, -2.25, 3.14159, 1e40, 6.1e-5])
        if k == "bool":
            return rng.random() < 0.5
        if k == "none":
            return None
        if k == "list":
            return [gen(depth + 1) for _ in range(rng.randrange(4))]
        if k == "dict":
            return {rng.randrange(100): gen(depth + 1)
                    for _ in range(rng.randrange(4))}
        return Tag(rng.randrange(1 << 16), gen(depth + 1))

    for _ in range(2000):
        v = gen()
        assert decode(encode(v)) == v


def test_truncation_and_trailing_raise():
    blob = encode([1, "ab", {2: b"xyz"}])
    with pytest.raises(ValueError, match="truncated"):
        decode(blob[:-1])
    with pytest.raises(ValueError, match="trailing"):
        decode(blob + b"\x00")
