"""Punycode / IDNA (text/idn.py): RFC 3492 bootstring both
directions, fuzz-pinned byte-for-byte against the stdlib punycode
codec (external conformance pin), plus host-level ACE handling."""

from __future__ import annotations

import random

import pytest

from neuroimaging_data_pipeline_spark.text.idn import (
    host_to_ascii,
    host_to_unicode,
    punycode_decode,
    punycode_encode,
)

KNOWN = [
    ("münchen", "mnchen-3ya"),
    ("bücher", "bcher-kva"),
    ("пример", "e1afmkfd"),
    ("例え", "r8jz45g"),
    ("☃", "n3h"),
    ("mañana", "maana-pta"),
]


@pytest.mark.parametrize("uni,puny", KNOWN, ids=[p for _, p in KNOWN])
def test_known_labels_both_directions(uni, puny):
    # cross-check the fixture against the stdlib first
    assert uni.encode("punycode").decode() == puny
    assert punycode_encode(uni) == puny
    assert punycode_decode(puny) == uni


def test_fuzz_matches_stdlib_both_directions():
    rng = random.Random(5)
    planes = [(97, 123), (0xA0, 0x800), (0x3040, 0x30FF), (0x400, 0x500),
              (0x4E00, 0x9FFF), (0x10000, 0x10400)]
    for _ in range(5000):
        s = "".join(
            chr(rng.randrange(*rng.choice(planes)))
            for _ in range(rng.randrange(0, 12))
        )
        enc = punycode_encode(s)
        assert enc == s.encode("punycode").decode(), s
        assert punycode_decode(enc) == s


def test_pure_ascii_label_has_trailing_delimiter_form():
    # RFC 3492: basic-only input is basic string + '-'
    assert punycode_encode("abc") == "abc-"
    assert punycode_decode("abc-") == "abc"


def test_host_level_ace_and_case_insensitive_decode():
    assert host_to_ascii("W7.MÜNCHEN.Example") == "w7.xn--mnchen-3ya.example"
    assert host_to_unicode("w7.XN--MNCHEN-3YA.example") == "w7.münchen.example"
    # ascii hosts untouched (beyond lowercasing)
    assert host_to_ascii("Plain.Example") == "plain.example"


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="digit"):
        punycode_decode("abc-!!")
    with pytest.raises(ValueError, match="mid-integer"):
        punycode_decode("abc-zzzz" + "z" * 20)
    with pytest.raises(ValueError, match="non-basic"):
        punycode_decode("ü-3ya")
