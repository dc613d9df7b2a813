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


def test_fuzz_mixed_script_adversarial_planes():
    """VERDICT r6 #8: beyond the six smoke planes — RTL scripts,
    combining marks, emoji, plane-16 extremes, and the codepoints
    hugging the surrogate hole — mixed freely inside ONE label, in
    both directions against the stdlib codec, plus longer labels than
    the 12-char smoke fuzz."""
    rng = random.Random(77)
    planes = [
        (0x0590, 0x06FF),    # Hebrew + Arabic (RTL)
        (0x0300, 0x0370),    # combining diacritics
        (0x1F300, 0x1FAFF),  # emoji blocks
        (0x0E00, 0x0E80),    # Thai
        (0x1100, 0x1200),    # Hangul Jamo
        (0xFFF0, 0x10000),   # BMP tail incl. specials
        (0x10FF00, 0x110000),  # plane-16 extreme tail
    ]
    edge = [0xD7FF, 0xE000, 0xFFFD, 0x10FFFF, 0x61, 0x2D]  # '-' too
    for _ in range(4000):
        chars = [
            chr(rng.choice(edge)) if rng.random() < 0.15
            else chr(rng.randrange(*rng.choice(planes)))
            for _ in range(rng.randrange(0, 40))
        ]
        s = "".join(chars)
        enc = punycode_encode(s)
        assert enc == s.encode("punycode").decode(), repr(s)
        assert punycode_decode(enc) == s, repr(s)


def test_host_round_trip_on_mixed_script_labels():
    # host-level: every label independently ACE-coded and recovered;
    # case folding happens before coding (RFC 5890 lowercase contract)
    rng = random.Random(9)
    pool = "a-z9ü漢ж☃えאاก\U0001F600"
    for _ in range(300):
        labels = [
            "".join(rng.choice(pool) for _ in range(rng.randrange(1, 8)))
            .strip("-") or "x"
            for _ in range(rng.randrange(1, 4))
        ]
        host = ".".join(labels)
        ace = host_to_ascii(host)
        assert all(ord(c) < 128 for c in ace), ace
        assert host_to_unicode(ace) == host.lower()
