"""Charset detection / mojibake repair (text/encoding.py): the
from-scratch UTF-8 validator fuzz-pinned against the stdlib decoder,
structural edge cases from the Unicode well-formedness table, and the
four detection paths."""

from __future__ import annotations

import random

from neuroimaging_data_pipeline_spark.text.encoding import (
    SUFFIXES,
    detect_and_repair,
    encode_case,
    utf8_valid,
)


def _std_valid(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def test_utf8_validator_fuzz_matches_stdlib():
    rng = random.Random(9)
    for _ in range(20000):
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 12)))
        assert utf8_valid(b) == _std_valid(b), b.hex()


def test_utf8_validator_accepts_all_encodable_strings():
    rng = random.Random(10)
    planes = [(32, 127), (0xA0, 0x2000), (0xE000, 0xFFFF), (0x10000, 0x10FFFF)]
    for _ in range(3000):
        s = "".join(
            chr(rng.randrange(*rng.choice(planes)))
            for _ in range(rng.randrange(0, 8))
        )
        assert utf8_valid(s.encode("utf-8"))


def test_utf8_structural_rejections():
    # overlong forms, surrogates, > U+10FFFF, stray/truncated sequences
    bad = [
        b"\xc0\xaf",           # overlong '/'
        b"\xc1\xbf",           # overlong
        b"\xe0\x80\xaf",       # overlong 3-byte
        b"\xed\xa0\x80",       # UTF-16 surrogate D800
        b"\xf0\x80\x80\x80",   # overlong 4-byte
        b"\xf4\x90\x80\x80",   # U+110000
        b"\xf5\x80\x80\x80",   # lead byte past the table
        b"\x80",               # stray continuation
        b"\xe2\x82",           # truncated
    ]
    for b in bad:
        assert not utf8_valid(b), b.hex()
    good = [b"", b"abc", "€".encode(), "𝄞".encode(), b"\xed\x9f\xbf",
            b"\xee\x80\x80", b"\xf4\x8f\xbf\xbf"]
    for b in good:
        assert utf8_valid(b), b.hex()


def test_four_detection_paths_repair_exactly():
    text = "Plain ASCII body 123."
    expect = [("utf-8", False), ("latin-1", False), ("utf-8", True),
              ("cp1252", False)]
    for case in range(4):
        charset, moji, rep = detect_and_repair(encode_case(case, text))
        assert (charset, moji) == expect[case], case
        assert rep == text + SUFFIXES[case], case


def test_genuine_utf8_accents_are_not_flagged_mojibake():
    # 'café ' then a word: é encodes to 0xC3 0xA9; the Latin-1
    # round-trip probe yields 0xE9 + ASCII which is NOT valid UTF-8,
    # so single-encoded text survives untouched
    raw = "café au lait".encode()
    charset, moji, rep = detect_and_repair(raw)
    assert (charset, moji, rep) == ("utf-8", False, "café au lait")


def test_double_encoded_mojibake_round_trip_is_the_repair():
    original = "smörgåsbord — déjà vu"
    raw = original.encode().decode("latin-1").encode()
    assert "Ã" in raw.decode("utf-8")  # the visible disease
    charset, moji, rep = detect_and_repair(raw)
    assert (charset, moji, rep) == ("utf-8", True, original)


def test_cp1252_block_splits_from_latin1():
    # 0x93/0x94 are curly quotes in CP1252, control chars in Latin-1
    raw = b"say \x93hi\x94"
    assert detect_and_repair(raw) == ("cp1252", False, "say “hi”")
    raw2 = b"caf\xe9"  # Latin-1 e-acute, no 0x80-0x9F bytes
    assert detect_and_repair(raw2) == ("latin-1", False, "café")
