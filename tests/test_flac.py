"""FLAC codec (multimodal/flac.py): CRC check values, container
round-trip, the STREAMINFO PCM-MD5 integrity hash, and loud failure
on corruption / unimplemented subframe types."""

from __future__ import annotations

import hashlib
import struct

import pytest

from neuroimaging_data_pipeline_spark.multimodal.flac import (
    _BLOCK,
    _doc_samples,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_check_values():
    # published check values for CRC-8/0x07 (SMBUS) and CRC-16/0x8005
    # init-0 no-reflect (BUYPASS) over '123456789'
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 7, 100, 12345])
def test_roundtrip_and_pcm_md5(i):
    s = _doc_samples(i)
    blob = encode_flac(s, {"TITLE": f"doc {i}"})
    d = decode_flac(blob)
    assert d["samples"] == s
    assert d["md5_ok"]
    assert d["n_frames"] == 4 + i % 5
    assert d["streaminfo"]["total_samples"] == len(s)
    assert d["comments"]["TITLE"] == f"doc {i}"
    # both subframe types present: even frames flat, odd frames ramps
    assert d["n_frames"] >= 4


def test_streaminfo_packed_field_layout():
    d = decode_flac(encode_flac([5] * _BLOCK, {}))
    si = d["streaminfo"]
    assert (si["sample_rate"], si["channels"], si["bits"]) == (44100, 1, 16)
    assert si["min_blocksize"] == si["max_blocksize"] == _BLOCK


def test_pcm_md5_is_the_format_hash():
    samples = list(range(-8, 8))
    blob = encode_flac(samples, {})
    pcm = b"".join(int(v).to_bytes(2, "little", signed=True) for v in samples)
    assert decode_flac(blob)["streaminfo"]["md5"] == hashlib.md5(pcm).digest()


def test_frame_crc16_corruption_fails_loudly():
    blob = bytearray(encode_flac(_doc_samples(5), {"TITLE": "x"}))
    # flip one bit inside the LAST frame's sample payload (3 bytes
    # before its CRC-16 tail)
    blob[-4] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(blob))


def test_header_crc8_corruption_fails_loudly():
    samples = [3] * _BLOCK
    blob = bytearray(encode_flac(samples, {}))
    # the frame starts right after the metadata blocks: find the sync
    at = blob.find(b"\xff\xf8", 4)
    assert at > 0
    blob[at + 5] ^= 0x01  # the 8-bit blocksize-1 field, CRC-8-covered
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(blob))


def test_reserved_subframe_type_raises():
    samples = [3] * _BLOCK
    blob = bytearray(encode_flac(samples, {}))
    at = blob.find(b"\xff\xf8", 4)
    # subframe header byte sits after: 4 fixed header bytes + 1-byte
    # UTF-8 frame number + 1-byte blocksize-1 + 1-byte CRC-8
    sub_at = at + 7
    blob[sub_at] = 0b000010 << 1  # reserved type (2-7, 16-31 unused)
    # re-seal both CRCs so the type gate (not the CRC) is what fires
    blob[at + 6] = crc8(bytes(blob[at : at + 6]))
    end = len(blob) - 2
    struct.pack_into(">H", blob, end, crc16(bytes(blob[at:end])))
    with pytest.raises(NotImplementedError, match="reserved subframe"):
        decode_flac(bytes(blob))


# --- FIXED subframes / rice residuals ---------------------------------------------


def _stype(frame: bytes) -> int:
    # 4 fixed header bytes + 1-byte UTF-8 frame number (index 0) +
    # 1-byte blocksize-1 + 1-byte CRC-8 -> subframe header at byte 7
    return (frame[7] >> 1) & 0x3F


def test_encoder_picks_subframe_type_by_texture():
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _SINE8,
        _frame,
    )

    flat = [5] * _BLOCK
    ramp = [(100 + k * 13) - 2048 for k in range(_BLOCK)]
    sine = [700 + _SINE8[k % 8] for k in range(_BLOCK)]
    noise = [(7 + 2 * 29 + k * 48271) % 65536 - 32768 for k in range(_BLOCK)]
    assert _stype(_frame(0, flat)) == 0                 # CONSTANT
    assert 0b001000 <= _stype(_frame(0, ramp)) <= 0b001100  # FIXED
    assert _stype(_frame(0, sine)) & 0b100000           # LPC
    assert _stype(_frame(0, noise)) == 1                # VERBATIM
    # a linear ramp is zeroed by the order-2 predictor: tiny frame
    assert len(_frame(0, ramp)) < len(_frame(0, noise)) / 2
    # sinusoid+offset: integer FIXED predictors cannot capture the
    # sqrt(2) recurrence, quantized LPC leaves only table rounding
    # (the 4+5+12*order header bits keep the win below the ramp's)
    assert len(_frame(0, sine)) < len(_frame(0, noise)) * 2 / 3


def _hand_frame(body_bits: list[tuple[int, int]]) -> bytes:
    """Assemble a frame around hand-written subframe bits."""
    hdr = bytearray(b"\xff\xf8\x69\x08\x00")  # frame number 0
    hdr.append(_BLOCK - 1)
    hdr.append(crc8(bytes(hdr)))
    acc, n = 0, 0
    out = bytearray()
    for v, w in body_bits:
        acc = (acc << w) | v
        n += w
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
            acc &= (1 << n) - 1
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    frame = bytes(hdr) + bytes(out)
    return frame + crc16(frame).to_bytes(2, "big")


def _wrap(frame: bytes, samples_expected: list[int]) -> bytes:
    """A minimal FLAC file holding one hand-built frame; STREAMINFO
    md5 computed from the expected samples so md5_ok pins decode."""
    import hashlib as _h

    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _pcm_bytes,
        _streaminfo,
    )

    si = _streaminfo(len(samples_expected),
                     _h.md5(_pcm_bytes(samples_expected)).digest())
    return (b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
            + frame)


def test_hand_built_fixed_order1_rice_stream_decodes():
    # order-1, warm-up 5, fifteen residuals of +2 at rice param 1:
    # zigzag(+2)=4, q=2 (two 0s then a 1), remainder bit 0
    bits = [(0b001001 << 1, 8), (5, 16), (0, 2), (0, 4), (1, 4)]
    bits += [(0b0010, 4)] * (_BLOCK - 1)
    samples = [5 + 2 * k for k in range(_BLOCK)]
    d = decode_flac(_wrap(_hand_frame(bits), samples))
    assert d["samples"] == samples
    assert d["md5_ok"]


def test_hand_built_partition_order_1_decodes():
    # order 0, partition order 1: two partitions of 8 residuals each,
    # first at rice 0 (value +1 -> zigzag 2 -> 001), second at rice 2
    # (value -3 -> zigzag 5 -> q=1,rem=01 -> 0 1 01)
    bits = [(0b001000 << 1, 8), (0, 2), (1, 4)]
    bits += [(0, 4)] + [(0b001, 3)] * 8
    bits += [(2, 4)] + [(0b0101, 4)] * 8
    samples = [1] * 8 + [-3] * 8
    d = decode_flac(_wrap(_hand_frame(bits), samples))
    assert d["samples"] == samples
    assert d["md5_ok"]


def test_hand_built_escape_partition_decodes():
    # order 0, one partition, rice param 15 = ESCAPE -> 5-bit width 6,
    # sixteen raw 6-bit two's-complement residuals
    vals = [(-32 + 3 * k) for k in range(_BLOCK)]
    bits = [(0b001000 << 1, 8), (0, 2), (0, 4), (15, 4), (6, 5)]
    bits += [(v & 0x3F, 6) for v in vals]
    d = decode_flac(_wrap(_hand_frame(bits), vals))
    assert d["samples"] == vals
    assert d["md5_ok"]


def test_fixed_roundtrip_stress_random_and_smooth():
    import math
    import random

    rng = random.Random(3)
    for _ in range(200):
        s = [rng.randrange(-32768, 32768) for _ in range(_BLOCK)]
        d = decode_flac(encode_flac(s, {}))
        assert d["samples"] == s and d["md5_ok"]
    for ph in range(50):  # smooth: exercises orders 2-4, small params
        s = [int(2000 * math.sin(0.2 * k + ph)) for k in range(_BLOCK)]
        d = decode_flac(encode_flac(s, {}))
        assert d["samples"] == s and d["md5_ok"]


def test_lost_sync_detected():
    blob = bytearray(encode_flac([3] * _BLOCK, {}))
    at = blob.find(b"\xff\xf8", 4)
    blob[at] = 0x00
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(blob))


def test_utf8_frame_number_covers_surrogates_and_high_planes():
    # FLAC's extended UTF-8 (RFC 9639 9.1.1) has no surrogate hole and
    # extends past U+10FFFF: chr().encode() would raise at 0xD800
    # (frame 55296 = ~20 s of audio at the 16-sample blocksize)
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _read_utf8_number,
        _utf8_frame_number,
    )

    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xD800, 0xDBFF, 0xDFFF,
              0xFFFF, 0x10000, 0x10FFFF, 0x110000, 2**21 - 1, 2**21,
              2**26 - 1, 2**26, 2**31 - 1, 55296]:
        coded = _utf8_frame_number(n)
        value, end = _read_utf8_number(coded, 0)
        assert (value, end) == (n, len(coded)), (n, coded)
        if n < 0xD800 or 0xE000 <= n <= 0x10FFFF:
            # where real UTF-8 is defined the codings must be identical
            assert coded == chr(n).encode("utf-8")


# --- LPC subframes (RFC 9639 9.2.3) ------------------------------------------------


def test_hand_built_lpc_order1_identity_coef_decodes():
    # order-1 LPC with qcoef [1], shift 0 -> predictor s[t-1], same
    # signal as the FIXED-1 pin but through the LPC path: warm-up 5,
    # precision 2 (field 1), fifteen +2 residuals at rice 1
    bits = [(0b100000 << 1, 8), (5, 16), (1, 4), (0, 5), (1, 2),
            (0, 2), (0, 4), (1, 4)]
    bits += [(0b0010, 4)] * (_BLOCK - 1)
    samples = [5 + 2 * k for k in range(_BLOCK)]
    d = decode_flac(_wrap(_hand_frame(bits), samples))
    assert d["samples"] == samples
    assert d["md5_ok"]


def test_hand_built_lpc_shift_and_arithmetic_right_shift():
    # order-1 LPC, coef 3 at shift 1 (a1 = 1.5), all residuals zero:
    # s[t] = (3*s[t-1]) >> 1. Positive start 4 walks the odd-product
    # floor (27>>1=13); negative start -5 pins the ARITHMETIC shift
    # ((-15)>>1 = -8, not the C-truncation -7).
    def stream(s0):
        bits = [(0b100000 << 1, 8), (s0 & 0xFFFF, 16), (2, 4), (1, 5),
                (3, 3), (0, 2), (0, 4), (0, 4)]
        bits += [(1, 1)] * (_BLOCK - 1)
        return bits

    def walk(s0):
        out = [s0]
        for _ in range(_BLOCK - 1):
            out.append((3 * out[-1]) >> 1)
        return out

    pos = walk(4)
    assert pos[:6] == [4, 6, 9, 13, 19, 28]
    d = decode_flac(_wrap(_hand_frame(stream(4)), pos))
    assert d["samples"] == pos and d["md5_ok"]

    neg = walk(-5)
    assert neg[:4] == [-5, -8, -12, -18]  # floor division, not trunc
    d = decode_flac(_wrap(_hand_frame(stream(-5)), neg))
    assert d["samples"] == neg and d["md5_ok"]


def test_lpc_invalid_precision_raises():
    # precision field 0b1111 (precision 16) is explicitly invalid
    bits = [(0b100000 << 1, 8), (5, 16), (15, 4), (0, 5), (1, 2),
            (0, 2), (0, 4), (0, 4)]
    bits += [(1, 1)] * (_BLOCK - 1)
    with pytest.raises(ValueError, match="precision"):
        decode_flac(_wrap(_hand_frame(bits), [5] * _BLOCK))


def test_lpc_roundtrip_stress_sinusoids_with_offsets():
    import math

    for ph in range(40):
        # offset sinusoids at varying frequency: covariance-method LPC
        # territory; every clip must round-trip bit-exact with the
        # format's own PCM MD5 verifying
        s = [
            (ph * 37 % 1500 - 750)
            + int(6000 * math.sin(2 * math.pi * k / (3 + ph % 6) + ph))
            for k in range(_BLOCK)
        ]
        d = decode_flac(encode_flac(s, {}))
        assert d["samples"] == s and d["md5_ok"]


def test_encoder_lpc_is_chosen_and_smaller_on_fixture_sine_frames():
    # the m28 fixture's f%4==2 frames must actually be LPC-coded (the
    # query path keeps all four subframe types hot) and pay for the
    # 4+5+12*order header bits they carry
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _doc_samples,
        _frame,
    )

    seen_lpc = 0
    for doc_id in range(12):
        s = _doc_samples(doc_id)
        for i in range(0, len(s), _BLOCK):
            block = s[i : i + _BLOCK]
            f = i // _BLOCK
            if f % 4 == 2:
                st = _stype(_frame(f, block))
                assert st & 0b100000, (doc_id, f, st)
                seen_lpc += 1
    assert seen_lpc >= 12


# --- stereo channel decorrelation (RFC 9639 9.1.3) ----------------------------------


def _hand_stereo_frame(nib: int, body_bits: list[tuple[int, int]]) -> bytes:
    hdr = bytearray(b"\xff\xf8\x69")
    hdr.append((nib << 4) | 0x08)
    hdr.append(0x00)  # frame number 0
    hdr.append(_BLOCK - 1)
    hdr.append(crc8(bytes(hdr)))
    acc, n = 0, 0
    out = bytearray()
    for v, w in body_bits:
        acc = (acc << w) | v
        n += w
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
            acc &= (1 << n) - 1
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    frame = bytes(hdr) + bytes(out)
    return frame + crc16(frame).to_bytes(2, "big")


def _wrap_stereo(frame: bytes, left, right) -> bytes:
    import hashlib as _h

    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _pcm_bytes,
        _streaminfo,
    )

    inter = [v for p in zip(left, right) for v in p]
    si = _streaminfo(len(left), _h.md5(_pcm_bytes(inter)).digest(),
                     channels=2)
    return (b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
            + frame)


def test_hand_built_stereo_decorrelation_pins():
    # CONSTANT subframes keep the arithmetic hand-checkable; the side
    # channel is 17 bits wide
    cases = [
        # left/side: L=10, side=4 -> R = 6
        (0b1000, [(0, 8), (10, 16), (0, 8), (4, 17)],
         [10] * _BLOCK, [6] * _BLOCK),
        # right/side: side=4, R=6 -> L = 10
        (0b1001, [(0, 8), (4, 17), (0, 8), (6, 16)],
         [10] * _BLOCK, [6] * _BLOCK),
        # mid/side with ODD side (parity trick): L=5,R=2 -> mid=3,
        # side=3; decode: m2=(3<<1)|1=7, L=(7+3)>>1=5, R=(7-3)>>1=2
        (0b1010, [(0, 8), (3, 16), (0, 8), (3, 17)],
         [5] * _BLOCK, [2] * _BLOCK),
        # independent stereo
        (0b0001, [(0, 8), (7, 16), (0, 8), ((-7) & 0xFFFF, 16)],
         [7] * _BLOCK, [-7] * _BLOCK),
    ]
    for nib, bits, left, right in cases:
        d = decode_flac(_wrap_stereo(_hand_stereo_frame(nib, bits),
                                     left, right))
        inter = [v for p in zip(left, right) for v in p]
        assert d["samples"] == inter, nib
        assert d["md5_ok"], nib


def test_stereo_negative_side_reconstruction():
    # side channels are SIGNED 17-bit: L=2, side=-5 -> R = 7
    bits = [(0, 8), (2, 16), (0, 8), ((-5) & 0x1FFFF, 17)]
    d = decode_flac(_wrap_stereo(_hand_stereo_frame(0b1000, bits),
                                 [2] * _BLOCK, [7] * _BLOCK))
    assert d["samples"] == [v for p in zip([2] * 16, [7] * 16) for v in p]
    assert d["md5_ok"]


def test_stereo_roundtrip_and_all_assignments_hot():
    import collections

    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _doc_stereo,
        encode_flac_stereo,
    )

    modes = collections.Counter()
    for i in range(20):
        left, right = _doc_stereo(i)
        blob = encode_flac_stereo(left, right, {"TITLE": f"doc {i}"})
        d = decode_flac(blob)
        inter = [v for p in zip(left, right) for v in p]
        assert d["samples"] == inter and d["md5_ok"], i
        assert d["streaminfo"]["channels"] == 2
        assert d["streaminfo"]["total_samples"] == len(left)
        pos = blob.find(b"\xff\xf8", 4)
        while pos != -1:
            modes[blob[pos + 3] >> 4] += 1
            pos = blob.find(b"\xff\xf8", pos + 2)
    # the fixture textures keep every stereo assignment hot
    assert set(modes) >= {0b0001, 0b1000, 0b1001, 0b1010}, dict(modes)


def test_stereo_extreme_sample_values_roundtrip():
    # side = L-R spans the full 17-bit range at int16 extremes
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        encode_flac_stereo,
    )

    left = [32767, -32768] * 8
    right = [-32768, 32767] * 8
    d = decode_flac(encode_flac_stereo(left, right, {}))
    assert d["samples"] == [v for p in zip(left, right) for v in p]
    assert d["md5_ok"]


def test_multichannel_round_trips_all_counts():
    # r8: 3-8 independently coded channels (RFC 9639 assignments
    # 0b0010-0b0111) decode for real, MD5 over interleaved PCM
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _doc_multichannel,
        encode_flac_multichannel,
    )

    seen = set()
    for i in range(12):
        chans = _doc_multichannel(i)
        seen.add(len(chans))
        d = decode_flac(encode_flac_multichannel(chans, {"TITLE": "t"}))
        assert d["streaminfo"]["channels"] == len(chans)
        assert d["samples"] == [v for tup in zip(*chans) for v in tup]
        assert d["md5_ok"]
    assert seen == {3, 4, 5, 6, 7, 8}  # every surround count exercised


def test_multichannel_frame_vs_streaminfo_mismatch_loud():
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _BLOCK,
        encode_flac_multichannel,
    )

    blob = bytearray(
        encode_flac_multichannel([[0] * _BLOCK] * 4, {})
    )
    # STREAMINFO channels live at bits 43-41 of the packed word
    # (byte 12 of the 34-byte body, at offset 8+4+10 into the file)
    idx = 4 + 4 + 10 + 2
    blob[idx] = (blob[idx] & ~0x0E) | ((5 - 1) << 1)  # claim 5 channels
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(bytes(blob))


def test_channel_count_beyond_8_or_non16bit_still_gated():
    from neuroimaging_data_pipeline_spark.multimodal.flac import (
        _streaminfo,
    )
    import hashlib as _h

    si = bytearray(_streaminfo(16, _h.md5(b"").digest(), channels=8))
    # force the 5-bit sample-size field to 24-bit
    packed = int.from_bytes(si[10:18], "big")
    packed = (packed & ~(0x1F << 36)) | ((24 - 1) << 36)
    si[10:18] = packed.to_bytes(8, "big")
    blob = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_flac(blob)
