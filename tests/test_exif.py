"""EXIF / TIFF-IFD codec (multimodal/exif.py): both byte orders,
inline vs offset-stored values, the chained Exif sub-IFD, pixel
decode surviving the splice, and the guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from neuroimaging_data_pipeline_spark.multimodal.exif import (
    TAG_DATETIME,
    TAG_EXIF_IFD,
    TAG_EXPOSURE,
    TAG_ISO,
    TAG_MAKE,
    TAG_MODEL,
    TAG_ORIENTATION,
    TAG_PIXEL_X,
    TAG_PIXEL_Y,
    build_exif_app1,
    insert_exif,
    parse_exif,
)
from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _jpeg_with_exif(little_endian: bool) -> bytes:
    app1 = build_exif_app1(
        make="CamCo",
        model="M3",
        orientation=6,
        datetime="2026:01:01 00:00:07",
        iso=400,
        exposure=(1, 125),
        pixel_x=16,
        pixel_y=16,
        little_endian=little_endian,
    )
    return insert_exif(
        encode_jpeg_gray(np.full((16, 16), 77, np.uint8)), app1
    )


@pytest.mark.parametrize("le", [True, False])
def test_roundtrip_both_byte_orders(le):
    f = parse_exif(_jpeg_with_exif(le))
    assert f["_byte_order"] == ("II" if le else "MM")
    assert f[TAG_MAKE] == "CamCo" and f[TAG_MODEL] == "M3"
    assert f[TAG_ORIENTATION] == 6  # inline SHORT
    assert f[TAG_DATETIME] == "2026:01:01 00:00:07"  # offset ASCII
    assert f[TAG_ISO] == 400
    assert f[TAG_EXPOSURE] == (1, 125)  # offset RATIONAL
    assert f[TAG_PIXEL_X] == 16 and f[TAG_PIXEL_Y] == 16
    assert isinstance(f[TAG_EXIF_IFD], int)  # the sub-IFD pointer


def test_pixels_still_decode_after_splice():
    jpg = _jpeg_with_exif(True)
    assert (decode_jpeg_gray(jpg) == 77).all()


def test_short_ascii_is_stored_inline():
    # a <=3 char string (+NUL) fits the 4-byte inline slot
    app1 = build_exif_app1(
        "abc", "M", 1, "2026:01:01 00:00:00", 100, (1, 2), 16, 16
    )
    jpg = insert_exif(
        encode_jpeg_gray(np.zeros((16, 16), np.uint8)), app1
    )
    f = parse_exif(jpg)
    assert f[TAG_MAKE] == "abc" and f[TAG_MODEL] == "M"


def test_guards():
    with pytest.raises(ValueError, match="SOI"):
        parse_exif(b"not a jpeg")
    jpg = encode_jpeg_gray(np.zeros((16, 16), np.uint8))
    with pytest.raises(ValueError, match="no APP1 Exif"):
        parse_exif(jpg)
    bad = bytearray(_jpeg_with_exif(True))
    at = bad.find(b"II")
    bad[at : at + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(bytes(bad))
