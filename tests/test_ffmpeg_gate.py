"""decoder='ffmpeg' capability gate (multimodal/binaryops.py): when
the binary is on PATH the SAME decode_features plan decodes real
codec payloads; when it is absent the gate raises a clear
NotImplementedError (and this test skips, mirroring the
scipy/protobuf gate pattern)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
    decode_features,
    ffmpeg_available,
)


def test_gate_raises_cleanly_when_absent(spark):
    if ffmpeg_available():
        pytest.skip("ffmpeg present; the absence branch is not reachable")
    media = spark.createDataFrame(
        [(1, "video", b"x")], "media_id long, modality string, content binary"
    )
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_features(media, decoder="ffmpeg")


@pytest.mark.skipif(not ffmpeg_available(), reason="ffmpeg not on PATH")
def test_ffmpeg_decodes_repo_mjpeg_clips(spark):
    """Real end-to-end: the repo's own MJPEG-in-MP4 clips (constant
    8x8 DC-only JPEG frames) decode through ffmpeg to the exact
    frame values the fixture formula predicts — every chunk mean of
    a constant-frame clip must equal one of the clip's frame values
    scaled to [0,1]."""
    from neuroimaging_data_pipeline_spark.multimodal.mp4 import (
        encode_mjpeg,
        mjpeg_frame_value,
    )

    rows = [(d, "video", encode_mjpeg(d)) for d in range(4)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, content binary"
    )
    got = {
        r.media_id: r.features
        for r in decode_features(media, decoder="ffmpeg", feature_dim=4)
        .collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for d, feats in got.items():
        n = 4 + d % 5
        allowed = {mjpeg_frame_value(d, i) / 255.0 for i in range(n)}
        for v in feats:
            # chunk boundaries fall inside frames except possibly at
            # frame joins; a chunk mean is then a convex combination
            # of two adjacent allowed values
            lo, hi = min(allowed), max(allowed)
            assert lo - 1e-9 <= v <= hi + 1e-9
        # first chunk starts inside frame 0 exactly
        assert any(
            np.isclose(feats[0], a, atol=1.5 / 255) for a in allowed
        )


def test_unknown_decoder_still_raises(spark):
    media = spark.createDataFrame(
        [(1, "image", b"x")], "media_id long, modality string, content binary"
    )
    with pytest.raises(NotImplementedError, match="pil"):
        decode_features(media, decoder="pil")
