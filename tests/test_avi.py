"""Pure-stdlib AVI (uncompressed DIB) codec (round 11 — completes the
real-decoder modality set: PNG image, WAV audio, AVI video)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_opensky_spark.functions.avi import (
    avi_video_decode,
    decode_avi,
    encode_avi,
)
from etl_opensky_spark.functions.multimodal import (
    FEATURE_DIM,
    with_available_codecs,
)


def _clip(n=10, h=6, w=9, color=False, seed=3):
    rng = np.random.default_rng(seed)
    shape = (n, h, w, 3) if color else (n, h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class TestRoundtrip:
    def test_grayscale_roundtrip(self):
        clip = _clip()
        frames, fps = decode_avi(encode_avi(clip, fps=12))
        assert fps == 12.0
        assert frames.shape == (10, 6, 9, 3)
        for c in range(3):  # gray stored as r=g=b
            np.testing.assert_array_equal(frames[..., c], clip)

    def test_color_roundtrip_unpadded_stride(self):
        clip = _clip(h=4, w=4, color=True)  # 4*3=12 bytes: no padding
        frames, _ = decode_avi(encode_avi(clip))
        np.testing.assert_array_equal(frames, clip)

    def test_color_roundtrip_padded_stride(self):
        clip = _clip(h=5, w=7, color=True)  # 7*3=21 -> stride 24
        frames, _ = decode_avi(encode_avi(clip))
        np.testing.assert_array_equal(frames, clip)

    def test_single_frame(self):
        clip = _clip(n=1)
        frames, _ = decode_avi(encode_avi(clip))
        assert frames.shape[0] == 1


class TestRefusals:
    def test_not_riff(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_avi(b"MKV?" + b"\x00" * 64)

    def test_compressed_fourcc_refused(self):
        payload = bytearray(encode_avi(_clip()))
        strf = payload.find(b"strf")
        # biCompression lives 16 bytes into BITMAPINFOHEADER
        payload[strf + 8 + 16 : strf + 8 + 20] = b"MJPG"
        with pytest.raises(ValueError, match="compressed"):
            decode_avi(bytes(payload))

    def test_non_24bit_refused(self):
        payload = bytearray(encode_avi(_clip()))
        strf = payload.find(b"strf")
        payload[strf + 8 + 14 : strf + 8 + 16] = struct.pack("<H", 8)
        with pytest.raises(ValueError, match="bit depth"):
            decode_avi(bytes(payload))

    def test_truncated_refused(self):
        payload = encode_avi(_clip())
        with pytest.raises(ValueError, match="avi"):
            decode_avi(payload[: len(payload) // 2])


class TestFeature:
    def test_mean_luma_per_sampled_frame(self):
        n = FEATURE_DIM * 2
        clip = np.stack(
            [np.full((4, 4), f * 8, dtype=np.uint8) for f in range(n)]
        )
        feats = avi_video_decode(encode_avi(clip))
        # bucket b samples frame floor(b * n / 8) = 2b
        expect = [2 * b * 8 / 255.0 for b in range(FEATURE_DIM)]
        np.testing.assert_allclose(feats, expect)

    def test_short_clip_repeats_frames(self):
        clip = np.stack(
            [
                np.full((3, 3), 60, dtype=np.uint8),
                np.full((3, 3), 180, dtype=np.uint8),
            ]
        )
        feats = avi_video_decode(encode_avi(clip))
        assert feats[: FEATURE_DIM // 2] == [60 / 255.0] * 4
        assert feats[FEATURE_DIM // 2 :] == [180 / 255.0] * 4

    def test_none_payload(self):
        assert avi_video_decode(None) == [0.0] * FEATURE_DIM


class TestRegistryIntegration:
    def test_video_decoder_is_real_in_this_container(self):
        reg = with_available_codecs()
        payload = encode_avi(_clip())
        feats = reg.decode("video", payload)
        np.testing.assert_allclose(feats, avi_video_decode(payload))

    def test_all_three_modalities_decode(self, spark):
        """One extract_features pass over image+audio+video rows — no
        modality raises in a codec-less container any more."""
        from etl_opensky_spark.functions.multimodal import (
            extract_features,
        )
        from etl_opensky_spark.functions.png import encode_png
        from etl_opensky_spark.functions.wav import encode_wav

        rows = [
            (0, "image", bytes(encode_png(
                (np.arange(64, dtype=np.uint8).reshape(8, 8))
            ))),
            (1, "audio", bytes(encode_wav(np.arange(64) * 100))),
            (2, "video", bytes(encode_avi(_clip(n=4, h=4, w=4)))),
        ]
        media = spark.createDataFrame(
            rows, "media_id long, media_type string, payload binary"
        )
        out = {
            r["media_id"]: r
            for r in extract_features(
                media, registry=with_available_codecs()
            ).collect()
        }
        assert len(out) == 3
        for r in out.values():
            assert len(r["feature"]) == FEATURE_DIM
            assert all(v is not None for v in r["feature"])
