"""Pure-stdlib WAV codec (round 11 — un-fakes the audio decoder the
way ``functions.png`` un-faked image decode)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_opensky_spark.functions.multimodal import (
    FEATURE_DIM,
    with_available_codecs,
)
from etl_opensky_spark.functions.wav import (
    decode_wav,
    encode_wav,
    wav_audio_decode,
)


class TestRoundtrip:
    def test_int16_mono(self):
        s = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int64)
        samples, rate = decode_wav(encode_wav(s, rate=8000))
        assert rate == 8000
        assert samples.shape == (5, 1)
        np.testing.assert_allclose(samples[:, 0], s / 32768.0)

    def test_int8_unsigned_centering(self):
        s = np.array([128, 255, 0, 192], dtype=np.int64)  # unsigned
        samples, _ = decode_wav(encode_wav(s, sampwidth=1))
        np.testing.assert_allclose(
            samples[:, 0], (s - 128) / 128.0
        )

    def test_int32(self):
        s = np.array([0, 2**30, -(2**30)], dtype=np.int64)
        samples, _ = decode_wav(encode_wav(s, sampwidth=4))
        np.testing.assert_allclose(samples[:, 0], s / 2147483648.0)

    def test_int24(self):
        s = np.array([0, 1 << 22, -(1 << 22), 8388607, -8388608])
        samples, _ = decode_wav(encode_wav(s, sampwidth=3))
        np.testing.assert_allclose(samples[:, 0], s / 8388608.0)

    def test_stereo_channel_zero_analyzed(self):
        left = np.arange(FEATURE_DIM * 4) * 100
        right = np.zeros_like(left)
        payload = encode_wav(np.stack([left, right], axis=1))
        samples, _ = decode_wav(payload)
        assert samples.shape == (FEATURE_DIM * 4, 2)
        feats = wav_audio_decode(payload)
        mono = np.abs(left / 32768.0)
        expect = [
            float(mono[i * 4 : (i + 1) * 4].mean())
            for i in range(FEATURE_DIM)
        ]
        np.testing.assert_allclose(feats, expect)


class TestFeature:
    def test_bucket_math_matches_soundfile_shape(self):
        """Tail beyond the last full chunk is ignored — the exact
        convention of multimodal._soundfile_audio_decode."""
        s = np.arange(FEATURE_DIM * 10 + 3) * 7  # remainder of 3
        feats = wav_audio_decode(encode_wav(s))
        mono = np.abs(s / 32768.0)
        n = len(mono) // FEATURE_DIM
        expect = [
            float(mono[i * n : (i + 1) * n].mean())
            for i in range(FEATURE_DIM)
        ]
        np.testing.assert_allclose(feats, expect)
        assert len(feats) == FEATURE_DIM

    def test_none_payload(self):
        assert wav_audio_decode(None) == [0.0] * FEATURE_DIM

    def test_short_clip_pads_buckets(self):
        s = np.array([16384, -16384])  # fewer samples than buckets
        feats = wav_audio_decode(encode_wav(s))
        assert feats[:2] == [0.5, 0.5]
        assert feats[2:] == [0.0] * (FEATURE_DIM - 2)


class TestRefusals:
    def test_garbage_raises_valueerror(self):
        with pytest.raises(ValueError, match="wav"):
            decode_wav(b"not a riff file at all")

    def test_truncated_header_raises(self):
        good = encode_wav(np.arange(100))
        with pytest.raises(ValueError, match="wav"):
            decode_wav(good[:10])

    def test_non_pcm_refused(self):
        """A WAVE_FORMAT_ALAW (0x0006) header must refuse, not decode
        wrong — wave.open only accepts PCM."""
        good = bytearray(encode_wav(np.arange(16)))
        fmt = good.find(b"fmt ")
        good[fmt + 8 : fmt + 10] = (6).to_bytes(2, "little")
        with pytest.raises(ValueError, match="wav"):
            decode_wav(bytes(good))


class TestRegistryIntegration:
    def test_audio_decoder_is_real_in_this_container(self):
        """with_available_codecs registers the stdlib WAV decoder for
        audio (soundfile overrides it only where importable), so audio
        decode no longer raises NotImplementedError here."""
        reg = with_available_codecs()
        payload = encode_wav(np.arange(FEATURE_DIM * 8) * 50)
        feats = reg.decode("audio", payload)
        np.testing.assert_allclose(feats, wav_audio_decode(payload))

    def test_extract_features_end_to_end(self, spark):
        from etl_opensky_spark.functions.multimodal import (
            extract_features,
        )

        n = FEATURE_DIM * 16
        rows = [
            (m, "audio", bytes(encode_wav((np.arange(n) * (m + 1)) % 4096)))
            for m in range(4)
        ]
        media = spark.createDataFrame(
            rows, "media_id long, media_type string, payload binary"
        )
        out = extract_features(
            media, registry=with_available_codecs()
        ).collect()
        assert len(out) == 4
        for r in out:
            ref = wav_audio_decode(
                bytes(encode_wav((np.arange(n) * (r["media_id"] + 1)) % 4096))
            )
            np.testing.assert_allclose(r["feature"], ref, rtol=1e-6)
            assert r["byte_size"] == len(rows[r["media_id"]][2])
