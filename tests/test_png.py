"""Pure-stdlib PNG codec (``functions.png``) — decode correctness
across every color type and filter path, strict rejects, the registry
feature contract, and end-to-end Arrow extraction."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_opensky_spark.functions import png as P
from etl_opensky_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_features,
    with_available_codecs,
)


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize(
    "ftype", [P.NONE, P.SUB, P.UP, P.AVERAGE, P.PAETH]
)
def test_roundtrip_every_colortype_and_filter(ch, ftype):
    img = _img(13, 17, ch, seed=ch * 10 + ftype)
    got = P.decode_png(P.encode_png(img, filter_type=ftype))
    want = img if img.ndim == 3 else img[:, :, None]
    assert got.shape == want.shape
    assert np.array_equal(got, want)  # byte-exact through zlib + filters


def test_palette_decode():
    """Hand-build a color-type-3 PNG: indices resolve through PLTE."""
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    h, w = idx.shape
    lines = bytearray()
    for y in range(h):
        lines.append(0)
        lines.extend(idx[y].tobytes())

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    got = P.decode_png(payload)
    assert got.shape == (2, 2, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[1, 0].tolist() == [0, 0, 255]


def test_strict_rejects():
    img = _img(4, 4, 1)
    good = P.encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JFIF" + good)
    with pytest.raises(ValueError, match="truncated|IEND"):
        P.decode_png(good[:-8])
    # 16-bit depth refused, not mis-decoded
    bad_ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", bad_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 36))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        P.decode_png(bad)


def test_feature_histogram_exact():
    """Features are the exact normalized luma histogram — computed
    independently here from the pixel array."""
    img = _img(9, 11, 3, seed=7)
    feats = P.png_image_decode(P.encode_png(img))
    luma = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    ) // 1000
    want = np.bincount(
        luma.reshape(-1) * FEATURE_DIM // 256, minlength=FEATURE_DIM
    ) / luma.size
    assert feats == pytest.approx(want.tolist(), abs=0)
    assert abs(sum(feats) - 1.0) < 1e-12
    assert P.png_image_decode(None) == [0.0] * FEATURE_DIM


def test_registry_upgrade_uses_real_decoder(spark):
    """with_available_codecs registers the stdlib PNG decoder for
    'image' in this codec-less container, and the Arrow extraction path
    produces the real histogram end-to-end."""
    reg = with_available_codecs()
    img = _img(6, 6, 1, seed=3)
    payload = P.encode_png(img)
    assert reg.decode("image", payload) == P.png_image_decode(payload)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, media_type string, payload binary",
    )
    row = extract_features(media, registry=reg).collect()[0]
    assert row["feature"] == pytest.approx(P.png_image_decode(payload))
    assert row["byte_size"] == len(payload)
