"""Pure-stdlib PNG codec — un-fakes the image decoder (VERDICT r5 #4).

The container has no Pillow/ffmpeg, but PNG needs neither: the format
is zlib (stdlib) + per-scanline byte filters (RFC 2083).  This module
implements a real decoder for 8-bit-depth, non-interlaced PNGs in all
five color types (gray, RGB, palette, gray+alpha, RGBA) plus a
matching encoder (used by tests and gates to synthesize deterministic
fixtures — no binary files checked in), and the FEATURE_DIM luminance
histogram that drops into :class:`multimodal.DecoderRegistry` as the
``image`` decoder.

Scale shape: decode runs inside the Arrow ``mapInPandas`` batch of
``multimodal.extract_features`` — per-row map, no shuffle; the
unfilter loop is numpy-vectorized across each scanline for the
column-independent filters (None/Up) and walks bytes only for the
left-dependent ones (Sub/Average/Paeth), which is the intrinsic data
dependency of the format.  16-bit depth and Adam7 interlace raise
with a clear message rather than decode wrong.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from etl_opensky_spark.functions.multimodal import FEATURE_DIM

_SIG = b"\x89PNG\r\n\x1a\n"
#: samples per pixel, by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: PNG filter-type codes
NONE, SUB, UP, AVERAGE, PAETH = 0, 1, 2, 3, 4


def _iter_chunks(data: bytes):
    pos = len(_SIG)
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("png: truncated chunk")
        yield typ, body
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the per-scanline filters; returns (h, stride) uint8."""
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"png: decompressed size {len(raw)} != expected "
            f"{h * (stride + 1)} (h={h}, stride={stride})"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == NONE:
            cur = line.copy()
        elif ftype == UP:
            cur = line + prev  # uint8 wraps mod 256 — the spec's arithmetic
        elif ftype == SUB:
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == AVERAGE:
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == PAETH:
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, channels) uint8 array (palette
    entries resolved to RGB).  Supports bit depth 8, color types
    0/2/3/4/6, non-interlaced — the overwhelmingly common web shape;
    anything else raises ``ValueError`` rather than decoding wrong."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("png: bad signature (not a PNG)")
    ihdr = None
    plte = None
    idat = bytearray()
    for typ, body in _iter_chunks(payload):
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: bit depth {depth} unsupported (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"png: color type {color} unknown")
    if comp != 0 or filt != 0:
        raise ValueError("png: nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace unsupported")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    recon = _unfilter(raw, h, stride, bpp=ch).reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        recon = pal[recon[:, :, 0]]
    return recon


def encode_png(
    arr: np.ndarray, filter_type: int = NONE
) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array as a PNG.
    ``filter_type`` applies one forward filter to every scanline —
    tests use it to exercise each decoder unfilter path; NONE is the
    deterministic default (bytes depend only on pixels + zlib level).
    Color type inferred from channels: 1→gray, 2→gray+alpha, 3→RGB,
    4→RGBA."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == NONE:
            filt = cur
        elif filter_type == UP:
            filt = cur - prev
        elif filter_type == SUB:
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            filt = cur - left
        elif filter_type == AVERAGE:
            left = np.zeros_like(cur, dtype=np.int32)
            left[bpp:] = cur[:-bpp]
            filt = (
                (
                    cur.astype(np.int32)
                    - ((left + prev.astype(np.int32)) >> 1)
                )
                & 0xFF
            ).astype(np.uint8)
        elif filter_type == PAETH:
            filt = np.empty_like(cur)
            for x in range(w * ch):
                aa = int(cur[x - bpp]) if x >= bpp else 0
                cc = int(prev[x - bpp]) if x >= bpp else 0
                filt[x] = (int(cur[x]) - _paeth(aa, int(prev[x]), cc)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(filt.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(bytes(lines), 9)

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(
        b"IEND", b""
    )


def luminance(img: np.ndarray) -> np.ndarray:
    """Integer luma per pixel: gray passes through; RGB(A) uses the
    exact-integer BT.601 weights ``(299 r + 587 g + 114 b) // 1000`` so
    every engine (and an oracle SQL replay) computes identical values;
    alpha is ignored."""
    ch = img.shape[2]
    if ch <= 2:
        return img[:, :, 0].astype(np.int64)
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def png_image_decode(payload: bytes | None) -> list[float]:
    """Real image decoder for :class:`multimodal.DecoderRegistry`:
    decode the PNG, fold integer luma into ``FEATURE_DIM`` equal-width
    histogram buckets (bucket = luma * FEATURE_DIM // 256), normalize
    by pixel count.  Exact rational arithmetic until the final divide,
    so features are engine-reproducible and oracle-checkable."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    img = decode_png(payload)
    luma = luminance(img).reshape(-1)
    buckets = np.bincount(
        luma * FEATURE_DIM // 256, minlength=FEATURE_DIM
    )
    return (buckets / max(luma.size, 1)).tolist()
