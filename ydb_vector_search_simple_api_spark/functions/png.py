"""Minimal dependency-free PNG codec + bilinear resize.

Vendored fallback so the real-format image path (`operators/
multimodal.py::decode_image` / ``resize_image``) runs in environments
without Pillow (this container's baseline). Public-knowledge basis:
the PNG specification (RFC 2083 / W3C PNG): zlib-compressed
scanlines, one filter byte per row, filters 0-4 (None/Sub/Up/
Average/Paeth). stdlib ``zlib`` does the compression; NumPy holds the
pixels.

Scope (honestly bounded): 8-bit samples, non-interlaced, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); palette and 16-bit
images raise. Output is always (h, w, 3) uint8 RGB (alpha dropped,
gray replicated) — the contract ``decode_image`` documents. The
encoder writes filter-0 RGB, which every PNG reader (including
Pillow) accepts; round-trip is bit-exact.

Baseline JPEG has its own vendored codec (``functions/jpeg.py``);
the ``decode_image`` gate dispatches on the payload signature.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB array."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    pos = len(PNG_SIGNATURE)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ct not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ct}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[ct]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong size")

    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = ch  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + int(prev[i])) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)

    px = out.reshape(h, w, ch)
    if ct == 0:
        return np.repeat(px, 3, axis=2)
    if ct == 2:
        return px.copy()
    if ct == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA -> RGB


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> PNG bytes (filter 0, zlib level 6).
    Round-trips bit-exactly through :func:`decode_png` and any
    spec-conforming reader."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 1:] = a.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Pixel-center-aligned bilinear resize, (h, w, c) uint8 ->
    (height, width, c) uint8 — the standard half-pixel-offset sampling
    grid; edges clamp."""
    if width < 1 or height < 1:
        raise ValueError("target size must be positive")
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape[:2]
    ys = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    xs = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
