"""Minimal dependency-free baseline-JPEG codec.

Vendored fallback (the ``functions/png.py`` precedent) so the
real-format image path (``operators/multimodal.py::decode_image`` /
``resize_image``) handles JPEG payloads in environments without
Pillow (this container's baseline). Public-knowledge basis: ITU-T
T.81 / ISO 10918-1 (the JPEG specification) — baseline sequential
DCT, Huffman entropy coding, the Annex K example quantization and
Huffman tables — and the JFIF conventions (BT.601 full-range YCbCr).

Scope (honestly bounded, mirrored by the decode_image gate):

* decode: baseline sequential DCT (SOF0), 8-bit samples, grayscale
  or 3-component YCbCr with any standard sampling factors (4:4:4,
  4:2:2, 4:2:0 — chroma upsampled nearest-neighbor), restart
  markers, multiple DQT/DHT segments. Progressive (SOF2),
  arithmetic coding and 12-bit precision raise ``ValueError``.
* encode: baseline 4:4:4 (or 1-component grayscale) with the Annex K
  tables at a fixed quality scaling — enough to produce real JPEG
  bytes every decoder (including this one and Pillow) accepts;
  lossy round-trip accuracy is pinned by PSNR in tests.

NumPy does the DCT math (exact orthonormal 8x8 DCT-II matrix,
float64); the entropy coder is plain Python over small test images —
corpus-scale decode rides ``mapInPandas`` batches like every other
multimodal kernel, so per-image Python cost is the accepted price of
a dependency-free real-codec path (same trade as png.py's zlib).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIGNATURE = b"\xff\xd8"

# ---- 8x8 DCT basis (orthonormal): block = C @ spatial @ C.T (forward)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# ---- Annex K example tables (T.81 §K.1/K.3) — public spec constants
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

#: Annex K Huffman specs: (bits[1..16], huffval) per (class, id)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_decode_table(bits, vals):
    """(code_length, code) -> symbol, per T.81 C.2 canonical order."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at
    any non-RST marker (handing control back to the segment parser)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated entropy segment")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError("JPEG: marker inside entropy segment")
            else:
                self.pos += 1
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker."""
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xD0 + (n % 8)
        ):
            self.pos += 2
        else:
            raise ValueError("JPEG: expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (grayscale replicated)."""
    if data[:2] != JPEG_SIGNATURE:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    out = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(data):
            raise ValueError("JPEG: truncated stream")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if pos + seglen > len(data):
            raise ValueError("JPEG: truncated segment")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    q = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(body[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("JPEG: truncated DHT segment")
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec = body[0]
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG: only baseline sequential (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            out = _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables, restart_interval
            )
            break
        pos += seglen
    if out is None:
        raise ValueError("JPEG: no scan decoded")
    return out


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {}
    for cid, hs, vs, _ in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}

    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    rst_count = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.align_and_expect_rst(rst_count)
                rst_count += 1
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                td, ta = scan_by_cid[cid]
                dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.float64)
                        t = r.decode_symbol(dc_tab)
                        diff = _extend(r.read_bits(t), t)
                        pred[cid] += diff
                        coef[0] = pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = r.decode_symbol(ac_tab)
                            rrun, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if rrun == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrun
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(r.read_bits(size), size) * q[k]
                            k += 1
                        block = np.zeros((8, 8))
                        block.flat[_ZIGZAG] = coef
                        spatial = _C.T @ block @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1

    # upsample to full resolution, crop, color-convert
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).round().astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.dstack([r_, g_, b_])
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    coef = _C @ (block - 128.0) @ _C.T
    zz = coef.flat[_ZIGZAG]
    qz = np.round(zz / q).astype(np.int64)
    diff = int(qz[0]) - pred
    t = _category(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.nonzero(qz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(qz[0])


def _dht_segment(tc, th, bits, vals):
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline 4:4:4 JFIF bytes
    (Annex K tables, no subsampling — simplicity over ratio)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w) or (h, w, 3) uint8")
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r_, g_, b_ = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        planes = [y, cb, cr]

    qs = [_QUANT_LUMA] + ([] if gray else [_QUANT_CHROMA, _QUANT_CHROMA])
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (  # APP0 JFIF
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, q in enumerate([_QUANT_LUMA] + ([] if gray else [_QUANT_CHROMA])):
        body = bytes([tq]) + bytes(int(x) for x in q)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    bw = _BitWriter()
    preds = [0] * nc
    by_max = (h + 7) // 8
    bx_max = (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((by_max * 8, bx_max * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge-replicate pad
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    for by in range(by_max):
        for bx in range(bx_max):
            for ci in range(nc):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(bw, block, qs[ci], dct, act, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
