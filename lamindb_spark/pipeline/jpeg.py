"""Baseline JPEG (ITU T.81) codec — pure python/numpy, no codec libs.

VERDICT r04 #6: JPEG was the one real-media format still hitting the
declared stub in the multimodal decode stage. This module provides

- :func:`decode_jpeg` — baseline sequential DCT JFIF decode: marker
  parse, canonical Huffman decode (DC diff + AC run-length), restart
  markers, dequantize, inverse zigzag, 8×8 IDCT (one numpy matmul per
  plane, not per block), chroma upsampling for any 4:4:4 / 4:2:2 /
  4:2:0 sampling, YCbCr→RGB.
- :func:`encode_jpeg` — the matching baseline encoder (4:4:4, Annex K
  tables scaled by libjpeg's quality formula) used as the export sink
  and round-trip oracle.
- Progressive (SOF2), arithmetic coding, and 12-bit precision raise
  ``NotImplementedError`` with guidance — declared limits, not
  silent wrong output.

The reference hands image payloads to PIL; here decode runs inside the
Arrow-batched ``mapInPandas`` stage (``multimodal.py``) so bytes cross
JVM→Python once per batch and the per-image work is numpy-vectorized.
Python-loop cost is confined to the entropy-coded scan (inherently
serial per image); everything per-pixel is numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)

_QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 typical Huffman tables: (bit-length counts[1..16], symbols)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

JPEG_SIG = b"\xff\xd8"


def is_jpeg(data: bytes) -> bool:
    return len(data) > 2 and data[:2] == JPEG_SIG


# orthonormal 8-point DCT-II matrix: forward X = C @ x @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, bit-length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(bit-length, code) → symbol, for the bit-serial decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(counts, symbols).items()}


# -------------------------------------------------------------- decoder


class _BitReader:
    """Bit-serial reader over an entropy-coded segment with 0xFF00
    unstuffing and RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # marker (EOI etc.) — pad with 1s per spec
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def skip_restart(self) -> None:
        # consume the RST marker bytes at the current byte position
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def decode_jpeg(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode baseline JFIF bytes → (HxWxC uint8 array, w, h, c).

    C is 1 (grayscale) or 3 (RGB, converted from YCbCr).
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qt[tq] = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                    np.float64
                )
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _decode_map(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported — re-encode baseline"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tds >> 4, tds & 0xF))
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                                restart_interval)
        pos += seglen


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for comp, _, _ in scan:
        pw, ph = mcus_x * comp["h"] * 8, mcus_y * comp["v"] * 8
        planes[comp["id"]] = np.zeros((ph // 8, pw // 8, 64), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                reader.skip_restart()
                pred = {k: 0 for k in pred}
            try:
                for comp, td, ta in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = _decode_block(
                                reader, huff_dc[td], huff_ac[ta], qt[comp["tq"]]
                            )
                            blk[0] += pred[comp["id"]] * qt[comp["tq"]][0]
                            pred[comp["id"]] = blk[0] / qt[comp["tq"]][0]
                            planes[comp["id"]][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ] = blk
            except _RestartMarker:
                raise ValueError("unexpected restart marker mid-MCU")
            mcu_count += 1

    # dezigzag + IDCT per component as ONE einsum over all blocks
    out_planes = []
    for comp, _, _ in scan:
        coeffs = planes[comp["id"]]
        ny, nx = coeffs.shape[:2]
        dez = np.zeros_like(coeffs)
        dez[:, :, ZIGZAG] = coeffs
        blocks = dez.reshape(ny, nx, 8, 8)
        pix = np.einsum("ij,mnjk,kl->mnil", _C.T, blocks, _C) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(ny * 8, nx * 8)
        # upsample to full-res grid by sampling-factor replication
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None], w, h, 1
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return rgb, w, h, 3


def _decode_block(reader, dc_tab, ac_tab, q) -> np.ndarray:
    """One 8×8 block → DEQUANTIZED coefficients in zigzag order (DC is
    the raw diff; the caller adds the predictor)."""
    blk = np.zeros(64, dtype=np.float64)
    size = _huff_decode(reader, dc_tab)
    blk[0] = _extend(reader.receive(size), size) * q[0]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.receive(s), s) * q[k]
        k += 1
    return blk


# -------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, SIZE-bit code) per T.81 F.1.2.1."""
    size = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << size) - 1
    return size, code


def _encode_plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a (padded) plane → quantized zigzag ints,
    vectorized: (ny, nx, 64)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ij,mnjk,kl->mnil", _C, blocks, _C.T)
    flat = coefs.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]
    return np.round(flat / q[None, None, :]).astype(np.int64)


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge")


def _write_block(writer, blk, dc_codes, ac_codes, pred, ci, tsel) -> None:
    diff = int(blk[0]) - pred[ci]
    pred[ci] = int(blk[0])
    size, code = _magnitude(diff)
    hcode, hlen = dc_codes[tsel][size]
    writer.write(hcode, hlen)
    if size:
        writer.write(code, size)
    nz = np.nonzero(blk[1:])[0]
    k = 0
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            zc, zl = ac_codes[tsel][0xF0]
            writer.write(zc, zl)
            run -= 16
        size, code = _magnitude(int(blk[1 + idx]))
        hcode, hlen = ac_codes[tsel][(run << 4) | size]
        writer.write(hcode, hlen)
        writer.write(code, size)
        k = int(idx) + 1
    if k < 63:
        ec, el = ac_codes[tsel][0x00]
        writer.write(ec, el)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx{1,3} uint8 → baseline JFIF bytes (Annex K Huffman
    tables, libjpeg quality scaling).

    ``subsampling``: ``"444"`` (default) or ``"420"`` (2×2-averaged
    chroma — exercises the decoder's interleaved-MCU upsampling path).
    ``restart_interval``: emit RSTn every N MCUs (0 = off).
    """
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("expected 1 (gray) or 3 (RGB) channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and nc == 3
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [a[:, :, 0]]
    if sub420:
        # luma padded to 16 so each MCU holds a full 2×2 Y block grid;
        # chroma box-averaged 2×2 then padded to 8
        ph, pw = -h % 16 + h, -w % 16 + w
        y = np.pad(planes[0], ((0, ph - h), (0, pw - w)), mode="edge")
        sub = []
        for p in planes[1:]:
            p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            p = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            sub.append(_pad_to8(np.pad(
                p, ((0, ph // 2 - p.shape[0]), (0, pw // 2 - p.shape[1])),
                mode="edge",
            )))
        planes = [y] + sub
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [_pad_to8(p) for p in planes]
        samp = [(1, 1)] * nc
    qlum = _quality_scale(_QT_LUM[ZIGZAG], quality)
    qchrom = _quality_scale(_QT_CHROM[ZIGZAG], quality)

    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHROM)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHROM)]

    out = bytearray(JPEG_SIG)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([qlum] + ([qchrom] if nc == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(q.astype(np.uint8).tolist())
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        hi, vi = samp[i]
        out += bytes([i + 1, (hi << 4) | vi, 0 if i == 0 else 1])
    # DHT ×(2 or 4)
    tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if nc == 3:
        tables += [(0x01, _DC_CHROM), (0x11, _AC_CHROM)]
    for tid, (counts, symbols) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(symbols)) + bytes([tid])
        out += bytes(counts) + bytes(symbols)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    qs = [qlum] + [qchrom] * (nc - 1)
    blocks = [_encode_plane_blocks(p, qs[i]) for i, p in enumerate(planes)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_y = blocks[0].shape[0] // vmax
    mcus_x = blocks[0].shape[1] // hmax
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    data_parts = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                data_parts.append(bytes(writer.out))
                data_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        blk = blocks[ci][my * vi + by, mx * hi + bx]
                        _write_block(
                            writer, blk, dc_codes, ac_codes, pred, ci,
                            0 if ci == 0 else 1,
                        )
            mcu_count += 1
    writer.flush()
    data_parts.append(bytes(writer.out))
    out += b"".join(data_parts)
    out += b"\xff\xd9"
    return bytes(out)
