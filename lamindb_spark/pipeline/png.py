"""Pure-python PNG codec (stdlib ``zlib`` + ``struct``; no PIL).

Makes the multimodal pipeline honest end-to-end for one real format
(VERDICT r02 #7): PNG payloads decode to actual pixels inside the
``mapInPandas`` stages instead of the deterministic fake. Scope: the
baseline-PNG subset — 8-bit depth, color types 0/2/3/4/6 (gray, RGB,
palette, gray+alpha, RGBA), all five scanline filters, no interlace —
which covers what ``PIL.Image.save`` and friends emit by default.

The encoder is the exact filter inverse (any filter type 0–4), used by
tests to round-trip every unfilter path and by ``resize_images`` to
re-encode.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + payload + crc


def decode_png(data: bytes):
    """PNG bytes → (numpy uint8 array of shape (H, W, C), width,
    height, channels). Palette images are expanded to RGB."""
    import numpy as np

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); baseline 8-bit non-interlaced only"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    prev = bytearray(stride)
    lines = []
    pos = 0
    for _y in range(height):
        ft = raw[pos]
        cur = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        lines.append(bytes(cur))
        prev = cur
    arr = np.frombuffer(b"".join(lines), dtype=np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        arr = palette[arr[:, :, 0]]
        ch = 3
    return arr, width, height, ch


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(arr, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 array → PNG bytes. ``filter_type`` applies one
    filter to every scanline (0–4) — the exact inverse of the decoder's
    unfilter, so round-trips exercise each reconstruction path."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = width * ch
    flat = arr.reshape(height, stride)
    prev = bytearray(stride)
    out = bytearray()
    for y in range(height):
        cur = bytearray(flat[y].tobytes())
        filt = bytearray(stride)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            upleft = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = left
            elif filter_type == 2:
                pred = up
            elif filter_type == 3:
                pred = (left + up) >> 1
            elif filter_type == 4:
                pred = _paeth(left, up, upleft)
            else:
                raise ValueError(f"bad filter type {filter_type}")
            filt[i] = (cur[i] - pred) & 0xFF
        out.append(filter_type)
        out += filt
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize of an (H, W, C) array — numpy index
    gather, the standard decimation kernel."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]
