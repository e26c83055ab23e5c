"""Pure-python BMP codec (stdlib ``struct`` only).

Uncompressed Windows bitmaps (BITMAPINFOHEADER, BI_RGB) at 24-bit BGR
and 32-bit BGRA, top-down or bottom-up row order — the payloads
screenshots and exporters actually emit. Palette/RLE variants raise
(declared out of codec scope). Decode returns RGB; 32-bit alpha is
dropped for a uniform (H, W, 3) contract with the other image codecs.
"""

from __future__ import annotations

import struct

BMP_SIG = b"BM"


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and bytes(data[:2]) == BMP_SIG


def decode_bmp(data: bytes):
    """BMP bytes → (numpy uint8 array (H, W, 3), width, height, 3)."""
    import numpy as np

    data = bytes(data)
    if not is_bmp(data):
        raise ValueError("not a BMP (bad signature)")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    rows = np.frombuffer(
        data[pixel_off : pixel_off + stride * height], dtype=np.uint8
    ).reshape(height, stride)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy(), width, height, 3  # BGR(A) → RGB


def encode_bmp(arr) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes — the
    exact inverse of :func:`decode_bmp` for 24-bit payloads."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    stride = (w * 3 + 3) & ~3
    bgr = arr[::-1, :, ::-1]
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for row in bgr:
        body += row.tobytes() + pad
    header = struct.pack(
        "<2sIHHI", BMP_SIG, 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + body)
