"""Pure-python baseline TIFF codec (stdlib ``struct`` only).

TIFF is the format bio-imaging actually ships (microscopy exports,
OME-TIFF), so the multimodal image path should not stub it. Scope —
the baseline uncompressed subset: either byte order (II/MM), 8-bit
samples, 1 (gray) or 3 (RGB) samples per pixel, chunky planar config,
strip layout (any RowsPerStrip). Compressed variants (LZW/JPEG/
Deflate) and tiled layouts raise — they are codec-library territory
and stay on the declared stub. The encoder writes little-endian,
single-strip, matching decode exactly (lossless round-trip).
"""

from __future__ import annotations

import struct

_II, _MM = b"II", b"MM"

# tag ids (TIFF 6.0 baseline)
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_COUNTS, _PLANAR = 279, 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def is_tiff(data: bytes) -> bool:
    return len(data) >= 8 and bytes(data[:4]) in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, endian: str):
    """First IFD → {tag: [values]} (offsets followed for out-of-line
    value arrays)."""
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        ent = data[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        tag, typ, count = struct.unpack(endian + "HHI", ent[:8])
        size = _TYPE_SIZES.get(typ, 1) * count
        raw = ent[8:12]
        if size > 4:
            (off,) = struct.unpack(endian + "I", raw)
            raw = data[off : off + size]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rationals/ascii not needed for baseline decode
        tags[tag] = list(struct.unpack(endian + fmt * count, raw[:size]))
    return tags


def decode_tiff(data: bytes):
    """TIFF bytes → (numpy uint8 array (H, W, C), width, height, C)."""
    import numpy as np

    data = bytes(data)
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad signature)")
    endian = "<" if data[:2] == _II else ">"
    t = _read_ifd(data, endian)
    width, height = t[_WIDTH][0], t[_HEIGHT][0]
    comp = t.get(_COMPRESSION, [1])[0]
    if comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp}")
    spp = t.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = t.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if t.get(_PLANAR, [1])[0] != 1:
        raise ValueError("unsupported TIFF planar configuration")
    if _STRIP_OFFSETS not in t:
        raise ValueError("tiled TIFF not supported")
    offsets = t[_STRIP_OFFSETS]
    counts = t.get(_STRIP_COUNTS, [width * height * spp])
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw[: width * height * spp], dtype=np.uint8)
    return arr.reshape(height, width, spp).copy(), width, height, spp


def encode_tiff(arr) -> bytes:
    """(H, W, C) uint8 (C in {1, 3}) → uncompressed little-endian
    single-strip TIFF — the exact inverse of :func:`decode_tiff`."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_tiff expects 1 or 3 channels")
    body = arr.tobytes()
    photometric = 1 if c == 1 else 2  # BlackIsZero / RGB

    entries = []  # (tag, type, count, value-or-bytes)
    bits_off_placeholder = c == 3  # BitsPerSample needs 3 shorts out-of-line
    # layout: header(8) + ifd + out-of-line values + pixel data
    n_entries = 9
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = 8 + ifd_size
    extra = b""
    if bits_off_placeholder:
        bits_val = extra_off
        extra = struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"  # word-align
    else:
        bits_val = 8
    data_off = extra_off + len(extra)

    def entry(tag, typ, count, val):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", val)

    ifd = struct.pack("<H", n_entries)
    ifd += entry(_WIDTH, 4, 1, w)
    ifd += entry(_HEIGHT, 4, 1, h)
    ifd += entry(_BITS, 3, c, bits_val if c == 3 else (8 if c == 1 else bits_val))
    ifd += entry(_COMPRESSION, 3, 1, 1)
    ifd += entry(_PHOTOMETRIC, 3, 1, photometric)
    ifd += entry(_STRIP_OFFSETS, 4, 1, data_off)
    ifd += entry(_SAMPLES_PER_PIXEL, 3, 1, c)
    ifd += entry(_ROWS_PER_STRIP, 4, 1, h)
    ifd += entry(_STRIP_COUNTS, 4, 1, len(body))
    ifd += struct.pack("<I", 0)  # next-IFD pointer
    return b"II*\x00" + struct.pack("<I", 8) + ifd + extra + body
