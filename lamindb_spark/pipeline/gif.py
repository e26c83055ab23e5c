"""Pure-python GIF codec (stdlib ``struct`` only; no PIL).

Fourth real image path for the multimodal pipeline (after PNG, JPEG,
MJPEG-AVI): GIF87a/89a payloads decode to actual pixels inside the
``mapInPandas`` stages instead of the deterministic fake. Scope:
single-frame decode (the first image block) with global or local
color table, full variable-code-size LZW, and 4-pass interlacing;
transparency from the graphic-control extension is ignored (output is
always RGB). The encoder writes a non-interlaced GIF89a with a global
color table built from the image's palette (≤256 unique colors — the
format's own limit; quantization is out of scope and raises).
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")

_MAX_CODE_SIZE = 12


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and bytes(data[:6]) in GIF_SIGS


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-flavor LZW: little-endian bit packing, variable code width
    from ``min_code_size+1`` up to 12 bits, clear/end codes."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev = None
    bitpos, total_bits = 0, len(data) * 8
    while len(out) < n_pixels and bitpos + code_size <= total_bits:
        byte_idx = bitpos >> 3
        window = int.from_bytes(data[byte_idx : byte_idx + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            code_size = min_code_size + 1
            table = dict(base)
            next_code = end + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
                new = prev + entry[:1]
            elif code == next_code:
                entry = new = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            if next_code < (1 << _MAX_CODE_SIZE):
                table[next_code] = new
                next_code += 1
                if next_code == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                    code_size += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("truncated GIF image data")
    return bytes(out[:n_pixels])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Exact inverse of :func:`_lzw_decode` (same code-size schedule;
    emits CLEAR and resets when the table fills)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        if next_code < (1 << _MAX_CODE_SIZE):
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < _MAX_CODE_SIZE:
                code_size += 1
        else:
            emit(clear, code_size)
            code_size = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows, height: int):
    """Reorder 4-pass interlaced row indices back to top-to-bottom."""
    order = (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )
    out = [None] * height
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def decode_gif(data: bytes):
    """GIF bytes → (numpy uint8 array (H, W, 3), width, height, 3).

    Decodes the FIRST image block; palette indices expand through the
    active (local-over-global) color table.
    """
    import numpy as np

    data = bytes(data)
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    width, height, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        global_table = global_table.reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: skip label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _l, _t, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image block without a color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        idx = np.frombuffer(
            _lzw_decode(min_code_size, bytes(lzw), iw * ih), dtype=np.uint8
        ).reshape(ih, iw)
        if iflags & 0x40:  # interlaced
            idx = np.array(_deinterlace(list(idx), ih))
        return table[idx], iw, ih, 3
    raise ValueError("GIF with no image block")


def encode_gif(arr) -> bytes:
    """(H, W, 3) uint8 → single-frame non-interlaced GIF89a. The
    palette is the image's own distinct colors (≤256, else ValueError:
    quantization is out of codec scope)."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_gif expects (H, W, 3) RGB")
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors; GIF allows 256")
    depth = max(1, (len(palette) - 1).bit_length())
    table_size = 1 << depth
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (table_size - len(palette)))
    min_code_size = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += pal_bytes
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(min_code_size)
    lzw = _lzw_encode(min_code_size, idx.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
