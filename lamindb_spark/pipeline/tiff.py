"""Pure-python baseline TIFF codec (stdlib ``struct`` only).

TIFF is the format bio-imaging actually ships (microscopy exports,
OME-TIFF), so the multimodal image path should not stub it. Scope —
either byte order (II/MM), 8-bit samples, 1 (gray) or 3 (RGB) samples
per pixel, chunky planar config, strip layout (any RowsPerStrip), and
the TIFF compressions: none (1), Deflate (8/32946, stdlib zlib), LZW (5, MSB-first
with the spec's EarlyChange code-width bump, plus the horizontal
differencing predictor tag 317) and PackBits (32773). JPEG
compression and tiled layouts raise — codec-library territory, the
declared stub. The encoder writes little-endian single-strip in any of
the four compressions, matching decode exactly (lossless
round-trip)."""

from __future__ import annotations

import struct
import zlib

_II, _MM = b"II", b"MM"

# tag ids (TIFF 6.0 baseline)
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_COUNTS, _PLANAR = 279, 284
_PREDICTOR = 317

_CLEAR, _EOI = 256, 257


def packbits_decode(data: bytes) -> bytes:
    """TIFF/Apple PackBits RLE: n in [0,127] copies n+1 literals,
    n in [-127,-1] repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += bytes([data[i]]) * (1 - n)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of ≥3 become repeats; literals batch up
    to 128. Always decodable by :func:`packbits_decode` (and any
    conforming reader)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
            if i - lit_start >= 128:
                i = lit_start + 128
                break
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """TIFF-LZW (spec §13): MSB-first bit stream, 9-bit initial codes,
    ClearCode 256 / EOI 257, and the EarlyChange width bump — the
    writer widens one code EARLIER than generic LZW (at table sizes
    511/1023/2047), so the reader must too."""
    out = bytearray()
    table: list[bytes] = []
    width = 9

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _CLEAR:
                reset()
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # EarlyChange, reader side: the decoder's table lags the
            # writer's by ONE entry, so it must widen at table size
            # 2^w - 2 (510/1022/2046) to read the writer's first
            # widened code at the right width
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW encoder (EarlyChange, MSB-first), exact inverse of
    :func:`lzw_decode`."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    omega = b""
    for byte in data:
        k = bytes([byte])
        if omega + k in table:
            omega += k
            continue
        emit(table[omega], width)
        table[omega + k] = next_code
        next_code += 1
        # EarlyChange (spec §13 writer pseudocode): widen when NextCode
        # reaches 511/1023/2047 — one code earlier than generic LZW;
        # the decoder mirrors this exactly
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: clear (spec practice)
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        omega = k
    if omega:
        emit(table[omega], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)

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
    if comp not in (1, 5, 8, 32773, 32946):
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
    strips = [bytes(data[o : o + c]) for o, c in zip(offsets, counts)]
    if comp == 5:
        strips = [lzw_decode(s) for s in strips]
    elif comp in (8, 32946):  # Adobe deflate / legacy deflate
        strips = [zlib.decompress(s) for s in strips]
    elif comp == 32773:
        strips = [packbits_decode(s) for s in strips]
    raw = b"".join(strips)
    arr = np.frombuffer(raw[: width * height * spp], dtype=np.uint8)
    arr = arr.reshape(height, width, spp).copy()
    if t.get(_PREDICTOR, [1])[0] == 2:
        # horizontal differencing: stored values are per-channel deltas
        # along the row; undo with a modular cumulative sum
        arr = np.cumsum(arr.astype(np.uint16), axis=1).astype(np.uint8)
    return arr, width, height, spp


def encode_tiff(arr, compression: int = 1, predictor: int = 1) -> bytes:
    """(H, W, C) uint8 (C in {1, 3}) → little-endian single-strip
    TIFF — the exact inverse of :func:`decode_tiff`. ``compression``:
    1 (none), 5 (LZW), 8 (Adobe Deflate), 32773 (PackBits);
    ``predictor=2`` applies horizontal differencing before compression
    (effective with LZW on smooth imagery — the standard pairing).
    PackBits output restarts at every image row (TIFF 6.0 §9 requires
    per-row packets; a whole-strip stream round-trips internally but
    external per-row decoders misparse it — ADVICE r7)."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_tiff expects 1 or 3 channels")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor == 2:
        arr = np.diff(
            arr.astype(np.int16), axis=1, prepend=np.zeros((h, 1, c), dtype=np.int16)
        ).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported predictor {predictor}")
    body = arr.tobytes()
    if compression == 5:
        body = lzw_encode(body)
    elif compression == 8:
        body = zlib.compress(body, 6)
    elif compression == 32773:
        # per-row packets (TIFF 6.0 §9): runs never cross a row
        # boundary; the concatenation still decodes as one stream
        # because PackBits packets are self-delimiting
        row_bytes = w * c
        body = b"".join(
            packbits_encode(body[i : i + row_bytes])
            for i in range(0, len(body), row_bytes)
        )
    photometric = 1 if c == 1 else 2  # BlackIsZero / RGB

    bits_off_placeholder = c == 3  # BitsPerSample needs 3 shorts out-of-line
    # layout: header(8) + ifd + out-of-line values + pixel data
    n_entries = 10
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
    ifd += entry(_COMPRESSION, 3, 1, compression)
    ifd += entry(_PHOTOMETRIC, 3, 1, photometric)
    ifd += entry(_STRIP_OFFSETS, 4, 1, data_off)
    ifd += entry(_SAMPLES_PER_PIXEL, 3, 1, c)
    ifd += entry(_ROWS_PER_STRIP, 4, 1, h)
    ifd += entry(_STRIP_COUNTS, 4, 1, len(body))
    ifd += entry(_PREDICTOR, 3, 1, predictor)
    ifd += struct.pack("<I", 0)  # next-IFD pointer
    return b"II*\x00" + struct.pack("<I", 8) + ifd + extra + body
