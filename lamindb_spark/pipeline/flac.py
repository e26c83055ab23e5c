"""Pure-python FLAC codec for the multimodal audio path.

Decoder covers the full subframe set of the format (xiph.org spec /
RFC 9639): CONSTANT, VERBATIM, FIXED orders 0-4 and LPC up to order
32, Rice-coded residual partitions (4- and 5-bit parameter widths,
escape-to-raw), inter-channel decorrelation (left/side, right/side,
mid/side), UTF-8 frame numbers and wasted-bits. CRCs are parsed and
skipped (bit-exactness is pinned by tests instead — this is a data
pipeline, not a player).

Encoder is deliberately minimal but REAL: independent channels,
VERBATIM or FIXED(0-2) subframes with single-partition Rice residuals
— enough to round-trip arbitrary PCM bit-exactly through the full
decoder, which is what the multimodal tests pin. Frame headers carry
correct CRC-8/CRC-16 so the output is spec-conformant for other
readers.

FLAC is lossless: decode(encode(x)) == x EXACTLY (integer samples) —
the strongest round-trip property any codec here has.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def is_flac(data: bytes) -> bool:
    return len(data) > 4 and bytes(data[:4]) == b"fLaC"


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # absolute bit position

    def read(self, n: int) -> int:
        out = 0
        p = self.pos
        d = self.data
        for _ in range(n):
            out = (out << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_utf8_number(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n_more = 0
        mask = 0x40
        while b0 & mask:
            n_more += 1
            mask >>= 1
        v = b0 & (mask - 1)
        for _ in range(n_more):
            v = (v << 6) | (self.read(8) & 0x3F)
        return v


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_RATES = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
          6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_residual(br: _BitReader, n: int, pred_order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    res: list[int] = []
    for p in range(n_parts):
        count = (n >> part_order) - (pred_order if p == 0 else 0)
        rice = br.read(plen)
        if rice == escape:
            bits = br.read(5)
            for _ in range(count):
                res.append(br.read_signed(bits) if bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                v = (q << rice) | br.read(rice)
                res.append((v >> 1) ^ -(v & 1))  # un-zigzag
    return res


def _decode_subframe(br: _BitReader, n: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * n
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, n, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, n, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes):
    """bytes → (int32 samples of shape (n_frames, n_channels),
    sample_rate, bits_per_sample). Lossless: exact integers."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = n_ch = bps = None
    total = 0
    while True:
        hdr = data[pos : pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        if btype == 0:  # STREAMINFO
            si = _BitReader(data, pos + 4)
            si.read(16); si.read(16); si.read(24); si.read(24)
            rate = si.read(20)
            n_ch = si.read(3) + 1
            bps = si.read(5) + 1
            total = si.read(36)
        pos += 4 + length
        if last:
            break
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    br = _BitReader(data, pos)
    nbits = len(data) * 8
    while br.pos + 40 <= nbits:
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        br.read_utf8_number()
        if bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        br.read(8)  # CRC-8
        if ch_code < 8:
            subs = [_decode_subframe(br, n, bps) for _ in range(n_ch)]
        else:
            # stereo decorrelation: the SIDE channel carries bps+1 bits
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, n, bps + 1)
                right = _decode_subframe(br, n, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            elif ch_code == 10:  # mid/side
                mid = _decode_subframe(br, n, bps)
                side = _decode_subframe(br, n, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
            else:
                raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        br.read(16)  # CRC-16
        for c in range(n_ch):
            chans[c].extend(subs[c])
    n_out = total or min(len(c) for c in chans)
    arr = np.stack(
        [np.array(c[:n_out], dtype=np.int64) for c in chans], axis=1
    ).astype(np.int32)
    return arr, rate, bps


# --- encoder ----------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _write_rice(bw: _BitWriter, residual: list[int], rice: int) -> None:
    for r in residual:
        v = ((-r << 1) - 1) if r < 0 else (r << 1)  # zigzag
        q, rem = v >> rice, v & ((1 << rice) - 1)
        bw.write(1, q + 1)  # q zeros then a 1 == unary via write(1, q+1)
        if rice:
            bw.write(rem, rice)


def _best_fixed_order(samples: list[int], max_order: int = 2) -> int:
    best, best_cost = 0, None
    for order in range(max_order + 1):
        coefs = _FIXED_COEFS[order]
        cost = 0
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            cost += abs(samples[i] - pred)
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _write_utf8_number(bw: "_BitWriter", v: int) -> None:
    """FLAC's UTF-8-style frame-number coding (spec §9.1.5): 1-6 bytes
    covering the full 36-bit frame-number range. Mirrors
    ``_BitReader.read_utf8_number`` so clips longer than 128 blocks
    (~12 s at 44.1 kHz / block=4096) round-trip instead of failing the
    encode (ADVICE r5: resample_audio called encode_flac unconditionally
    and any long clip killed the Spark task)."""
    if v < 0x80:
        bw.write(v, 8)
        return
    # n_cont continuation bytes carry 6 bits each; the lead byte carries
    # 6 - n_cont bits, so capacity is 6 + 5*n_cont bits total
    n_cont = 1
    while v >= (1 << (6 + 5 * n_cont)) and n_cont < 5:
        n_cont += 1
    lead_prefix = (0xFF << (7 - n_cont)) & 0xFF  # n_cont+1 ones then a zero
    bw.write(lead_prefix | (v >> (6 * n_cont)), 8)
    for i in range(n_cont - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def encode_flac(samples, sample_rate: int, bps: int = 16, block: int = 4096) -> bytes:
    """int samples (n, ch) → FLAC bytes: independent channels, FIXED
    (order chosen 0-2 by absolute-residual cost) with one Rice
    partition, VERBATIM fallback when Rice would expand. Lossless."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_total, n_ch = arr.shape
    lim = 1 << (bps - 1)
    if arr.min() < -lim or arr.max() >= lim:
        raise ValueError("samples exceed bits-per-sample range")
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block, 16); si.write(block, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    frame_no = 0
    for b0 in range(0, n_total, block):
        blk = arr[b0 : b0 + block]
        n = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # samplerate: from STREAMINFO
        bw.write(n_ch - 1, 4)  # independent channels
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, frame_no)
        bw.write(n - 1, 16)
        hdr = bw
        partial = bytes(hdr.buf) if hdr.nacc == 0 else None
        assert partial is not None, "frame header must be byte-aligned here"
        bw.write(_crc8(partial), 8)
        for c in range(n_ch):
            ch = blk[:, c].tolist()
            order = _best_fixed_order(ch, 2 if n > 2 else 0)
            coefs = _FIXED_COEFS[order]
            res = [
                int(ch[i] - sum(cc * ch[i - 1 - j] for j, cc in enumerate(coefs)))
                for i in range(order, n)
            ]
            mean = (sum(abs(r) for r in res) / max(len(res), 1)) if res else 0
            rice = 0
            while (1 << (rice + 1)) < mean + 1 and rice < 14:
                rice += 1
            rice_bits = sum((abs(2 * r) >> rice) + 1 + rice for r in res)
            if res and rice_bits > len(res) * bps * 2:
                bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM
                for v in ch:
                    bw.write(int(v), bps)
            else:
                bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
                for v in ch[:order]:
                    bw.write(int(v), bps)
                bw.write(0, 2)  # 4-bit rice method
                bw.write(0, 4)  # partition order 0
                bw.write(min(rice, 14), 4)
                _write_rice(bw, res, min(rice, 14))
        bw.align()
        frame_bytes = bytes(bw.buf)
        bw.write(_crc16(frame_bytes), 16)
        out += bw.bytes()
        frame_no += 1
    return bytes(out)
