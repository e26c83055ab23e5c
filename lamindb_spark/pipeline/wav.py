"""Pure-python WAV codec (stdlib ``wave`` + ``array``; no soundfile).

Second real media format for the multimodal pipeline (after PNG in
``png.py``): RIFF/WAVE PCM payloads decode to actual samples inside
the ``mapInPandas`` stages instead of the deterministic fake. Scope:
integer PCM at 8/16/32-bit depth, any channel count — what the
stdlib ``wave`` module reads/writes.

``resample_nearest`` is the audio analogue of the PNG
``resize_nearest`` kernel (nearest-neighbor sample pick, no
interpolation) so ``resample_audio`` can re-encode at a target rate.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_SIG = b"RIFF"

_DTYPES = {1: "u1", 2: "<i2", 4: "<i4"}
_SCALE = {1: 127.5, 2: 32768.0, 4: 2147483648.0}


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == WAV_SIG and data[8:12] == b"WAVE"


# --- G.711 companded telephony formats (WAV fmt codes 6 = A-law,
# 7 = mu-law), decoded via the canonical ITU expansion formulas
# (8-bit logarithmic byte → 13/14-bit linear PCM). The stdlib `wave`
# module only reads PCM, so these parse the RIFF chunks directly.

_G711_ALAW, _G711_ULAW = 6, 7


def _ulaw_decode_table():
    t = np.empty(256, dtype=np.int16)
    for u in range(256):
        v = ~u & 0xFF
        s = (((v & 0x0F) << 3) + 0x84) << ((v & 0x70) >> 4)
        t[u] = (0x84 - s) if (v & 0x80) else (s - 0x84)
    return t


def _alaw_decode_table():
    t = np.empty(256, dtype=np.int16)
    for a in range(256):
        v = a ^ 0x55
        s = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            s += 8
        elif seg == 1:
            s += 0x108
        else:
            s = (s + 0x108) << (seg - 1)
        t[a] = s if (v & 0x80) else -s
    return t


_G711_TABLES = {_G711_ULAW: _ulaw_decode_table, _G711_ALAW: _alaw_decode_table}


def _riff_chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = np.frombuffer(data[pos + 4 : pos + 8], dtype="<u4")
        yield cid, data[pos + 8 : pos + 8 + int(size)]
        pos += 8 + int(size) + (int(size) & 1)  # chunks are word-aligned


def _wav_format_code(data: bytes) -> int:
    for cid, payload in _riff_chunks(data):
        if cid == b"fmt ":
            return int(np.frombuffer(payload[0:2], dtype="<u2")[0])
    raise ValueError("WAV without fmt chunk")


def _decode_wav_g711(data: bytes, fmt: int):
    table = _G711_TABLES[fmt]()
    n_ch = rate = None
    raw = b""
    for cid, payload in _riff_chunks(data):
        if cid == b"fmt ":
            n_ch = int(np.frombuffer(payload[2:4], dtype="<u2")[0])
            rate = int(np.frombuffer(payload[4:8], dtype="<u4")[0])
        elif cid == b"data":
            raw = payload
    pcm = table[np.frombuffer(raw, dtype=np.uint8)]
    # mu-law peaks at ±32124, A-law at ±(0xFFF<<4)=±32640 on the
    # 16-bit scale; normalize by the PCM16 full scale like sampwidth=2
    return pcm.reshape(-1, n_ch).astype("float64") / _SCALE[2], rate


def _encode_g711_bytes(samples, fmt: int) -> bytes:
    """float [-1, 1] → companded bytes: nearest decoded value
    (deterministic tie toward the smaller linear value)."""
    table = _G711_TABLES[fmt]()
    order = np.argsort(table, kind="stable")
    svals = table[order].astype(np.int32)
    pcm = np.clip(np.round(np.asarray(samples, dtype="float64") * _SCALE[2]),
                  -32768, 32767).astype(np.int32).ravel()
    pos = np.clip(np.searchsorted(svals, pcm), 1, 255)
    left, right = svals[pos - 1], svals[pos]
    take_left = (pcm - left) <= (right - pcm)
    return np.where(take_left, order[pos - 1], order[pos]).astype(np.uint8).tobytes()


def encode_wav_g711(samples, sample_rate: int, law: str = "ulaw") -> bytes:
    """(n_frames, n_channels) float64 in [-1, 1] → RIFF/WAVE G.711
    bytes (fmt code 7 for ``ulaw``, 6 for ``alaw``)."""
    import struct

    fmt = _G711_ULAW if law == "ulaw" else _G711_ALAW
    arr = np.asarray(samples, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    body = _encode_g711_bytes(arr, fmt)
    fmt_chunk = struct.pack(
        "<HHIIHHH", fmt, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8, 0
    )
    out = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    out += b"fact" + struct.pack("<II", 4, arr.shape[0])
    out += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def decode_wav(data: bytes):
    """bytes → (samples float64 in [-1, 1] of shape (n_frames,
    n_channels), sample_rate). Integer PCM via stdlib ``wave``;
    G.711 mu-law/A-law (fmt codes 7/6) via the ITU expansion tables."""
    fmt = _wav_format_code(bytes(data))
    if fmt in _G711_TABLES:
        return _decode_wav_g711(bytes(data), fmt)
    if fmt == 0x11:  # IMA/DVI ADPCM
        return decode_wav_ima(bytes(data))
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sampwidth not in _DTYPES:
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    arr = np.frombuffer(raw, dtype=_DTYPES[sampwidth]).reshape(-1, n_ch)
    if sampwidth == 1:  # unsigned 8-bit: center on 0
        samples = (arr.astype("float64") - 127.5) / _SCALE[1]
    else:
        samples = arr.astype("float64") / _SCALE[sampwidth]
    return samples, rate


def encode_wav(samples, sample_rate: int, sampwidth: int = 2) -> bytes:
    """(n_frames, n_channels) float64 in [-1, 1] → RIFF/WAVE PCM
    bytes. Exact inverse of :func:`decode_wav` up to quantization."""
    arr = np.asarray(samples, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    if sampwidth == 1:
        quant = np.clip(np.round(arr * _SCALE[1] + 127.5), 0, 255).astype("u1")
    else:
        lim = _SCALE[sampwidth]
        quant = np.clip(np.round(arr * lim), -lim, lim - 1).astype(_DTYPES[sampwidth])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(quant.tobytes())
    return buf.getvalue()


def resample_nearest(samples, src_rate: int, dst_rate: int):
    """Nearest-neighbor resample (no interpolation) — index map
    ``round(i * src/dst)``, the 1-D analogue of PNG resize."""
    arr = np.asarray(samples)
    n_out = max(1, int(round(arr.shape[0] * dst_rate / src_rate)))
    idx = np.minimum(
        np.round(np.arange(n_out) * src_rate / dst_rate).astype("int64"),
        arr.shape[0] - 1,
    )
    return arr[idx]


# --- IMA/DVI ADPCM (WAV fmt code 0x11) --------------------------------
# 4-bit adaptive differential PCM: per-block header carries the seed
# predictor + step index, then one nibble per sample steps the shared
# encoder/decoder state machine (IMA ADPCM spec / RFC 3551 payload).
# Blocks are independent — the parallelism unit at corpus scale.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
_IMA_FMT = 0x11


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One state-machine step shared by encode and decode: apply a
    nibble to (predictor, step index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX[nibble]))
    return pred, index


def _ima_encode_nibble(sample: int, pred: int, index: int) -> int:
    step = _IMA_STEPS[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def decode_wav_ima(data: bytes):
    """IMA ADPCM WAV → (float64 samples in [-1, 1], rate). Mono and
    stereo (stereo nibbles interleave in 4-byte per-channel groups)."""
    import struct

    n_ch = rate = block_align = None
    raw = b""
    for cid, payload in _riff_chunks(bytes(data)):
        if cid == b"fmt ":
            n_ch = int(np.frombuffer(payload[2:4], dtype="<u2")[0])
            rate = int(np.frombuffer(payload[4:8], dtype="<u4")[0])
            block_align = int(np.frombuffer(payload[12:14], dtype="<u2")[0])
        elif cid == b"data":
            raw = payload
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for b0 in range(0, len(raw) - (len(raw) % block_align), block_align):
        block = raw[b0 : b0 + block_align]
        preds, idxs = [], []
        for c in range(n_ch):
            p, i = struct.unpack_from("<hBx", block, c * 4)
            preds.append(p)
            idxs.append(min(max(i, 0), 88))
            chans[c].append(p)  # header predictor IS the first sample
        body = block[4 * n_ch :]
        # nibbles come in 4-byte (8-nibble) groups per channel
        for g0 in range(0, len(body) - (len(body) % (4 * n_ch)), 4 * n_ch):
            for c in range(n_ch):
                for byte in body[g0 + 4 * c : g0 + 4 * c + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
    n = min(len(ch) for ch in chans)
    arr = np.stack([np.array(ch[:n], dtype=np.int32) for ch in chans], axis=1)
    return arr.astype("float64") / _SCALE[2], rate


def encode_wav_ima(samples, sample_rate: int, block_frames: int = 505) -> bytes:
    """float [-1, 1] → IMA ADPCM RIFF/WAVE. The encoder's predictor IS
    the decoder state machine, so decode(encode(x)) equals the
    encoder's internal reconstruction exactly — the self-consistency
    the round-trip test pins. ``block_frames`` must be 1 + a multiple
    of 8 (nibble groups)."""
    import struct

    if (block_frames - 1) % 8:
        raise ValueError("block_frames must be 1 + k*8")
    arr = np.asarray(samples, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    pcm = np.clip(np.round(arr * _SCALE[2]), -32768, 32767).astype(np.int32)
    block_align = 4 * n_ch + ((block_frames - 1) // 2) * n_ch
    body = bytearray()
    idxs = [0] * n_ch
    for b0 in range(0, n_frames, block_frames):
        blk = pcm[b0 : b0 + block_frames]
        # pad the tail block to full length by repeating the last frame
        if len(blk) < block_frames:
            pad = np.repeat(blk[-1:], block_frames - len(blk), axis=0)
            blk = np.concatenate([blk, pad], axis=0)
        preds = []
        for c in range(n_ch):
            p = int(blk[0, c])
            body += struct.pack("<hBx", p, idxs[c])
            preds.append(p)
        nibs: list[list[int]] = [[] for _ in range(n_ch)]
        for t in range(1, block_frames):
            for c in range(n_ch):
                nib = _ima_encode_nibble(int(blk[t, c]), preds[c], idxs[c])
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibs[c].append(nib)
        for g in range(0, len(nibs[0]), 8):
            for c in range(n_ch):
                for k in range(0, 8, 2):
                    body.append(nibs[c][g + k] | (nibs[c][g + k + 1] << 4))
    n_blocks = (n_frames + block_frames - 1) // block_frames
    fmt_chunk = struct.pack(
        "<HHIIHHHH",
        _IMA_FMT,
        n_ch,
        sample_rate,
        sample_rate * block_align // block_frames,
        block_align,
        4,
        2,
        block_frames,
    )
    out = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    out += b"fact" + struct.pack("<II", 4, n_blocks * block_frames)
    out += b"data" + struct.pack("<I", len(body)) + bytes(body)
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out
