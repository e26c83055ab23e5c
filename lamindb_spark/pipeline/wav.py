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
