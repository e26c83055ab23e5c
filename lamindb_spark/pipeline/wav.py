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


def decode_wav(data: bytes):
    """bytes → (samples float64 in [-1, 1] of shape (n_frames,
    n_channels), sample_rate)."""
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
