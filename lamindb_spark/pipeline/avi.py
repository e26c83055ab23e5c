"""MJPEG-in-AVI video codec — pure python/numpy, no codec libs.

Makes the ``video`` modality REAL for the one codec family this repo
can decode end-to-end: an AVI (RIFF) container whose video stream is
Motion-JPEG, i.e. every frame is a baseline JPEG (``jpeg.py``). This
is the standard interchange format for lab/scientific capture rigs
and the honest scope boundary: inter-frame codecs (H.264/VP9/AV1)
require entropy decoders and reference-frame machinery that belongs
to a codec library, and stay declared stubs (see ``multimodal.py``).

- :func:`decode_avi` — RIFF parse (hdrl: avih + strl/strh/strf; movi:
  ``NNdc``/``NNwb`` chunks; idx1 ignored), returns stream metadata +
  per-frame JPEG payloads decoded lazily on access.
- :func:`encode_avi` — the matching writer (round-trip oracle +
  export sink): MJPG video stream, optional PCM audio stream.

Frames decode one at a time on demand — a frame-sampling stage that
reads every Nth frame never touches the other frames' JPEG bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg, is_jpeg


def is_avi(data: bytes) -> bool:
    return len(data) > 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


class AviVideo:
    """Parsed AVI: stream metadata + lazy per-frame JPEG decode."""

    def __init__(
        self,
        width: int,
        height: int,
        fps: float,
        frames: list[bytes],
        audio: bytes | None = None,
        audio_rate: int | None = None,
    ):
        self.width = width
        self.height = height
        self.fps = fps
        self.frames = frames
        self.audio = audio
        self.audio_rate = audio_rate

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return int(round(self.n_frames * 1000 / self.fps)) if self.fps else 0

    def frame(self, idx: int) -> np.ndarray:
        """Decode frame ``idx`` → HxWxC uint8 (only this frame's JPEG
        bytes are touched)."""
        arr, _w, _h, _c = decode_jpeg(self.frames[idx])
        return arr

    def frame_at(self, offset_ms: float) -> tuple[int, np.ndarray]:
        """(index, pixels) of the frame covering ``offset_ms``."""
        idx = min(int(offset_ms * self.fps / 1000), self.n_frames - 1)
        return idx, self.frame(max(idx, 0))


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_size) over a RIFF chunk run;
    chunk bodies are padded to even length."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> AviVideo:
    """Parse an AVI container; the video stream must be MJPG (every
    ``dc`` chunk a JPEG)."""
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF/AVI ) stream")
    width = height = 0
    fps = 0.0
    stream_types: list[bytes] = []
    audio_rate = None
    frames: list[bytes] = []
    audio = bytearray()

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, audio_rate
        for fourcc, body, size in _chunks(data, pos, end):
            if fourcc == b"LIST":
                list_type = data[body : body + 4]
                if list_type in (b"hdrl", b"strl", b"movi", b"INFO"):
                    walk(body + 4, body + size)
            elif fourcc == b"avih":
                (usec_per_frame,) = struct.unpack_from("<I", data, body)
                w, h = struct.unpack_from("<II", data, body + 32)
                width, height = int(w), int(h)
                if usec_per_frame:
                    fps = 1_000_000 / usec_per_frame
            elif fourcc == b"strh":
                fcc_type = data[body : body + 4]
                stream_types.append(fcc_type)
                if fcc_type == b"vids":
                    handler = data[body + 4 : body + 8]
                    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                        raise NotImplementedError(
                            f"AVI video codec {handler!r} — only MJPG is "
                            "supported (inter-frame codecs need a codec lib)"
                        )
                    scale, rate = struct.unpack_from("<II", data, body + 20)
                    if scale:
                        fps = rate / scale
                elif fcc_type == b"auds":
                    pass  # rate read from strf below
            elif fourcc == b"strf" and stream_types and stream_types[-1] == b"auds":
                # WAVEFORMATEX: fmt(2) channels(2) samples/sec(4)
                audio_rate = struct.unpack_from("<I", data, body + 4)[0]
            elif len(fourcc) == 4 and fourcc[2:4] == b"dc":
                chunk = bytes(data[body : body + size])
                if chunk and not is_jpeg(chunk):
                    raise NotImplementedError(
                        "non-JPEG dc chunk — only MJPG AVIs are supported"
                    )
                frames.append(chunk)
            elif len(fourcc) == 4 and fourcc[2:4] == b"wb":
                audio.extend(data[body : body + size])

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI has no video frames")
    return AviVideo(
        width, height, fps or 25.0, frames,
        bytes(audio) or None, audio_rate,
    )


def encode_avi(
    frames: list[np.ndarray],
    fps: float = 25.0,
    quality: int = 90,
    audio: bytes | None = None,
    audio_rate: int = 8000,
) -> bytes:
    """Write an MJPG AVI from HxWxC uint8 frames (+ optional mono
    16-bit PCM audio bytes). Round-trip oracle for :func:`decode_avi`."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(1_000_000 / fps), 0, 0, 0x10, len(jpegs), 0, n_streams,
        max(len(j) for j in jpegs), w, h, 0, 0, 0, 0,
    )
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1000, int(fps * 1000), 0,
        len(jpegs), max(len(j) for j in jpegs), 10000, 0, 0, 0, h,
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl_v = list_chunk(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
    streams = strl_v
    if audio is not None:
        strh_a = struct.pack(
            "<4s4sIHHIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, audio_rate, 0,
            len(audio) // 2, len(audio), 0, 2, 0, 0, 0,
        )
        # WAVEFORMATEX: PCM mono 16-bit
        strf_a = struct.pack(
            "<HHIIHH", 1, 1, audio_rate, audio_rate * 2, 2, 16
        )
        streams += list_chunk(
            b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)
        )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + streams)
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    if audio is not None:
        movi_body += chunk(b"01wb", audio)
    movi = list_chunk(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
