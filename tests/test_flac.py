"""FLAC codec: lossless round-trips through the minimal encoder, plus
decode-only coverage of subframe/stereo modes the encoder does not
emit (LPC, constant, mid/side) via hand-built streams."""

import numpy as np
import pytest

from lamindb_spark.pipeline.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
    is_flac,
)


def test_flac_round_trip_exact_mono():
    rng = np.random.default_rng(7)
    sig = (rng.standard_normal(5000) * 3000).astype(np.int32)
    # make it smooth enough that FIXED predictors engage
    sig = np.cumsum(sig // 50).astype(np.int32)
    sig = np.clip(sig, -32768, 32767)
    data = encode_flac(sig, 44100)
    assert is_flac(data)
    out, rate, bps = decode_flac(data)
    assert rate == 44100 and bps == 16
    assert np.array_equal(out[:, 0], sig)


def test_flac_round_trip_exact_stereo_multiblock():
    rng = np.random.default_rng(11)
    n = 10_000  # 3 blocks at 4096
    sig = np.stack(
        [
            np.clip(np.cumsum(rng.integers(-40, 41, n)), -30000, 30000),
            rng.integers(-32768, 32767, n),
        ],
        axis=1,
    ).astype(np.int32)
    out, rate, _ = decode_flac(encode_flac(sig, 16000))
    assert np.array_equal(out, sig)


def test_flac_round_trip_noise_uses_verbatim_safely():
    rng = np.random.default_rng(3)
    sig = rng.integers(-32768, 32768, 300).astype(np.int32)
    out, _, _ = decode_flac(encode_flac(sig, 8000, block=256))
    assert np.array_equal(out[:, 0], sig)


def test_flac_range_check():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)


def _hand_frame(n_ch_code, bps, blocksize, subframes_fn, total, rate=8000):
    """Build a tiny FLAC stream with one frame whose subframes are
    written by subframes_fn(bitwriter) — independent of the encoder."""
    import struct

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20)
    si.write(1 if n_ch_code >= 8 else n_ch_code, 3)  # channels-1
    si.write(bps - 1, 5)
    si.write(total, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.bytes()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    bw = _BitWriter()
    bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
    bw.write(7, 4)       # blocksize at end of header (16 bit)
    bw.write(0, 4)       # rate from STREAMINFO
    bw.write(n_ch_code, 4)
    bw.write(4, 3)       # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)       # frame 0
    bw.write(blocksize - 1, 16)
    bw.write(_crc8(bytes(bw.buf)), 8)
    subframes_fn(bw)
    bw.align()
    bw.write(_crc16(bytes(bw.buf)), 16)
    out += bw.bytes()
    return bytes(out)


def test_flac_decodes_constant_and_lpc_subframes():
    # ch0: CONSTANT -7; ch1: LPC order 1, coef 1, shift 0 (running sum)
    warm, res = 100, [5, -3, 2]

    def subs(bw):
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)        # CONSTANT
        bw.write((-7) & 0xFFFF, 16)
        bw.write(0, 1); bw.write(32, 6); bw.write(0, 1)       # LPC order 1
        bw.write(warm & 0xFFFF, 16)
        bw.write(14, 4)                                        # precision-1
        bw.write(0, 5)                                         # shift
        bw.write(1, 15)                                        # coef = 1
        bw.write(0, 2); bw.write(0, 4)                         # rice part 0
        bw.write(2, 4)                                         # rice param 2
        for r in res:
            v = ((-r << 1) - 1) if r < 0 else (r << 1)
            bw.write(1, (v >> 2) + 1)
            bw.write(v & 3, 2)

    data = _hand_frame(1, 16, 4, subs, total=4)
    out, _, _ = decode_flac(data)
    assert out[:, 0].tolist() == [-7, -7, -7, -7]
    assert out[:, 1].tolist() == [100, 105, 102, 104]


def test_flac_decodes_mid_side():
    # L = [10, 11], R = [4, 5] → mid = (L+R)>>1 = [7, 8], side = L-R = [6, 6]
    def subs(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM mid (16)
        for v in (7, 8):
            bw.write(v, 16)
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)  # VERBATIM side (17)
        for v in (6, 6):
            bw.write(v, 17)

    data = _hand_frame(10, 16, 2, subs, total=2)
    out, _, _ = decode_flac(data)
    assert out[:, 0].tolist() == [10, 11]
    assert out[:, 1].tolist() == [4, 5]


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(1, 3000),
    n_ch=st.integers(1, 2),
    scale=st.sampled_from([3, 300, 30000]),
    block=st.sampled_from([192, 576, 4096]),
    seed=st.integers(0, 2**31),
)
def test_flac_round_trip_property(n, n_ch, scale, block, seed):
    """decode(encode(x)) is BIT-EXACT for any length/channels/amplitude
    /blocksize — partial tail blocks, 1-sample streams, constant and
    noisy content all included."""
    rng = np.random.default_rng(seed)
    sig = np.clip(
        np.cumsum(rng.integers(-scale, scale + 1, (n, n_ch)), axis=0),
        -32768,
        32767,
    ).astype(np.int32)
    out, rate, bps = decode_flac(encode_flac(sig, 22050, block=block))
    assert rate == 22050 and bps == 16
    assert np.array_equal(out, sig)
