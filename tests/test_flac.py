"""Subset FLAC codec (operators/flac.py): encode→decode roundtrips over
every subframe type and fixed order, CRC tables pinned against published
check values, honest rejection of everything outside the envelope, and
the Spark feature stage. Cross-engine value gate:
plans/q_crawl.py::media_flac_features (integer prefix-sum replay)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawl_streams_spark.operators.flac import (
    FlacError,
    _unzigzag,
    _zigzag,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_tables_match_published_check_values():
    # CRC-8 poly 0x07 init 0 (FLAC header CRC): check("123456789") = 0xF4
    assert crc8(b"123456789") == 0xF4
    # CRC-16 poly 0x8005 init 0 unreflected (FLAC frame CRC,
    # CRC-16/UMTS a.k.a. BUYPASS): check("123456789") = 0xFEE8
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_zigzag_is_a_bijection_on_small_ints():
    for r in range(-1000, 1001):
        u = _zigzag(r)
        assert u >= 0
        assert _unzigzag(u) == r
    assert _zigzag(0) == 0 and _zigzag(-1) == 1 and _zigzag(1) == 2


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_order_roundtrip(order):
    rng = np.random.RandomState(order)
    x = rng.randint(-3000, 3000, size=700)
    meta, dec = decode_flac(encode_flac(x, order=order, rice_param=6))
    assert meta == (8000, 1, 16, 700)
    assert np.array_equal(dec, x)


def test_constant_verbatim_and_multiframe_roundtrip():
    x = np.full(512, -123)
    _, dec = decode_flac(encode_flac(x, subframe="constant"))
    assert np.array_equal(dec, x)
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, size=300)
    _, dec = decode_flac(encode_flac(x, subframe="verbatim"))
    assert np.array_equal(dec, x)
    # 700 samples at block 256 = 3 frames incl. a short tail frame
    x = rng.randint(-500, 500, size=700)
    _, dec = decode_flac(encode_flac(x, order=2, block_size=256))
    assert np.array_equal(dec, x)


def test_smooth_signals_actually_compress():
    """The point of the predictors: a smooth ramp under order 2 codes to
    far fewer bytes than the raw PCM (residuals collapse to ~0)."""
    x = np.arange(4096) % 1024  # piecewise-linear ramp
    enc = encode_flac(x, order=2, rice_param=2, block_size=1024)
    assert len(enc) < 2 * len(x) / 3, (len(enc), 2 * len(x))


def test_rejections_are_loud_and_specific():
    good = encode_flac(np.arange(64), order=1)
    with pytest.raises(FlacError, match="not a FLAC"):
        decode_flac(b"RIFF" + good[4:])
    # flip one residual bit -> CRC-16 mismatch
    torn = bytearray(good)
    torn[-5] ^= 0x10
    with pytest.raises(FlacError, match="CRC-16"):
        decode_flac(bytes(torn))
    # corrupt the frame header -> CRC-8 mismatch (sample rate code field)
    hdr = bytearray(good)
    # frame starts right after fLaC(4) + block header(4) + STREAMINFO(34)
    frame0 = 4 + 4 + 34
    hdr[frame0 + 2] ^= 0x01
    with pytest.raises(FlacError, match="CRC-8|sample rate"):
        decode_flac(bytes(hdr))
    # truncated mid-frame
    with pytest.raises(FlacError):
        decode_flac(good[:-7])
    # STREAMINFO channel count disagreeing with the frames is rejected
    # (stereo is supported since r8, but a stereo STREAMINFO over mono
    # frames is a lie — ch_code 0 is invalid for a 2-channel stream)
    st = bytearray(good)
    # channels-1 lives in STREAMINFO byte 12 bits 1-3 (after 20-bit rate)
    st[8 + 12] |= 0x02  # set channels-1 = 1
    with pytest.raises(FlacError, match="channel assignment"):
        decode_flac(bytes(st))
    # >2 channels rejected outright
    st2 = bytearray(good)
    st2[8 + 12] |= 0x04  # channels-1 = 2
    with pytest.raises(FlacError, match="mono/stereo"):
        decode_flac(bytes(st2))


@pytest.mark.parametrize(
    "coeffs,shift,prec",
    [
        ([32], 5, 12),                      # order 1, c=1.0 at shift 5
        ([64, -32], 5, 12),                 # order 2, 2s1 - s2 (fixed-2ish)
        ([-2048, 2047], 12, 12),            # precision rails, both signs
        ([1], 0, 2),                        # shift 0, minimal precision
        ([100, -50, 25, -12, 6], 7, 8),     # order 5 (beyond fixed's 4)
    ],
)
def test_lpc_roundtrip(coeffs, shift, prec):
    """Quantized-LPC subframes of any order round-trip exactly — the
    encoder computes residuals with the same arithmetic-shift predictor
    the decoder replays (floor division by 2^shift, negative sums
    included)."""
    rng = np.random.RandomState(len(coeffs))
    x = rng.randint(-3000, 3000, size=300)
    enc = encode_flac(
        x, subframe="lpc", lpc_coeffs=coeffs, lpc_shift=shift,
        lpc_precision=prec, rice_param=9, block_size=128,
    )
    meta, dec = decode_flac(enc)
    assert np.array_equal(dec, x)


def test_lpc_negative_shift_and_bad_precision_rejected():
    good = bytearray(
        encode_flac(np.arange(40), subframe="lpc", lpc_coeffs=[32],
                    lpc_shift=5, rice_param=9, block_size=64)
    )
    # the decoder rejects the invalid precision code 1111 and a
    # negative (sign-bit-set) shift; easiest to pin via the encoder's
    # own guards, which mirror the decoder envelope
    with pytest.raises(FlacError, match="precision"):
        encode_flac(np.arange(8), subframe="lpc", lpc_coeffs=[1],
                    lpc_precision=16)
    with pytest.raises(FlacError, match="shift"):
        encode_flac(np.arange(8), subframe="lpc", lpc_coeffs=[1],
                    lpc_shift=16)
    with pytest.raises(FlacError, match="coefficient"):
        encode_flac(np.arange(8), subframe="lpc", lpc_coeffs=[4096],
                    lpc_precision=12)
    assert decode_flac(bytes(good))  # the valid fixture still decodes


def test_streaminfo_total_mismatch_rejected():
    enc = bytearray(encode_flac(np.arange(100), order=1, block_size=50))
    # lie about total samples (36-bit field ending STREAMINFO numerics)
    # bytes 8+13..8+17 hold ...bps(5)/total(36); flip the low byte
    enc[8 + 17] ^= 0x01
    with pytest.raises(FlacError, match="declared"):
        decode_flac(bytes(enc))


def test_decode_stage_contains_errors_per_row(spark):
    from crawl_streams_spark.operators.multimodal import (
        decode_flac_features,
    )

    x = np.arange(200, dtype=np.int64) - 100
    ok = encode_flac(x, order=1)
    rows = [
        (1, bytearray(ok)),
        (2, bytearray(b"not flac at all")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in decode_flac_features(df).collect()}
    assert got[1]["error"] is None
    assert got[1]["n_samples"] == 200
    assert got[1]["bits"] == 16
    sumsq = int(np.sum(x * x))
    assert got[1]["rms"] == pytest.approx(
        (sumsq / 200) ** 0.5 / 32768.0, rel=1e-6
    )
    assert got[2]["error"] is not None and got[2]["n_samples"] is None
    assert got[3]["error"] == "null payload"


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_roundtrip_all_channel_assignments(mode):
    """All four stereo assignments reconstruct L/R exactly; side
    channels carry 17 bits, mid/side restores the parity bit from the
    side channel (the spec's integer decorrelation)."""
    from crawl_streams_spark.operators.flac import encode_flac_stereo

    rng = np.random.RandomState(hash(mode) % 1000)
    left = rng.randint(-32768, 32768, size=400)
    right = rng.randint(-32768, 32768, size=400)
    enc = encode_flac_stereo(left, right, mode=mode, order=1, rice_param=14,
                             block_size=128)
    meta, dec = decode_flac(enc)
    assert meta == (8000, 2, 16, 400)
    got = dec.reshape(-1, 2)
    assert np.array_equal(got[:, 0], left)
    assert np.array_equal(got[:, 1], right)


def test_stereo_decorrelation_actually_compresses():
    """Correlated channels: mid/side codes fewer bytes than independent
    (the reason the modes exist)."""
    from crawl_streams_spark.operators.flac import encode_flac_stereo

    t = np.arange(2048)
    left = ((t * 13) % 2000 - 1000).astype(np.int64)
    right = left + ((t * 7) % 9) - 4  # strongly correlated
    ind = encode_flac_stereo(left, right, mode="independent", order=2,
                             rice_param=11, block_size=512)
    ms = encode_flac_stereo(left, right, mode="mid_side", order=2,
                            rice_param=11, block_size=512)
    assert len(ms) < len(ind)


def test_stereo_mid_side_odd_sum_parity():
    """The mid channel floors (L+R)/2 — the parity bit lives in the side
    channel; odd sums are the case that breaks naive implementations."""
    from crawl_streams_spark.operators.flac import encode_flac_stereo

    left = np.array([1, 3, -5, 32767])
    right = np.array([0, 2, 2, -32768])  # every sum odd
    enc = encode_flac_stereo(left, right, mode="mid_side", order=0,
                             rice_param=14, block_size=4)
    _, dec = decode_flac(enc)
    got = dec.reshape(-1, 2)
    assert got[:, 0].tolist() == left.tolist()
    assert got[:, 1].tolist() == right.tolist()


def test_mono_stream_rejects_stereo_channel_code():
    good = bytearray(encode_flac(np.arange(16), order=0))
    # set the frame's channel-assignment nibble to 1 (2 channels): byte
    # layout after sync: [sync(14) res(1) strat(1)] [bs(4) sr(4)] [ch(4) ss(3) res(1)]
    frame0 = 4 + 4 + 34
    good[frame0 + 3] = (good[frame0 + 3] & 0x0F) | (1 << 4)
    with pytest.raises(FlacError, match="mono stream|CRC-8"):
        decode_flac(bytes(good))
