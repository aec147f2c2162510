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
    # stereo STREAMINFO rejected
    st = bytearray(good)
    # channels-1 lives in STREAMINFO byte 12 bits 1-3 (after 20-bit rate)
    st[8 + 12] |= 0x02  # set channels-1 = 1
    with pytest.raises(FlacError, match="mono"):
        decode_flac(bytes(st))


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
