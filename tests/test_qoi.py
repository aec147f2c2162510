"""QOI codec (operators/qoi.py): hand-derived op vectors straight from
the one-page spec, roundtrips over every op mix, strict rejections, the
Spark feature stage, and a hypothesis fuzz. Cross-engine value gate:
plans/q_crawl.py::media_qoi_features (analytic closed-form oracle)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.operators.qoi import (
    QoiError,
    decode_qoi,
    encode_qoi,
    pattern_qoi,
)

_END = b"\x00" * 7 + b"\x01"


def _hdr(w, h, ch=3):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, 0)


def test_hand_built_op_vectors():
    """One stream exercising every op, decoded against hand-computed
    pixels (spec walkthrough): RGB sets (10,20,30); RUN repeats it;
    DIFF (+1,+1,+1) gives (11,21,31); LUMA dg=+10, dr-dg=-2, db-dg=+3
    gives (19,31,44); INDEX recalls (10,20,30) from slot
    hash(10,20,30,255) = (30+100+210+2805)%64 = 9."""
    stream = bytes(
        [0xFE, 10, 20, 30]          # RGB (10,20,30)
        + [0xC0 | 1]                # RUN 2 -> two more copies
        + [0x40 | (3 << 4) | (3 << 2) | 3]  # DIFF +1,+1,+1 -> (11,21,31)
        + [0x80 | (10 + 32), ((-2 + 8) << 4) | (3 + 8)]  # LUMA
        + [9]                       # INDEX slot 9 -> (10,20,30)
    )
    payload = _hdr(6, 1) + stream + _END
    px = decode_qoi(payload)
    want = np.array(
        [[[10, 20, 30]] * 3 + [[11, 21, 31]] + [[19, 31, 44]]
         + [[10, 20, 30]]],
        dtype=np.uint8,
    )
    assert np.array_equal(px, want)
    # spec hash check the INDEX slot relied on
    assert (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64 == 9


def test_wraparound_diff_is_mod_256():
    # DIFF -2 from 1 must wrap to 255 (spec: wraparound arithmetic)
    stream = bytes([0xFE, 1, 1, 1, 0x40 | (0 << 4) | (0 << 2) | 0])
    px = decode_qoi(_hdr(2, 1) + stream + _END)
    assert px[0, 1].tolist() == [255, 255, 255]


@pytest.mark.parametrize("ch", [3, 4])
def test_roundtrip_random(ch):
    rng = np.random.RandomState(ch)
    a = rng.randint(0, 256, size=(11, 23, ch), dtype=np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(a, channels=ch)), a)


def test_roundtrip_compressible_shapes():
    # long runs, palette revisits, small diffs — the ops that compress
    a = np.zeros((16, 64, 3), dtype=np.uint8)
    a[:, 32:, 0] = 200
    a[::2, :, 1] = np.arange(64, dtype=np.uint8)
    enc = encode_qoi(a)
    assert np.array_equal(decode_qoi(enc), a)
    assert len(enc) < a.size // 2


def test_alpha_changes_force_rgba_op():
    a = np.zeros((1, 3, 4), dtype=np.uint8)
    a[0, 1, 3] = 128  # alpha change mid-row
    a[0, 2, 3] = 128
    enc = encode_qoi(a, channels=4)
    assert 0xFF in enc[14:-8]  # QOI_OP_RGBA emitted
    assert np.array_equal(decode_qoi(enc), a)


def test_rejections():
    rng = np.random.RandomState(1)
    good = encode_qoi(rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8))
    with pytest.raises(QoiError, match="not a QOI"):
        decode_qoi(b"qoix" + good[4:])
    with pytest.raises(QoiError, match="underrun|end marker"):
        decode_qoi(good[:-9])
    with pytest.raises(QoiError, match="trailing|end marker"):
        decode_qoi(good + b"\x00")
    with pytest.raises(QoiError, match="channel"):
        decode_qoi(good[:12] + b"\x05" + good[13:])
    # a run overflowing the declared pixel count
    bad = _hdr(2, 1) + bytes([0xFE, 1, 2, 3, 0xC0 | 5]) + _END
    with pytest.raises(QoiError, match="run overflows"):
        decode_qoi(bad)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([3, 4]),
)
def test_roundtrip_fuzz(w, h, seed, ch):
    rng = np.random.RandomState(seed % (2**31))
    # mix smooth regions (diff/luma/run territory) with noise
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    if h > 2:
        a[: h // 2] = a[0, 0]
    assert np.array_equal(decode_qoi(encode_qoi(a, channels=ch)), a)


def test_decode_stage_contains_errors_per_row(spark):
    from crawl_streams_spark.operators.multimodal import decode_qoi_features

    rows = [
        (1, bytearray(pattern_qoi(2, 9, 4))),
        (2, bytearray(b"garbage")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in decode_qoi_features(df).collect()}
    assert got[1]["error"] is None
    assert (got[1]["width"], got[1]["height"]) == (9, 4)
    y, x = np.mgrid[0:4, 0:9]
    v = (2 * 31 + y * 7 + x * 13) % 256
    assert got[1]["sum_rgb"] == 3 * int(v.sum())
    assert got[2]["error"] is not None
    assert got[3]["error"] == "null payload"
