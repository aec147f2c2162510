"""Pure-NumPy BMP codec (operators/bmp.py) and its Spark decode stage
(multimodal.decode_bmp_features). The decoder is pinned against a
HAND-PACKED golden payload built byte-by-byte from the BITMAPFILEHEADER/
BITMAPINFOHEADER layout (never only against the package encoder), plus
round trips over both bit depths and both row orders, the 4-byte row
padding edge widths, and per-row error containment in the Spark stage.
Cross-engine value gate: plans/q_crawl.py::media_bmp_features
(uncompressed → lossless analytic SQL oracle).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawl_streams_spark.operators.bmp import (
    BmpError,
    decode_bmp,
    encode_bmp,
    pattern_bmp,
)


def _hand_packed_2x2_24() -> tuple[bytes, np.ndarray]:
    """A 2x2 24-bit bottom-up BMP assembled from the spec layout by
    hand: rows are BGR, padded to 4 bytes (2*3=6 → stride 8), stored
    bottom row first."""
    # image (RGB): top row [(255,0,0), (0,255,0)]; bottom [(0,0,255), (9,8,7)]
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 8, 7]]],
        dtype=np.uint8,
    )
    bottom = bytes([255, 0, 0, 7, 8, 9]) + b"\x00\x00"  # BGR BGR pad
    top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    body = bottom + top  # bottom-up
    info = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return head + info + body, want


def test_hand_packed_golden_decodes():
    payload, want = _hand_packed_2x2_24()
    assert np.array_equal(decode_bmp(payload), want)


@pytest.mark.parametrize("bits", [8, 24])
@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (5, 4), (7, 9), (3, 15)])
def test_roundtrip_all_layouts(bits, top_down, shape):
    rng = np.random.default_rng(sum(shape) * bits + top_down)
    h, w = shape
    if bits == 24:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        want = a
    else:
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        want = np.repeat(a[:, :, None], 3, axis=2)  # grayscale palette
    got = decode_bmp(encode_bmp(a, bits=bits, top_down=top_down))
    assert np.array_equal(got, want)


def test_row_padding_is_exercised_and_stripped():
    # width 3 at 24 bits: 9 used bytes, stride 12 — three pad bytes/row
    a = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    payload = encode_bmp(a, bits=24)
    stride_bytes = len(payload) - (14 + 40)
    assert stride_bytes == 3 * 12
    assert np.array_equal(decode_bmp(payload), a)


def test_pattern_bmp_closed_form():
    for seed in (0, 1, 2, 7):
        for bits in (8, 24):
            rgb = decode_bmp(pattern_bmp(seed, 9, 4, bits=bits))
            y = np.arange(4)[:, None]
            x = np.arange(9)[None, :]
            v = (seed * 31 + y * 7 + x * 13) % 256
            assert rgb.shape == (4, 9, 3)
            assert int(rgb.sum()) == 3 * int(v.sum())
            assert int(rgb.min()) == int(v.min())
            assert int(rgb.max()) == int(v.max())


def test_malformed_payloads_raise_bmperror():
    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8), bits=24)
    for bad in (
        b"",
        b"XY" + good[2:],  # magic
        good[:-7],  # truncated pixels
        good[:20],  # truncated info header
    ):
        with pytest.raises(BmpError):
            decode_bmp(bad)
    # unsupported compression (BI_RLE8 = 1)
    rle = bytearray(good)
    struct.pack_into("<I", rle, 14 + 16, 1)
    with pytest.raises(BmpError):
        decode_bmp(bytes(rle))
    # unsupported bit depth
    b16 = bytearray(good)
    struct.pack_into("<H", b16, 14 + 14, 16)
    with pytest.raises(BmpError):
        decode_bmp(bytes(b16))
    # palette index past the declared table
    idx = np.full((2, 2), 5, dtype=np.uint8)
    small_table = bytearray(encode_bmp(idx, bits=8))
    # shrink declared color table to 4 entries without moving data:
    # declare biClrUsed=4 — index 5 must now be rejected
    struct.pack_into("<I", small_table, 14 + 32, 4)
    with pytest.raises(BmpError):
        decode_bmp(bytes(small_table))
    # bfOffBits pointing inside the headers: 24-bit payload with off < 54
    # would decode header bytes as pixels (ADVICE r7) — must reject, and
    # the payload must stay long enough that only the overlap check fires
    low_off = bytearray(good + b"\x00" * 54)
    struct.pack_into("<I", low_off, 10, 53)
    with pytest.raises(BmpError, match="overlaps headers"):
        decode_bmp(bytes(low_off))
    # 8-bit payload with off inside the palette: the pal_end > off guard
    # catches it as a truncated table — either rejection is correct
    pal_bmp = encode_bmp(np.zeros((2, 2), dtype=np.uint8), bits=8)
    low_pal = bytearray(pal_bmp + b"\x00" * (54 + 1024))
    struct.pack_into("<I", low_pal, 10, 54 + 1024 - 1)
    with pytest.raises(BmpError, match="truncated color table|overlaps"):
        decode_bmp(bytes(low_pal))


def test_decode_stage_contains_errors_per_row(spark):
    import pyspark.sql.functions as F

    from crawl_streams_spark.operators.multimodal import decode_bmp_features

    good = encode_bmp(
        (np.arange(12, dtype=np.uint8) * 3).reshape(2, 2, 3), bits=24
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a bmp")), (3, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_bmp_features(df).collect()}
    assert rows[1]["error"] is None
    assert rows[1]["width"] == 2 and rows[1]["height"] == 2
    assert rows[1]["sum_rgb"] == int(
        (np.arange(12, dtype=np.int64) * 3).sum()
    )
    assert rows[2]["error"] and rows[2]["width"] is None
    assert rows[3]["error"] == "null payload"
