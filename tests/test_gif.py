"""Pure-Python GIF codec (operators/gif.py) and its Spark decode stage
(multimodal.decode_gif_features). The LZW encoder is pinned against an
INDEPENDENT scalar decoder transcribed from the GIF89a specification's
decode procedure (never against the package decoder alone), plus
hand-derived golden vectors for the two classic trip wires — the KwKwK
first-unknown-code case and a code-width boundary crossed by the final
flush code right before EOI. Cross-engine value gate:
plans/q_crawl.py::media_gif_features (lossless analytic SQL oracle).
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.operators.gif import (
    GifError,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
    pattern_gif,
)


def _reference_lzw_decode(data: bytes, mcs: int) -> list[int]:
    """Scalar LZW decode transcribed from the GIF89a spec appendix
    procedure: read variable-width codes LSB-first, CC resets the table,
    the first code after CC is a literal, an unknown code is
    prev + prev[0], and the code size bumps when the next slot would not
    fit — deliberately naive (bit-at-a-time, list-of-lists table) so a
    bit-packing or width-schedule bug in the package coder cannot hide."""
    bits = []
    for byte in data:
        for i in range(8):
            bits.append((byte >> i) & 1)
    pos = 0
    cc, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table = [[i] for i in range(cc)] + [None, None]
    prev = None
    out: list[int] = []
    while True:
        if pos + width > len(bits):
            raise AssertionError("ended without EOI")
        code = 0
        for i in range(width):
            code |= bits[pos + i] << i
        pos += width
        if code == cc:
            table = [[i] for i in range(cc)] + [None, None]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        else:
            assert code == len(table), "code beyond table"
            entry = prev + prev[:1]
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry


# --- hand-derived golden vectors ------------------------------------------


def test_kwkwk_vector():
    # [1,1,1] with mcs=2: encoder emits the code it has only just
    # defined; the decoder must synthesize prev + prev[0]
    enc = lzw_encode([1, 1, 1], 2)
    assert list(lzw_decode(enc, 2)) == [1, 1, 1]
    assert _reference_lzw_decode(enc, 2) == [1, 1, 1]


def test_flush_tips_width_boundary_before_eoi():
    # [1,1,1,1,1] with mcs=2: the decoder's phantom add for the FINAL
    # flush code lands exactly on 1<<width, so EOI must be written one
    # bit wider than the last data code — the classic encoder
    # off-by-one (the width schedule is simulated decoder-side)
    enc = lzw_encode([1, 1, 1, 1, 1], 2)
    assert list(lzw_decode(enc, 2)) == [1, 1, 1, 1, 1]
    assert _reference_lzw_decode(enc, 2) == [1, 1, 1, 1, 1]


def test_single_pixel_stream():
    for mcs in (2, 8):
        enc = lzw_encode([0], mcs)
        assert list(lzw_decode(enc, mcs)) == [0]
        assert _reference_lzw_decode(enc, mcs) == [0]


# --- randomized cross-checks ----------------------------------------------


@pytest.mark.parametrize("mcs", [2, 3, 5, 8])
def test_lzw_roundtrip_against_independent_decoder(mcs):
    rng = random.Random(mcs * 1009)
    for n in (1, 2, 7, 63, 500):
        seq = [rng.randrange(1 << mcs) for _ in range(n)]
        enc = lzw_encode(seq, mcs)
        assert list(lzw_decode(enc, mcs)) == seq
        assert _reference_lzw_decode(enc, mcs) == seq


def test_lzw_table_reset_path():
    # 60k symbols over a 4-color palette exhausts the 4096-code space
    # several times: clear-code resets mid-stream on both coders
    rng = random.Random(42)
    seq = [rng.randrange(4) for _ in range(60_000)]
    enc = lzw_encode(seq, 2)
    assert list(lzw_decode(enc, 2)) == seq
    assert _reference_lzw_decode(enc, 2) == seq


@settings(max_examples=60, deadline=None)
@given(
    st.integers(2, 8).flatmap(
        lambda m: st.tuples(
            st.just(m),
            st.lists(st.integers(0, (1 << m) - 1), min_size=1, max_size=300),
        )
    )
)
def test_lzw_roundtrip_property(case):
    mcs, seq = case
    assert list(lzw_decode(lzw_encode(seq, mcs), mcs)) == seq


# --- container --------------------------------------------------------------


def test_pattern_gif_closed_form():
    for seed in (0, 1, 7, 11):
        w, h = 8 * (1 + seed % 3), 8 * (1 + seed % 2)
        px, palette = decode_gif(pattern_gif(seed, w, h))
        y = np.arange(h)[:, None]
        x = np.arange(w)[None, :]
        expect = ((seed * 31 + y * 7 + x * 13) % 256).astype(np.uint8)
        assert px.shape == (h, w)
        assert (px == expect).all()
        # grayscale palette: index i -> (i, i, i)
        assert palette.shape == (256, 3)
        assert (palette == np.arange(256, dtype=np.uint8)[:, None]).all()


_IMAGE_DESC_OFFSET = 13 + 256 * 3  # header+LSD, then the 768-byte GCT


def test_extensions_are_skipped():
    payload = bytearray(pattern_gif(3, 8, 8))
    # splice a graphic-control extension (0x21 0xF9, 4-byte block) and a
    # comment extension between the color table and the image descriptor
    idx = _IMAGE_DESC_OFFSET
    assert payload[idx] == 0x2C
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]) + bytes(
        [0x21, 0xFE, 5] + list(b"hello") + [0]
    )
    spliced = bytes(payload[:idx]) + ext + bytes(payload[idx:])
    px, _ = decode_gif(spliced)
    ref, _ = decode_gif(bytes(payload))
    assert (px == ref).all()


def test_malformed_payloads_raise_giferror():
    good = pattern_gif(1, 8, 8)
    cases = [
        b"",
        b"GIF89a",
        b"NOTAGIF" + b"\x00" * 30,
        good[:40],          # truncated in the color table
        good[:-5],          # truncated sub-blocks
        good[: _IMAGE_DESC_OFFSET + 4],  # truncated image descriptor
    ]
    for blob in cases:
        with pytest.raises(GifError):
            decode_gif(blob)


def test_interlace_flag_deinterlaces():
    """Since r8 the flag is honored, not rejected: flipping it on a
    sequential stream decodes the SAME pixels permuted by the 4-pass
    row order — proving the de-interlace path is a pure row gather."""
    from crawl_streams_spark.operators.gif import _interlace_order

    payload = bytearray(pattern_gif(2, 8, 8))
    idx = _IMAGE_DESC_OFFSET
    assert payload[idx] == 0x2C
    # descriptor = introducer, then 2+2+2+2 coords/dims, then packed
    payload[idx + 9] |= 0x40
    straight, _ = decode_gif(pattern_gif(2, 8, 8))
    bent, _ = decode_gif(bytes(payload))
    assert np.array_equal(bent[_interlace_order(8)], straight)


def test_encode_rejects_bad_shapes():
    with pytest.raises(GifError):
        encode_gif(np.zeros((0, 4), dtype=np.uint8))
    with pytest.raises(GifError):
        encode_gif(np.zeros((2, 2, 3), dtype=np.uint8))


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=120))
def test_garbage_never_crashes_uncontrolled(blob):
    try:
        decode_gif(blob)
    except GifError:
        pass  # the only permitted failure mode


def test_lzw_bomb_gate_fails_fast():
    """A stream decoding to far more symbols than the image declares
    must raise as soon as the declared budget is crossed — the
    decompression-bomb gate (code-review r6): never materialize the
    amplified output before the size check."""
    seq = [i % 4 for i in range(10_000)]
    enc = lzw_encode(seq, 2)
    with pytest.raises(GifError, match="exceeds declared"):
        lzw_decode(enc, 2, max_symbols=16)
    # exact-budget stream still decodes
    assert len(lzw_decode(enc, 2, max_symbols=10_000)) == 10_000


def test_declared_tiny_image_with_huge_stream_lands_in_error():
    # container-level: splice a 10k-symbol stream into a GIF declaring 2x2
    from crawl_streams_spark.operators.gif import _sub_blocks

    good = bytearray(pattern_gif(1, 8, 8))
    idx = _IMAGE_DESC_OFFSET
    # rewrite image descriptor + LSD dims to 2x2, keep the big stream
    import struct as _struct

    good[6:10] = _struct.pack("<HH", 2, 2)
    good[idx + 1 : idx + 9] = _struct.pack("<HHHH", 0, 0, 2, 2)
    with pytest.raises(GifError, match="exceeds declared"):
        decode_gif(bytes(good))


def test_truncation_sweep_never_uncontrolled():
    good = pattern_gif(5, 16, 16)
    for cut in range(0, len(good), 7):
        try:
            decode_gif(good[:cut])
        except GifError:
            pass


# --- Spark stage ------------------------------------------------------------


def test_decode_gif_features_stage(spark):
    import pandas as pd

    from crawl_streams_spark.operators.multimodal import decode_gif_features

    rows = [
        (0, bytearray(pattern_gif(0, 8, 8))),
        (1, bytearray(pattern_gif(1, 16, 8))),
        (2, bytearray(b"broken")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in decode_gif_features(df).collect()}
    assert got[0]["width"] == 8 and got[0]["height"] == 8
    assert got[0]["n_channels"] == 3 and got[0]["palette_size"] == 256
    y = np.arange(8)[:, None]
    x8 = np.arange(8)[None, :]
    s0 = int(((0 * 31 + y * 7 + x8 * 13) % 256).sum())
    assert got[0]["sum_rgb"] == 3 * s0
    assert got[0]["mean_sample"] == pytest.approx(s0 / 64)
    assert got[1]["width"] == 16
    assert got[2]["error"] is not None and got[2]["width"] is None
    assert got[3]["error"] == "null payload"


# ---------------------------------------------------------------------------
# 4-pass interlacing (r8)
# ---------------------------------------------------------------------------


def test_interlace_order_is_a_permutation():
    import numpy as np

    from crawl_streams_spark.operators.gif import _interlace_order

    for h in (1, 2, 3, 7, 8, 9, 16, 33):
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h)), h
    # the canonical 8-row example from the spec appendix
    assert _interlace_order(8).tolist() == [0, 4, 2, 6, 1, 3, 5, 7]


@pytest.mark.parametrize("h,w", [(1, 5), (2, 4), (8, 8), (9, 7), (33, 3)])
def test_interlaced_roundtrip(h, w):
    import numpy as np

    from crawl_streams_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    px, pal = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(px, img)
    # sequential path untouched
    px2, _ = decode_gif(encode_gif(img))
    assert np.array_equal(px2, img)
