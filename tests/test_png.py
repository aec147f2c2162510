"""Pure-NumPy PNG codec (operators/png.py) and its Spark decode stage
(multimodal.decode_png_features). Decoder correctness is pinned against
an INDEPENDENT scalar unfilter written straight from the RFC 2083
pseudocode (never against the decoder's own inverse alone), plus
closed-form pattern fixtures and spec-level error paths (chunk CRCs,
Adam7 gate, truncation). Cross-engine value gate:
plans/q_crawl.py::media_png_features (lossless pixel-exact SQL oracle).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from crawl_streams_spark.operators.png import (
    PngError,
    decode_png,
    encode_png,
    pattern_png,
)
from crawl_streams_spark.operators.png import _SIGNATURE, _chunk


def _reference_unfilter(raw: bytes, height: int, width: int, bpp: int):
    """Scalar unfilter transcribed from RFC 2083 section 6 pseudocode —
    deliberately naive (per-byte ints, no NumPy) so a vectorization bug
    in the decoder cannot hide."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = width * bpp
    out = []
    prior = [0] * stride
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = list(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        recon = [0] * stride
        for i in range(stride):
            left = recon[i - bpp] if i >= bpp else 0
            upleft = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] + left
            elif ftype == 2:
                v = line[i] + prior[i]
            elif ftype == 3:
                v = line[i] + (left + prior[i]) // 2
            else:
                v = line[i] + paeth(left, prior[i], upleft)
            recon[i] = v % 256
        out.append(recon)
        prior = recon
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(11, 13), (7, 9, 3), (5, 6, 4), (3, 4, 2)])
def test_decoder_matches_independent_reference_unfilter(shape):
    rng = np.random.default_rng(20260814)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    blob = encode_png(a)  # y % 5 cycle: every filter type exercised
    # pull the raw filtered bytes back out of the container
    idat = b""
    pos = 8
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    h = shape[0]
    w = shape[1]
    bpp = 1 if len(shape) == 2 else shape[2]
    ref = _reference_unfilter(zlib.decompress(idat), h, w, bpp)
    got = decode_png(blob)
    assert (got.reshape(h, w * bpp) == ref).all()
    assert (got == a).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ftype):
    rng = np.random.default_rng(ftype)
    for shape in [(1, 1), (2, 3), (16, 24), (9, 5, 3), (4, 7, 4)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(encode_png(a, filters=ftype)) == a).all()


def test_pattern_png_closed_form():
    seed, w, h = 42, 24, 16
    px = decode_png(pattern_png(seed, w, h))
    y, x = np.mgrid[0:h, 0:w]
    assert (px == (seed * 31 + y * 7 + x * 13) % 256).all()


def test_palette_expansion():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 5, size=(6, 7), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    body = bytearray()
    for y in range(6):
        body.append(0)
        body.extend(idx[y].tobytes())
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(blob) == pal[idx]).all()


def test_multiple_idat_chunks_concatenate():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_png(a, filters=0)
    # split the single IDAT into two chunks at an arbitrary byte
    pos = 8
    parts = []
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        parts.append((ctype, data))
        pos += 12 + length
    rebuilt = _SIGNATURE
    for ctype, data in parts:
        if ctype == b"IDAT":
            rebuilt += _chunk(b"IDAT", data[:3]) + _chunk(b"IDAT", data[3:])
        else:
            rebuilt += _chunk(ctype, data)
    assert (decode_png(rebuilt) == a).all()


def test_crc_tamper_detected():
    blob = bytearray(pattern_png(1, 8, 8))
    blob[50] ^= 0xFF
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(blob))


def test_bit_depth_and_interlace_method_gates():
    # 16-bit is SUPPORTED since r9; sub-byte depths reject
    ihdr4 = struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0)
    blob4 = _SIGNATURE + _chunk(b"IHDR", ihdr4) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="bit depth"):
        decode_png(blob4)
    # 16-bit palette is illegal PNG
    ihdr16p = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    blob16p = _SIGNATURE + _chunk(b"IHDR", ihdr16p) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="16-bit palette"):
        decode_png(blob16p)
    # Adam7 is SUPPORTED since r8; only unknown interlace methods reject
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 2)
    blob_i = _SIGNATURE + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="interlace method"):
        decode_png(blob_i)


def test_malformed_payloads_raise():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(PngError, match="truncated"):
        decode_png(pattern_png(1, 8, 8)[:-6])
    # size mismatch: deflated body one row short
    body = bytes([0] * (1 + 8)) * 7
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(blob)


def test_decode_png_features_stage(spark):
    """Spark-side stage: good + malformed payloads in one batch; exact
    integer statistics; per-row quarantine."""
    from crawl_streams_spark.operators.multimodal import decode_png_features

    good = pattern_png(7, 16, 8)
    bad = b"\x89PNG\r\n\x1a\ngarbage"
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, None)],
        "media_id bigint, payload binary",
    )
    rows = {r.media_id: r for r in decode_png_features(df).collect()}
    y, x = np.mgrid[0:8, 0:16]
    img = (7 * 31 + y * 7 + x * 13) % 256
    r1 = rows[1]
    assert (r1.width, r1.height, r1.n_channels, r1.bit_depth) == (16, 8, 1, 8)
    assert r1.sum_luma == int(img.sum())
    assert r1.mean_luma == img.sum() / img.size
    assert (r1.min_luma, r1.max_luma) == (int(img.min()), int(img.max()))
    assert r1.error is None
    assert rows[2].error is not None and rows[2].width is None
    assert rows[3].error == "null payload"


# ---------------------------------------------------------------------------
# Property tests (pure codec, no Spark)

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    nc = draw(st.sampled_from([1, 2, 3, 4]))
    data = draw(
        st.binary(min_size=h * w * nc, max_size=h * w * nc)
    )
    arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape((h, w) if nc == 1 else (h, w, nc))


@given(_images(), st.one_of(st.none(), st.integers(0, 4)))
@settings(max_examples=120, deadline=None)
def test_roundtrip_property(img, ftype):
    assert (decode_png(encode_png(img, filters=ftype)) == img).all()


@given(_images(), st.data())
@settings(max_examples=120, deadline=None)
def test_roundtrip_per_row_filter_mix(img, data):
    filters = data.draw(
        st.lists(
            st.integers(0, 4), min_size=img.shape[0], max_size=img.shape[0]
        )
    )
    assert (decode_png(encode_png(img, filters=filters)) == img).all()


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_garbage_never_crashes_uncontrolled(blob):
    """Arbitrary bytes either decode (they won't) or raise PngError —
    never an uncontrolled exception; the Spark stage's per-row
    quarantine depends on this."""
    try:
        decode_png(_SIGNATURE + blob)
    except PngError:
        pass


def test_malformed_chunk_lengths_raise_pngerror_not_struct_error():
    """IHDR/PLTE with wrong byte lengths must raise PngError (so the
    Spark stage quarantines the row) — not struct.error / ValueError."""
    bad_ihdr = _SIGNATURE + _chunk(b"IHDR", b"\x00" * 12) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="IHDR length"):
        decode_png(bad_ihdr)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad_plte = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x01\x02")  # not a multiple of 3
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="PLTE length"):
        decode_png(bad_plte)


def test_inflate_bomb_is_bounded():
    """An IDAT that inflates far past the declared dimensions must fail
    with a controlled error and never materialize the expansion."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # expects 6 bytes
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~48 KB compressed
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(blob)


# ---------------------------------------------------------------------------
# Adam7 interlacing (r8)
# ---------------------------------------------------------------------------


def test_adam7_passes_tile_exactly_once():
    """The 7 pass grids partition the 8x8 block — every pixel claimed by
    exactly one pass (the spec's interlace matrix)."""
    import numpy as np

    from crawl_streams_spark.operators.png import _ADAM7

    grid = np.zeros((8, 8), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        grid[y0::dy, x0::dx] += 1
    assert (grid == 1).all()


@pytest.mark.parametrize(
    "shape", [(9, 7), (1, 1), (2, 3), (16, 16), (5, 13, 3), (11, 4, 4),
              (7, 1), (1, 9)]
)
def test_adam7_roundtrip(shape):
    """Interlaced roundtrips across gray/RGB/RGBA and odd sizes that
    produce EMPTY passes (which contribute no scanlines at all)."""
    import numpy as np

    rng = np.random.RandomState(sum(shape))
    a = rng.randint(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(a, interlace=True)), a)


def test_adam7_size_accounting_is_strict():
    """A truncated interlaced stream must be rejected by the expected-
    size check (empty passes excluded from the accounting)."""
    import struct
    import zlib

    import numpy as np

    from crawl_streams_spark.operators.png import _chunk

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = encode_png(a, interlace=True)
    # re-deflate a shortened body under the same header
    idat_start = enc.index(b"IDAT") - 4
    idat_len = struct.unpack(">I", enc[idat_start : idat_start + 4])[0]
    body = zlib.decompress(
        enc[idat_start + 8 : idat_start + 8 + idat_len]
    )
    short = (
        enc[:idat_start]
        + _chunk(b"IDAT", zlib.compress(body[:-3]))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(short)


# ------------------------------------------------------------- 16-bit (r9)
def test_png16_roundtrips_all_filters_and_interlace():
    """16-bit samples are two big-endian bytes; the filters run
    BYTEWISE at bpp = 2·channels (RFC 2083 §6.2). Roundtrips over
    random gray/RGB/RGBA data, sequential and Adam7, default y%5
    filter cycle — any bpp slip corrupts the sample reassembly."""
    import numpy as np

    rng = np.random.RandomState(5)
    for mk in (
        lambda: rng.randint(0, 65536, (11, 7), dtype=np.uint16),
        lambda: rng.randint(0, 65536, (9, 5, 3), dtype=np.uint16),
        lambda: rng.randint(0, 65536, (6, 4, 4), dtype=np.uint16),
    ):
        a = mk()
        for interlace in (False, True):
            out = decode_png(encode_png(a, interlace=interlace))
            assert out.dtype == np.uint16
            assert (out == a).all()


def test_png16_big_endian_sample_order_pinned():
    """A single 16-bit pixel 0x0102 must store bytes 01 02 (network
    order) in the filtered scanline — pinned by decoding a hand-built
    stream, independent of the encoder."""
    import zlib as _zlib

    import numpy as np

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    raw = b"\x00\x01\x02"  # filter None + big-endian 0x0102
    blob = (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert out.dtype == np.uint16 and out.shape == (1, 1)
    assert int(out[0, 0]) == 0x0102


def test_png16_pattern_gate_fixture():
    import numpy as np

    from crawl_streams_spark.operators.png import pattern_png16

    for seed in range(4):
        out = decode_png(pattern_png16(seed, 7, 5))
        y = np.arange(5, dtype=np.int64)[:, None]
        x = np.arange(7, dtype=np.int64)[None, :]
        v = (seed * 4099 + y * 709 + x * 1303) % 65536
        if seed % 2 == 0:
            assert out.shape == (5, 7) and (out == v).all()
        else:
            assert out.shape == (5, 7, 3)
            assert (out == v[:, :, None]).all()
