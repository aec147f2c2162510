"""Decoder totality: every pure-Python codec must map ARBITRARY bytes to
either a successful decode or ITS OWN error type — never IndexError,
struct.error, zlib.error, or friends. This is a production contract,
not hygiene: the mapInPandas stages catch exactly the codec's error
class per row, so any other exception type would kill the whole Spark
stage instead of quarantining one bad blob.

Three adversarial generators: raw garbage, a valid payload prefix
(truncation at every depth of the parse), and a valid payload with one
mutated byte (field-level corruption past the magic checks)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.operators.bmp import BmpError, decode_bmp, pattern_bmp
from crawl_streams_spark.operators.flac import FlacError, decode_flac, encode_flac
from crawl_streams_spark.operators.gif import GifError, decode_gif, pattern_gif
from crawl_streams_spark.operators.multimodal import (
    _wav_decode_impl,
    ima_adpcm_stereo_wav_bytes,
    ima_adpcm_wav_bytes,
    ms_adpcm_stereo_wav_bytes,
    ms_adpcm_wav_bytes,
    wav_bytes,
)
from crawl_streams_spark.operators.png import (
    PngError,
    decode_png,
    pattern_png,
    pattern_png16,
)
from crawl_streams_spark.operators.qoi import QoiError, decode_qoi, pattern_qoi
from crawl_streams_spark.operators.tiff import (
    TiffError,
    decode_tiff,
    pattern_tiff,
    pattern_tiff_lzw,
)
from crawl_streams_spark.sources.warc import (
    WarcError,
    iter_warc_records,
    warc_record_bytes,
)

_wav_decode = _wav_decode_impl()


def _wav_total(payload: bytes):
    # decode_wav's contract is (feats, err) with errors as STRINGS —
    # raising anything at all is the violation
    feats, err = _wav_decode(payload)
    assert (feats is None) != (err is None) or feats is not None


_CODECS = [
    ("bmp", decode_bmp, BmpError, lambda: pattern_bmp(3, 9, 5, bits=24)),
    ("png", decode_png, PngError, lambda: pattern_png(3, 9, 5)),
    ("png16", decode_png, PngError, lambda: pattern_png16(3, 9, 5)),
    ("gif", decode_gif, GifError, lambda: pattern_gif(3, 8, 8)),
    ("qoi", decode_qoi, QoiError, lambda: pattern_qoi(3, 9, 5)),
    ("tiff", decode_tiff, TiffError, lambda: pattern_tiff(3, 9, 5)),
    ("tiff_pb", decode_tiff, TiffError, lambda: pattern_tiff(5, 9, 6)),
    ("tiff_lzw", decode_tiff, TiffError, lambda: pattern_tiff_lzw(5, 9, 6)),
    (
        "flac",
        decode_flac,
        FlacError,
        lambda: encode_flac(np.arange(64), order=2),
    ),
]


@pytest.mark.parametrize("name,dec,err,mk", _CODECS, ids=[c[0] for c in _CODECS])
@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_decoders_are_total(name, dec, err, mk, data):
    mode = data.draw(st.sampled_from(["garbage", "truncate", "mutate"]))
    good = mk()
    if mode == "garbage":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    elif mode == "truncate":
        blob = good[: data.draw(st.integers(0, len(good)))]
    else:
        i = data.draw(st.integers(0, len(good) - 1))
        b = data.draw(st.integers(0, 255))
        blob = good[:i] + bytes([b]) + good[i + 1 :]
    try:
        dec(blob)
    except err:
        pass  # the contract: the codec's own error type only


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_wav_decoder_never_raises(data):
    mode = data.draw(st.sampled_from(["garbage", "truncate", "mutate"]))
    kind = data.draw(
        st.sampled_from(["pcm", "ima", "ima_st", "ms", "ms_st"])
    )
    if kind == "pcm":
        good = wav_bytes(np.arange(-50, 50, dtype=np.int16))
    elif kind == "ima":
        good = ima_adpcm_wav_bytes(list(range(16)), pred0=10, idx0=5)
    elif kind == "ima_st":
        good = ima_adpcm_stereo_wav_bytes(
            list(range(16)), list(range(15, -1, -1)), pred_l=10, idx_l=5
        )
    elif kind == "ms":
        good = ms_adpcm_wav_bytes(list(range(16)), predictor=1, idelta=20,
                                  sample1=5, sample2=-5)
    else:
        good = ms_adpcm_stereo_wav_bytes(
            list(range(16)), list(range(15, -1, -1)),
            predictor_l=1, predictor_r=4, idelta_l=20, idelta_r=25,
        )
    if mode == "garbage":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    elif mode == "truncate":
        blob = good[: data.draw(st.integers(0, len(good)))]
    else:
        i = data.draw(st.integers(0, len(good) - 1))
        blob = good[:i] + bytes([data.draw(st.integers(0, 255))]) + good[i + 1 :]
    _wav_total(blob)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_warc_parser_is_total(data):
    import io

    mode = data.draw(st.sampled_from(["garbage", "truncate", "mutate"]))
    good = warc_record_bytes("response", b"HTTP/1.1 200\r\n\r\nok",
                             target_uri="https://x.example/")
    if mode == "garbage":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    elif mode == "truncate":
        blob = good[: data.draw(st.integers(0, len(good)))]
    else:
        i = data.draw(st.integers(0, len(good) - 1))
        blob = good[:i] + bytes([data.draw(st.integers(0, 255))]) + good[i + 1 :]
    try:
        list(iter_warc_records(io.BufferedReader(io.BytesIO(blob))))
    except WarcError:
        pass


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_jpeg_decoder_is_total(data):
    from crawl_streams_spark.operators.jpeg import (
        JpegError,
        decode_jpeg,
        gray_jpeg,
    )

    mode = data.draw(st.sampled_from(["garbage", "truncate", "mutate"]))
    good = gray_jpeg(16, 8, 128)
    if mode == "garbage":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    elif mode == "truncate":
        blob = good[: data.draw(st.integers(0, len(good)))]
    else:
        i = data.draw(st.integers(0, len(good) - 1))
        blob = good[:i] + bytes([data.draw(st.integers(0, 255))]) + good[i + 1 :]
    try:
        decode_jpeg(blob)
    except JpegError:
        pass


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_ppm_parser_is_total(data):
    from crawl_streams_spark.operators.multimodal import (
        _ppm_parse_impl,
        ppm_bytes,
    )

    parse = _ppm_parse_impl()
    mode = data.draw(st.sampled_from(["garbage", "truncate", "mutate"]))
    good = ppm_bytes(np.arange(60, dtype=np.uint8).reshape(4, 5, 3))
    if mode == "garbage":
        blob = data.draw(st.binary(min_size=0, max_size=200))
    elif mode == "truncate":
        blob = good[: data.draw(st.integers(0, len(good)))]
    else:
        i = data.draw(st.integers(0, len(good) - 1))
        blob = good[:i] + bytes([data.draw(st.integers(0, 255))]) + good[i + 1 :]
    # the PPM parser returns (result, err) tuples — raising is the bug
    arr, err = parse(blob)
    assert (arr is None) != (err is None)
