"""G.711 µ-law/A-law expansion inside the WAV decoder
(multimodal._wav_decode_impl): the vectorized NumPy decode is pinned
against INDEPENDENT scalar routines transcribed from the CCITT G.711
spec (the classic Sun ulaw2linear/alaw2linear), plus the canonical
extreme/identity golden points. Cross-engine value gate:
plans/q_crawl.py::media_g711_features (closed-form integer expansion
replayed in SQL)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from crawl_streams_spark.operators.multimodal import (
    _wav_decode_impl,
    g711_wav_bytes,
)


def _ulaw2linear(u: int) -> int:
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2linear(a: int) -> int:
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_spec_routine_golden_points():
    # canonical G.711 landmarks
    assert _ulaw2linear(0x00) == -32124  # µ-law negative max
    assert _ulaw2linear(0x80) == 32124  # µ-law positive max
    assert _ulaw2linear(0xFF) == 0  # µ-law zero code
    assert _alaw2linear(0x55) == -8  # A-law smallest negative
    assert _alaw2linear(0xD5) == 8  # A-law smallest positive
    assert _alaw2linear(0x2A) == -32256  # A-law negative max
    assert _alaw2linear(0xAA) == 32256  # A-law positive max


@pytest.mark.parametrize("law,ref", [("ulaw", _ulaw2linear), ("alaw", _alaw2linear)])
def test_vectorized_expansion_matches_spec_all_256_codes(law, ref):
    """Every possible companded byte, both laws: the decoder's energy
    statistics must equal the spec routine's to the last bit."""
    decode = _wav_decode_impl()
    bts = np.arange(256, dtype=np.uint8)
    feats, err = decode(g711_wav_bytes(bts, law=law))
    assert err is None
    rate, n_ch, bits, n, dur, rms, peak, clip = feats
    xs = [ref(int(b)) for b in bts]
    assert (rate, n_ch, bits, n) == (8000, 1, 8, 256)
    assert rms == math.sqrt(sum(v * v for v in xs) / 256) / 32768.0
    assert peak == max(abs(v) for v in xs) / 32768.0
    assert clip == 0.0  # G.711 linear range never reaches the int16 rails


def test_unsupported_format_still_rejected():
    import struct

    decode = _wav_decode_impl()
    # format 2 (ADPCM) must be rejected, not misdecoded
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 2, 1, 8000, 8000, 1, 8)
    data = struct.pack("<4sI", b"data", 4) + b"\x01\x02\x03\x04"
    payload = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt
        + data
    )
    feats, err = decode(payload)
    assert feats is None and "unsupported format" in err


def test_pcm16_path_unchanged():
    from crawl_streams_spark.operators.multimodal import wav_bytes

    decode = _wav_decode_impl()
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    feats, err = decode(wav_bytes(samples, 16000))
    assert err is None
    rate, n_ch, bits, n, dur, rms, peak, clip = feats
    assert (rate, bits, n) == (16000, 16, 5)
    assert clip == 2 / 5
