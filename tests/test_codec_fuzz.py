"""Property-based roundtrips for the round-8 codecs: ANY int16 signal
(FLAC, lossless) / ANY code stream + seed state (the two ADPCMs,
decoder-defined) must survive encode→decode bit-exactly. Hypothesis
explores the corners the hand-written vectors miss (rails, zero-length
nibble runs, short blocks, extreme rice parameters)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_streams_spark.operators.flac import decode_flac, encode_flac
from crawl_streams_spark.operators.multimodal import (
    _wav_decode_impl,
    ima_adpcm_wav_bytes,
    ms_adpcm_wav_bytes,
)

_decode = _wav_decode_impl()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=14),
)
def test_flac_roundtrip_any_signal(samples, order, rice_param):
    if len(samples) < order:
        samples = samples + [0] * order
    meta, dec = decode_flac(
        encode_flac(samples, order=order, rice_param=rice_param,
                    block_size=128)
    )
    assert meta[1:3] == (1, 16)
    assert np.array_equal(dec, np.asarray(samples, dtype=np.int64))


def _spec_ima(codes, pred0, idx0):
    steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ]
    itab = [-1, -1, -1, -1, 2, 4, 6, 8]
    out, pred, idx = [pred0], pred0, idx0
    for c in codes:
        s = steps[idx]
        d = s >> 3
        if c & 1:
            d += s >> 2
        if c & 2:
            d += s >> 1
        if c & 4:
            d += s
        pred = pred - d if c & 8 else pred + d
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + itab[c & 7]))
        out.append(pred)
    return out


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=2,
             max_size=64).map(lambda c: c if len(c) % 2 == 0 else c[:-1]),
    st.integers(min_value=-32768, max_value=32767),
    st.integers(min_value=0, max_value=88),
)
def test_ima_adpcm_energy_matches_spec(codes, pred0, idx0):
    feats, err = _decode(ima_adpcm_wav_bytes(codes, pred0=pred0, idx0=idx0))
    assert err is None, err
    want = np.asarray(_spec_ima(codes, pred0, idx0), dtype=np.int64)
    n = want.size
    import math

    assert feats[3] == n
    assert feats[5] == math.sqrt(int(np.sum(want * want)) / n) / 32768.0
    assert feats[6] == int(np.max(np.abs(want))) / 32768.0


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=2,
             max_size=64).map(lambda c: c if len(c) % 2 == 0 else c[:-1]),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=32767),
    st.integers(min_value=-32768, max_value=32767),
    st.integers(min_value=-32768, max_value=32767),
)
def test_ms_adpcm_decode_is_total_and_bounded(codes, pidx, idelta, s1, s2):
    """Every legal header decodes without error and every output sample
    is clamped into int16 — the recurrence can never escape the rails
    regardless of how adversarial the seed state is."""
    feats, err = _decode(
        ms_adpcm_wav_bytes(
            codes, predictor=pidx, idelta=idelta, sample1=s1, sample2=s2
        )
    )
    assert err is None, err
    assert feats[3] == len(codes) + 2
    assert 0.0 <= feats[6] <= 1.0  # peak normalized by 32768


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=5,
        max_size=300,
    ),
    st.lists(st.integers(min_value=-2048, max_value=2047), min_size=1,
             max_size=8),
    st.integers(min_value=0, max_value=15),
)
def test_flac_lpc_roundtrip_any_signal_any_filter(samples, coeffs, shift):
    """LPC subframes round-trip ANY signal under ANY quantized filter —
    even unstable ones: the encoder's residuals are defined by the same
    shift-scaled predictor the decoder replays, so stability is
    irrelevant to losslessness."""
    if len(samples) < len(coeffs):
        samples = samples + [0] * len(coeffs)
    enc = encode_flac(
        samples, subframe="lpc", lpc_coeffs=coeffs, lpc_shift=shift,
        lpc_precision=12, rice_param=12, block_size=128,
    )
    _, dec = decode_flac(enc)
    assert np.array_equal(dec, np.asarray(samples, dtype=np.int64))
