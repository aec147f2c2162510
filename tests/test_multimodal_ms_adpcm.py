"""Microsoft ADPCM (WAV format 0x02) decode inside the WAV decoder
(multimodal._wav_decode_impl): pinned against an INDEPENDENT scalar
routine transcribed from the published WAV spec (second-order predictor
with the 7 coefficient pairs, trunc-toward-zero /256 scaling, adaptive
delta with the 16-entry table and the 16 floor), over every 4-bit code
from every predictor. Cross-engine value gate:
plans/q_crawl.py::media_ms_adpcm_features (recursive-CTE replay)."""

from __future__ import annotations

import math
import struct

import numpy as np

from crawl_streams_spark.operators.multimodal import (
    MS_ADPCM_ADAPT,
    MS_ADPCM_COEFFS,
    _wav_decode_impl,
    ms_adpcm_wav_bytes,
)

_COEFFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
           (460, -208), (392, -232)]
_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409,
          307, 230, 230, 230]


def _spec_decode(codes, pidx, idelta, s1, s2):
    """Scalar spec transcription: output starts with the two header seed
    samples (older first), then one sample per code."""
    c1, c2 = _COEFFS[pidx]
    out = [s2, s1]
    for code in codes:
        signed = code - 16 if code >= 8 else code
        num = s1 * c1 + s2 * c2
        pred = int(num / 256) if num >= 0 else -(-num // 256)  # trunc
        pred = max(-32768, min(32767, pred + signed * idelta))
        s2, s1 = s1, pred
        idelta = max(16, (_ADAPT[code] * idelta) // 256)
        out.append(pred)
    return out


def _features(samples):
    x = np.asarray(samples, dtype=np.int64)
    n = x.size
    rms = math.sqrt(int(np.sum(x * x)) / n) / 32768.0
    peak = int(np.max(np.abs(x))) / 32768.0
    clip = int(np.sum((x == 32767) | (x == -32768))) / n
    return n, rms, peak, clip


def test_tables_match_spec():
    assert list(MS_ADPCM_COEFFS) == _COEFFS
    assert list(MS_ADPCM_ADAPT) == _ADAPT


def test_decoder_matches_spec_all_codes_every_predictor():
    """Every 4-bit code under every one of the 7 predictors, from
    non-trivial seed samples (so both coefficient taps fire)."""
    decode = _wav_decode_impl()
    for pidx in range(7):
        codes = list(range(16))
        s1 = 1000 + pidx * 311
        s2 = -700 - pidx * 173
        idelta = 16 + pidx * 37
        feats, err = decode(
            ms_adpcm_wav_bytes(
                codes, predictor=pidx, idelta=idelta, sample1=s1, sample2=s2
            )
        )
        assert err is None, err
        rate, n_ch, bits, n_samples, dur, rms, peak, clip = feats
        want = _spec_decode(codes, pidx, idelta, s1, s2)
        wn, wrms, wpeak, wclip = _features(want)
        assert (rate, n_ch, bits) == (8000, 1, 4)
        assert n_samples == wn == 18
        assert rms == wrms and peak == wpeak and clip == wclip


def test_negative_predictor_sum_truncates_toward_zero():
    """The /256 scaling truncates toward zero, not floor — a negative
    predictor sum is the case where they differ (C semantics)."""
    decode = _wav_decode_impl()
    # s1*c1 + s2*c2 = -1000*512 + 3*-256 < 0 and not divisible by 256
    codes = [0, 0]
    feats, err = decode(
        ms_adpcm_wav_bytes(codes, predictor=1, idelta=16, sample1=-1001,
                           sample2=3)
    )
    assert err is None
    want = _spec_decode(codes, 1, 16, -1001, 3)
    num = -1001 * 512 + 3 * (-256)
    assert want[2] == max(-32768, min(32767, -((-num) // 256)))
    wn, wrms, wpeak, wclip = _features(want)
    assert feats[5] == wrms and feats[6] == wpeak


def test_delta_floor_and_rail_clamp():
    """Small-magnitude codes shrink idelta to the 16 floor; large codes
    from a big delta drive the predictor into the rails and clamp."""
    decode = _wav_decode_impl()
    codes = [8] * 16  # signed -8, max adaptation entry 768
    feats, err = decode(
        ms_adpcm_wav_bytes(codes, predictor=0, idelta=8000, sample1=-30000,
                           sample2=-30000)
    )
    assert err is None
    want = _spec_decode(codes, 0, 8000, -30000, -30000)
    assert min(want) == -32768  # clamped at the rail
    assert feats[7] == _features(want)[3] > 0  # clip_fraction live
    # delta floor: all-zero codes collapse idelta to 16 and keep it there
    want2 = _spec_decode([0] * 8, 2, 17, 5, 5)
    assert want2[-1] == want2[-2]  # coeff (0,0): pure delta, signed 0


def test_multi_block_and_malformed():
    decode = _wav_decode_impl()
    b1 = struct.pack("<Bhhh", 0, 16, 100, 50) + bytes([0x12, 0x34])
    b2 = struct.pack("<Bhhh", 3, 40, -100, -50) + bytes([0x56, 0x78])
    block_align = len(b1)
    ext = struct.pack("<HH", 6, 7) + b"".join(
        struct.pack("<hh", a, b) for a, b in _COEFFS
    )
    fmt = struct.pack(
        "<4sIHHIIHHH", b"fmt ", 18 + len(ext), 2, 1, 8000, 8000,
        block_align, 4, len(ext),
    ) + ext
    payload = b1 + b2 + b"\x01"  # torn third block
    data = struct.pack("<4sI", b"data", len(payload)) + payload
    wav = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt + data
    )
    feats, err = decode(wav)
    assert err is None
    assert feats[3] == 12  # 2 blocks x (2 seeds + 4 codes), tail dropped
    want = _spec_decode([1, 2, 3, 4], 0, 16, 100, 50) + _spec_decode(
        [5, 6, 7, 8], 3, 40, -100, -50
    )
    assert feats[5] == _features(want)[1]
    # predictor index out of range
    bad = bytearray(ms_adpcm_wav_bytes([0, 0]))
    off = len(bad) - 8 - 1  # data chunk: 7-byte header + 1 code byte
    bad[off - 0] = 0  # no-op guard; locate header start precisely below
    hdr = len(bad) - 8
    bad[hdr] = 7
    feats, err = decode(bytes(bad))
    assert feats is None and "predictor" in err
    # nonpositive initial delta
    bad2 = bytearray(ms_adpcm_wav_bytes([0, 0]))
    struct.pack_into("<h", bad2, hdr + 1, 0)
    feats, err = decode(bytes(bad2))
    assert feats is None and "delta" in err


# ---------------------------------------------------------------- stereo
def _ref_ms(codes, pidx, idelta, s1, s2):
    from crawl_streams_spark.operators.multimodal import (
        MS_ADPCM_ADAPT,
        MS_ADPCM_COEFFS,
    )

    c1, c2 = MS_ADPCM_COEFFS[pidx]
    out = [s2, s1]
    for code in codes:
        signed = code - 16 if code >= 8 else code
        num = s1 * c1 + s2 * c2
        pred = abs(num) // 256 if num >= 0 else -(abs(num) // 256)
        pred += signed * idelta
        pred = max(-32768, min(32767, pred))
        s2, s1 = s1, pred
        idelta = max(16, (MS_ADPCM_ADAPT[code] * idelta) // 256)
        out.append(pred)
    return out


_SMALL = (0, 1, 2, 3, 13, 14, 15)


def test_stereo_ms_matches_independent_per_channel_recurrences():
    """Stereo MS blocks interleave header fields by channel and data
    nibbles PER SAMPLE (high=L, low=R) — the decoded interleaved stream
    must equal the two mono recurrences zipped; every per-channel
    parameter differs so a layout mistake cannot cancel."""
    import math

    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ms_adpcm_stereo_wav_bytes,
    )

    decode = _wav_decode_impl()
    cl = [8 if k % 16 == 3 else _SMALL[(11 + k * 5) % 7] for k in range(32)]
    cr = [8 if k % 16 == 9 else _SMALL[(7 + k * 3) % 7] for k in range(32)]
    feats, err = decode(
        ms_adpcm_stereo_wav_bytes(
            cl, cr, predictor_l=1, predictor_r=4,
            idelta_l=20, idelta_r=33,
            s1_l=100, s2_l=-50, s1_r=-300, s2_r=70,
        )
    )
    assert err is None
    assert (feats[1], feats[3]) == (2, 34)
    inter = [
        v
        for p in zip(
            _ref_ms(cl, 1, 20, 100, -50), _ref_ms(cr, 4, 33, -300, 70)
        )
        for v in p
    ]
    assert feats[5] == math.sqrt(
        sum(v * v for v in inter) / len(inter)
    ) / 32768.0
    assert feats[6] == max(abs(v) for v in inter) / 32768.0


def test_stereo_ms_per_channel_rejections():
    """A bad predictor or delta in EITHER channel's header slot rejects
    — proving the per-channel header offsets are actually read."""
    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ms_adpcm_stereo_wav_bytes,
    )

    decode = _wav_decode_impl()
    feats, err = decode(
        ms_adpcm_stereo_wav_bytes([0] * 4, [0] * 4, predictor_r=4,
                                  idelta_r=0)
    )
    assert feats is None and "bad initial delta" in err
    good = bytearray(
        ms_adpcm_stereo_wav_bytes([0] * 4, [0] * 4, predictor_r=4)
    )
    # bPredictor[1] is the second byte of the block (after 'data' size)
    doff = good.index(b"data") + 8
    good[doff + 1] = 9  # out-of-range predictor for the RIGHT channel
    feats, err = decode(bytes(good))
    assert feats is None and "predictor 9 out of range" in err
