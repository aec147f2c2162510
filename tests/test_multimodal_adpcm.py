"""IMA/DVI ADPCM (WAV format 0x11) decode inside the WAV decoder
(multimodal._wav_decode_impl): the block decoder is pinned against an
INDEPENDENT scalar routine transcribed from the published IMA spec
(step/index tables + the shift-add diff reconstruction), exercised over
every 4-bit code from every step index. Cross-engine value gate:
plans/q_crawl.py::media_adpcm_features (the same recurrence replayed as
a recursive CTE in SQL)."""

from __future__ import annotations

import math
import struct

import numpy as np

from crawl_streams_spark.operators.multimodal import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    _wav_decode_impl,
    ima_adpcm_wav_bytes,
)

# -- independent spec transcription (scalar, straight from the IMA text) --

_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _spec_step(pred: int, idx: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step, scalar spec form: reconstruct
    diff = (step/8) + (b0 ? step/4) + (b1 ? step/2) + (b2 ? step),
    apply the sign bit b3, clamp sample and index."""
    step = _STEPS[idx]
    diff = step >> 3
    if code & 0x1:
        diff += step >> 2
    if code & 0x2:
        diff += step >> 1
    if code & 0x4:
        diff += step
    pred = pred - diff if code & 0x8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _INDEX[code & 0x7]))
    return pred, idx


def _spec_decode(codes, pred0: int, idx0: int) -> list[int]:
    out = [pred0]
    pred, idx = pred0, idx0
    for c in codes:
        pred, idx = _spec_step(pred, idx, c)
        out.append(pred)
    return out


def test_tables_match_spec():
    assert list(IMA_STEP_TABLE) == _STEPS
    assert len(IMA_STEP_TABLE) == 89
    assert list(IMA_INDEX_TABLE) == _INDEX


def _features_from_samples(samples):
    x = np.asarray(samples, dtype=np.int64)
    n = x.size
    rms = math.sqrt(int(np.sum(x * x)) / n) / 32768.0
    peak = int(np.max(np.abs(x))) / 32768.0
    clip = int(np.sum((x == 32767) | (x == -32768))) / n
    return n, rms, peak, clip


def test_decoder_matches_spec_all_codes_from_every_step_index():
    """Every 4-bit code from every step index: one block per index whose
    16 codes sweep 0..15, decoded by the production path and compared
    against the independent scalar transcription via the exact energy
    statistics."""
    decode = _wav_decode_impl()
    for idx0 in range(89):
        codes = list(range(16))
        pred0 = (idx0 * 257) % 1024 - 512
        feats, err = decode(ima_adpcm_wav_bytes(codes, pred0=pred0, idx0=idx0))
        assert err is None, err
        rate, n_ch, bits, n_samples, dur, rms, peak, clip = feats
        want = _spec_decode(codes, pred0, idx0)
        wn, wrms, wpeak, wclip = _features_from_samples(want)
        assert (rate, n_ch, bits) == (8000, 1, 4)
        assert n_samples == wn == 17
        assert rms == wrms and peak == wpeak and clip == wclip


def test_decoder_clamps_at_rails_and_counts_clip():
    """Driving the predictor into the int16 rails must clamp (not wrap)
    and register in clip_fraction."""
    decode = _wav_decode_impl()
    # start at max predictor, push up with large positive codes
    codes = [7] * 16  # +diff, biggest magnitude bits, sign 0
    feats, err = decode(ima_adpcm_wav_bytes(codes, pred0=32000, idx0=88))
    assert err is None
    *_, rms, peak, clip = feats
    assert peak == 32767 / 32768.0
    assert clip > 0
    want = _spec_decode(codes, 32000, 88)
    assert max(want) == 32767  # the spec routine clamps identically


def test_multi_block_streams_and_truncated_tail():
    """Blocks decode independently (each reseeds predictor/index from its
    own header); a trailing partial block is ignored, mirroring the PCM16
    truncation rule."""
    decode = _wav_decode_impl()
    one = ima_adpcm_wav_bytes(list(range(16)), pred0=100, idx0=20)
    # two blocks: duplicate the data chunk's block twice
    import struct as _s

    # rebuild manually: 2 blocks with different headers
    b1 = _s.pack("<hBB", 100, 20, 0) + bytes(
        (i & 0xF) | (((i + 1) & 0xF) << 4) for i in range(0, 16, 2)
    )
    b2 = _s.pack("<hBB", -200, 40, 0) + bytes(
        (i & 0xF) | (((i + 1) & 0xF) << 4) for i in range(0, 16, 2)
    )
    block_align = len(b1)
    fmt = _s.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, 0x11, 1, 8000, 8000, block_align, 4,
        2, 17,
    )
    payload = b1 + b2 + b"\x01\x02"  # torn third block
    data = _s.pack("<4sI", b"data", len(payload)) + payload
    wav = _s.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data
    feats, err = decode(wav)
    assert err is None
    n_samples = feats[3]
    assert n_samples == 34  # 2 complete blocks × 17, tail dropped
    want = _spec_decode([0, 1, 2, 3, 4, 5, 6, 7], 100, 20)
    # spot-check: block 1's samples are the spec decode of codes 0..7
    # low-nibble-first packing of range(0,16,2) interleaves (i, i+1)
    codes1 = []
    for i in range(0, 16, 2):
        codes1 += [i & 0xF, (i + 1) & 0xF]
    want1 = _spec_decode(codes1, 100, 20)
    want2 = _spec_decode(codes1, -200, 40)
    wn, wrms, wpeak, wclip = _features_from_samples(want1 + want2)
    assert feats[5] == wrms and feats[6] == wpeak


def test_malformed_adpcm_rejected():
    decode = _wav_decode_impl()
    good = ima_adpcm_wav_bytes([0, 1], pred0=0, idx0=0)
    # step index out of range
    bad = bytearray(good)
    # data chunk starts after RIFF(12) + fmt(8+20): header at 12+28+8
    off = 12 + 28 + 8
    bad[off + 2] = 90
    feats, err = decode(bytes(bad))
    assert feats is None and "out of range" in err
    # block_align too small
    bad2 = bytearray(good)
    struct.pack_into("<H", bad2, 12 + 8 + 12, 4)
    feats, err = decode(bytes(bad2))
    assert feats is None and "block align" in err


# ---------------------------------------------------------------------------
# Round-8 additions to the PCM family: 8-bit unsigned, 24-bit, float32
# ---------------------------------------------------------------------------


def _wav(raw: bytes, fmt_code: int, bits: int, rate: int = 8000,
         n_ch: int = 1) -> bytes:
    block = n_ch * max(bits // 8, 1)
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, fmt_code, n_ch, rate,
        rate * block, block, bits,
    )
    data = struct.pack("<4sI", b"data", len(raw)) + raw
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt + data
    )


def test_pcm8_unsigned_bias_and_scale():
    decode = _wav_decode_impl()
    # 0 -> -32768 (rail), 128 -> 0, 255 -> +32512
    feats, err = decode(_wav(bytes([0, 128, 255]), 1, 8))
    assert err is None
    rate, n_ch, bits, n, dur, rms, peak, clip = feats
    assert (bits, n) == (8, 3)
    want = np.array([-32768, 0, 32512], dtype=np.int64)
    assert peak == 32768 / 32768.0
    assert rms == math.sqrt(int(np.sum(want * want)) / 3) / 32768.0
    assert clip == 1 / 3  # the biased zero byte IS the negative rail


def test_pcm24_sign_extension_and_scaling():
    decode = _wav_decode_impl()
    vals24 = [0x000001, 0x7FFFFF, 0x800000, 0xFFFFFF]  # +1, max, min, -1
    raw = b"".join(v.to_bytes(3, "little") for v in vals24)
    feats, err = decode(_wav(raw, 1, 24))
    assert err is None
    want = np.array([1, 0x7FFFFF, -0x800000, -1], dtype=np.int64) >> 8
    assert feats[2] == 24 and feats[3] == 4
    assert feats[6] == int(np.max(np.abs(want))) / 32768.0


def test_float32_pcm_clamps_and_scales():
    decode = _wav_decode_impl()
    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.5, -3.0], dtype="<f4")
    feats, err = decode(_wav(f.tobytes(), 3, 32))
    assert err is None
    want = np.array([0, 16384, -16384, 32767, -32768, 32767, -32768])
    assert feats[3] == 7
    assert feats[6] == 32768 / 32768.0
    assert feats[7] == 4 / 7  # the two clamps + the two exact rails clip
    assert feats[5] == math.sqrt(int(np.sum(want * want)) / 7) / 32768.0


def test_float32_nan_rejected():
    decode = _wav_decode_impl()
    f = np.array([0.0, np.nan], dtype="<f4")
    feats, err = decode(_wav(f.tobytes(), 3, 32))
    assert feats is None and "NaN" in err


def test_wsamplesperblock_trims_padding_nibbles():
    """An encoder's final partial block pads to block_align; the fmt
    extension's wSamplesPerBlock says how many samples are REAL — the
    pad nibbles must not decode as audio (code-review r8 finding)."""
    decode = _wav_decode_impl()
    # capacity 1 + 8*2 = 17 samples, but declare only 11 real ones
    full = ima_adpcm_wav_bytes(list(range(16)), pred0=50, idx0=10)
    trimmed = bytearray(full)
    # wSamplesPerBlock lives at fmt body offset 18 = file offset 12+8+18
    struct.pack_into("<H", trimmed, 12 + 8 + 18, 11)
    feats, err = decode(bytes(trimmed))
    assert err is None
    assert feats[3] == 11  # 17 capacity - 6 pad samples dropped
    want = _spec_decode(list(range(16)), 50, 10)[:11]
    wn, wrms, wpeak, wclip = _features_from_samples(want)
    assert feats[5] == wrms and feats[6] == wpeak


# ---------------------------------------------------------------- stereo
def _ref_ima(codes, pred, idx):
    from crawl_streams_spark.operators.multimodal import (
        IMA_INDEX_TABLE,
        IMA_STEP_TABLE,
    )

    out = [pred]
    for c in codes:
        step = IMA_STEP_TABLE[idx]
        d = step >> 3
        if c & 1:
            d += step >> 2
        if c & 2:
            d += step >> 1
        if c & 4:
            d += step
        pred = pred - d if c & 8 else pred + d
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX_TABLE[c & 7]))
        out.append(pred)
    return out


def test_stereo_ima_matches_independent_per_channel_recurrences():
    """Stereo blocks carry per-channel headers and 4-byte channel
    groups; the decoded interleaved stream must equal the two mono
    recurrences zipped L,R — asymmetric codes/seeds so a group-order
    or header-order mistake cannot cancel."""
    import math

    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ima_adpcm_stereo_wav_bytes,
    )

    decode = _wav_decode_impl()
    cl = [(7 * i + 3) % 16 for i in range(24)]
    cr = [(5 * i + 11) % 16 for i in range(24)]
    feats, err = decode(
        ima_adpcm_stereo_wav_bytes(
            cl, cr, pred_l=100, idx_l=5, pred_r=-200, idx_r=40
        )
    )
    assert err is None
    rate, n_ch, bits, n_samples, dur, rms, peak, clip = feats
    assert (n_ch, bits, n_samples) == (2, 4, 25)
    assert dur == 1000.0 * 25 / 8000
    inter = [
        v
        for pair in zip(_ref_ima(cl, 100, 5), _ref_ima(cr, -200, 40))
        for v in pair
    ]
    assert rms == math.sqrt(
        sum(v * v for v in inter) / len(inter)
    ) / 32768.0
    assert peak == max(abs(v) for v in inter) / 32768.0


def test_stereo_ima_channels_are_independent():
    """Changing only the RIGHT channel's codes must leave the decoded
    LEFT recurrence untouched: for each run, the decoded statistics
    equal the zip of two INDEPENDENTLY-computed reference recurrences —
    any state leak across the group boundary would break at least one
    run's exact match."""
    import math

    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ima_adpcm_stereo_wav_bytes,
    )

    decode = _wav_decode_impl()
    cl = [(3 * i) % 16 for i in range(16)]
    left_ref = _ref_ima(cl, 50, 10)
    for cr_seed in (1, 9):
        cr = [(cr_seed * i + 2) % 16 for i in range(16)]
        feats, err = decode(
            ima_adpcm_stereo_wav_bytes(cl, cr, pred_l=50, idx_l=10)
        )
        assert err is None
        inter = [
            v for p in zip(left_ref, _ref_ima(cr, 0, 0)) for v in p
        ]
        assert feats[5] == math.sqrt(
            sum(v * v for v in inter) / len(inter)
        ) / 32768.0
        assert feats[6] == max(abs(v) for v in inter) / 32768.0


def test_stereo_ima_rejects_unframeable_block_align():
    """A stereo block whose data area is not whole 4-byte-per-channel
    groups cannot be framed — loud rejection, never a misdecode."""
    import struct

    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ima_adpcm_stereo_wav_bytes,
    )

    decode = _wav_decode_impl()
    good = ima_adpcm_stereo_wav_bytes([0] * 8, [0] * 8)
    # fmt chunk starts at byte 12; wBlockAlign at offset 12+8+12 = 32
    bad = bytearray(good)
    (ba,) = struct.unpack_from("<H", bad, 32)
    struct.pack_into("<H", bad, 32, ba - 4)  # tear one L group in half
    feats, err = decode(bytes(bad))
    assert feats is None and "not 8 + 8k" in err


def test_stereo_ima_multiblock_and_padding_trim():
    """Two blocks; wSamplesPerBlock trims per channel within each."""
    from crawl_streams_spark.operators.multimodal import (
        _wav_decode_impl,
        ima_adpcm_stereo_wav_bytes,
    )
    import struct

    decode = _wav_decode_impl()
    one = ima_adpcm_stereo_wav_bytes(
        [1] * 8, [2] * 8, pred_l=10, pred_r=20
    )
    # duplicate the single data block: grow the data chunk in place
    hdr_end = one.index(b"data") + 8
    block = one[hdr_end:]
    two = bytearray(one[:hdr_end]) + block + block
    struct.pack_into("<I", two, hdr_end - 4, 2 * len(block))
    struct.pack_into("<I", two, 4, len(two) - 8)
    feats, err = decode(bytes(two))
    assert err is None
    assert feats[3] == 18  # 2 blocks x 9 per-channel samples
