"""Pure-NumPy baseline JPEG codec (operators/jpeg.py) and its Spark
decode stage (multimodal.decode_jpeg_features). Decoder correctness is
pinned against ANALYTIC expectations (flat blocks and hand-picked AC
patterns have closed-form IDCT outputs; random round-trips compare to an
independent direct-formula IDCT), never against the decoder's own
inverse. Cross-engine value gate: plans/q_crawl.py::media_jpeg_features
(analytic SQL oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from crawl_streams_spark.operators.jpeg import (
    ZIGZAG,
    JpegError,
    decode_jpeg,
    encode_baseline,
    gray_jpeg,
)

Q1 = np.ones(64, dtype=np.int64)
Q8 = Q1.copy()
Q8[0] = 8


def _reference_idct(zz_blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Independent direct-formula IDCT (T.81 A.3.3), one 8x8 block per
    input row, laid out left-to-right."""
    u = np.arange(8)
    cu = np.where(u == 0, np.sqrt(0.5), 1.0)
    cosm = np.cos((2 * np.arange(8)[:, None] + 1) * u[None, :] * np.pi / 16)
    out = np.zeros((8, 8 * len(zz_blocks)))
    for b, zz in enumerate(zz_blocks):
        S = np.zeros(64)
        S[ZIGZAG] = zz * q
        S = S.reshape(8, 8)
        block = 0.25 * np.einsum("u,v,yu,xv,uv->yx", cu, cu, cosm, cosm, S)
        out[:, b * 8 : (b + 1) * 8] = np.clip(np.round(block) + 128, 0, 255)
    return out


def test_flat_gray_decodes_exactly():
    """q00=8 makes flat gray lossless: quantized DC = gray-128, IDCT of
    a DC-only block = uniform DC*q/8 — the invariant the SQL oracle of
    media_jpeg_features relies on."""
    for w, h, g in [(8, 8, 0), (8, 8, 255), (16, 8, 77), (24, 16, 128),
                    (12, 10, 200)]:
        img = decode_jpeg(gray_jpeg(w, h, g))
        assert img.shape == (h, w, 1)
        assert (img == g).all()


def test_single_ac_coefficient_matches_analytic_idct():
    zz = np.zeros((1, 64), dtype=np.int64)
    zz[0, 0] = 10  # DC
    zz[0, 1] = 6   # first zigzag AC (S01): horizontal half-cosine ramp
    img = decode_jpeg(encode_baseline([zz], 8, 8, Q8))[:, :, 0]
    assert (img == _reference_idct(zz, Q8)).all()


def test_color_444_ycbcr_to_rgb():
    flat = np.zeros((1, 64), dtype=np.int64)
    img = decode_jpeg(encode_baseline([flat] * 3, 8, 8, Q8))
    assert img.shape == (8, 8, 3) and (img == 128).all()
    # Cr=200: R = round(128 + 1.402*72) = 229, B stays 128
    cr = flat.copy()
    cr[0, 0] = 200 - 128
    img = decode_jpeg(encode_baseline([flat, flat, cr], 8, 8, Q8))
    assert (img[:, :, 0] == 229).all() and (img[:, :, 2] == 128).all()


def test_420_subsampling_and_odd_crop():
    zy = np.zeros((4, 64), dtype=np.int64)
    zy[:, 0] = 50
    zc = np.zeros((1, 64), dtype=np.int64)
    img = decode_jpeg(
        encode_baseline(
            [zy, zc, zc], 16, 16, Q8, sampling=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert img.shape == (16, 16, 3) and (img[:, :, 0] == 178).all()
    img = decode_jpeg(
        encode_baseline(
            [zy, zc, zc], 12, 10, Q8, sampling=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert img.shape == (10, 12, 3)  # cropped from the padded 16x16 MCU


def test_restart_markers_16bit_dqt_and_dc_prediction():
    """DC prediction across blocks, predictor reset at RSTn, and the
    16-bit DQT form — one stream exercising all three."""
    zz = np.zeros((4, 64), dtype=np.int64)
    zz[:, 0] = [0, 40, -40, 100]
    img = decode_jpeg(
        encode_baseline([zz], 32, 8, Q8, restart_interval=2, q16=True)
    )
    expected = np.concatenate(
        [np.full((8, 8), g + 128) for g in (0, 40, -40, 100)], axis=1
    )
    assert (img[:, :, 0] == expected).all()


def test_random_roundtrip_vs_reference_idct():
    rng = np.random.default_rng(5)
    for _ in range(10):
        zz = rng.integers(-60, 60, size=(3, 64))
        zz[rng.random((3, 64)) < 0.8] = 0  # sparse ACs
        q = rng.integers(1, 30, size=64).astype(np.int64)
        img = decode_jpeg(encode_baseline([zz], 24, 8, q))[:, :, 0]
        assert (img == _reference_idct(zz, q)).all()


def test_zrl_long_zero_runs():
    zz = np.zeros((1, 64), dtype=np.int64)
    zz[0, 0] = 5
    zz[0, 40] = -3  # 39 zeros before: two ZRLs + a run-7 code
    img = decode_jpeg(encode_baseline([zz], 8, 8, Q1))[:, :, 0]
    assert (img == _reference_idct(zz, Q1)).all()


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"nope", "SOI"),
        (b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x08", "unsupported coding"),
        (b"\xff\xd8\xff\xd9", "EOI before SOS"),
    ],
)
def test_malformed_and_unsupported_raise(payload, msg):
    with pytest.raises(JpegError, match=msg):
        decode_jpeg(payload)


def test_truncated_scan_raises():
    good = gray_jpeg(32, 32, 90)
    with pytest.raises(JpegError):
        decode_jpeg(good[: len(good) // 2])


def test_decode_jpeg_features_stage(spark):
    """The Spark stage: decode + per-row error quarantine + null
    propagation, through mapInPandas."""
    from crawl_streams_spark.operators.multimodal import (
        decode_jpeg_features,
    )

    rows = [
        (1, bytearray(gray_jpeg(16, 8, 99))),
        (2, None),
        (3, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {
        r["media_id"]: r for r in decode_jpeg_features(df).collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (
        16, 8, 1,
    )
    assert got[1]["mean_luma"] == 99.0 and got[1]["error"] is None
    assert got[2]["error"] == "null payload"
    assert "SOI" in got[3]["error"]


def test_truncation_inside_scan_data_raises():
    """Cutting INSIDE the entropy-coded scan (markers intact up to the
    cut) must raise, not silently decode 1-padding as image data."""
    good = gray_jpeg(64, 64, 90)
    sos = good.find(b"\xff\xda")
    assert sos > 0
    cut = good[: sos + 20]  # header + a sliver of scan data
    # either detection path is a correct rejection: the 1-padding decodes
    # into an invalid Huffman code, or the overrun flag fires at the next
    # MCU boundary
    with pytest.raises(JpegError, match="truncated|invalid Huffman"):
        decode_jpeg(cut)


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: optional 0xFF fill bytes may pad before any marker;
    they must be skipped, not parsed as a bogus marker/length."""
    good = gray_jpeg(16, 8, 123)
    # inject a fill byte before the DQT marker (FF DB) and two before SOS
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xda", 1
    )
    img = decode_jpeg(padded)
    assert img.shape == (8, 16, 1) and (img == 123).all()
