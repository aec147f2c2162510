"""Multimodal plumbing: binary payload column + mapInPandas decode stage
(stubbed codecs, real Spark contract)."""

from __future__ import annotations

import hashlib

from crawl_streams_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    documents_as_media,
    media_summary,
)
from crawl_streams_spark.operators import multimodal as MM
from crawl_streams_spark.tables import load_table


def test_decode_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in decoded.collect()}
    for d in docs.collect():
        r = rows[d["doc_id"]]
        payload = d["text"].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["payload_sha1"] == hashlib.sha1(payload).hexdigest()
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["features"]) == 8


def test_null_payload_passthrough(spark):
    import pyspark.sql.functions as F

    df = spark.range(3).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") == 1, F.lit(b"x")).alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("image/x-fake").alias("mime"),
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[0]["n_bytes"] is None and rows[0]["features"] is None
    assert rows[1]["n_bytes"] == 1


def test_media_summary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    s = media_summary(decode_media(documents_as_media(docs))).collect()
    assert len(s) == 1
    row = s[0]
    assert row["n_media"] == 100
    assert row["n_distinct_payloads"] == 100  # sample texts are unique
    assert row["total_bytes"] > 0


def test_resize_geometry(spark, sf_dir):
    from crawl_streams_spark.operators.multimodal import resize_media

    docs = load_table(spark, sf_dir, "documents").limit(40)
    decoded = decode_media(documents_as_media(docs))
    resized = {r["media_id"]: r for r in resize_media(decoded, max_side=32).collect()}
    for r in decoded.collect():
        z = resized[r["media_id"]]
        assert z["resized_width"] <= 32 and z["resized_height"] <= 32
        if r["width"] <= 32 and r["height"] <= 32:
            assert z["scale"] == 1.0  # never upscale
        else:
            # independently recomputed fit-geometry must match
            scale = min(32 / r["width"], 32 / r["height"])
            assert abs(z["resized_width"] - r["width"] * scale) <= 0.5 + 1e-9
            assert abs(z["resized_height"] - r["height"] * scale) <= 0.5 + 1e-9


def test_frame_sampling_expands_rows(spark, sf_dir):
    from crawl_streams_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = documents_as_media(docs)
    frames = sample_frames(media, fps=2.0, duration_s=3).collect()
    assert len(frames) == 10 * 6  # 1 → N row expansion
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f)
    for mid, fs in by_media.items():
        assert sorted(f["frame_index"] for f in fs) == list(range(6))
        assert len({f["frame_sha1"] for f in fs}) == 6  # frames distinct
        assert {f["frame_ts_ms"] for f in fs} == {0, 500, 1000, 1500, 2000, 2500}


# ---- REAL codec-free decoders (WAV / PPM) ------------------------------


def _media_df(spark, payloads):
    from crawl_streams_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [(i, p, "audio", "audio/wav") for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_wav_roundtrip_features_known_signal(spark):
    import numpy as np

    amp = 16384  # half scale
    t = np.arange(16000)
    sine = (amp * np.sin(2 * np.pi * 440 * t / 16000)).astype("<i2")
    payload = MM.wav_bytes(sine, sample_rate=16000)
    got = MM.decode_wav(_media_df(spark, [payload])).collect()[0]
    assert got["error"] is None
    assert got["sample_rate"] == 16000 and got["n_channels"] == 1
    assert got["n_samples"] == 16000
    assert abs(got["duration_ms"] - 1000.0) < 1e-3
    # sine RMS = amp/(sqrt(2)*32768) ~ 0.3536
    assert abs(got["rms"] - 0.3536) < 0.01
    assert abs(got["peak"] - amp / 32768.0) < 0.01
    assert got["clip_fraction"] == 0.0


def test_wav_clipping_detected(spark):
    import numpy as np

    x = np.full(1000, 32767, dtype="<i2")
    got = MM.decode_wav(_media_df(spark, [MM.wav_bytes(x)])).collect()[0]
    assert got["clip_fraction"] == 1.0 and abs(got["peak"] - 32767 / 32768) < 1e-4


def test_wav_stereo_sample_count_is_per_channel(spark):
    import numpy as np

    inter = np.zeros(2000, dtype="<i2")  # 1000 frames x 2 channels
    payload = MM.wav_bytes(inter, sample_rate=8000, n_channels=2)
    got = MM.decode_wav(_media_df(spark, [payload])).collect()[0]
    assert got["n_channels"] == 2 and got["n_samples"] == 1000
    assert abs(got["duration_ms"] - 125.0) < 1e-3


def test_wav_malformed_payloads_report_errors_not_failures(spark):
    rows = MM.decode_wav(
        _media_df(spark, [b"not audio", b"RIFF\x00\x00\x00\x00WAVE", None])
    ).collect()
    errs = {r["media_id"]: r["error"] for r in rows}
    assert errs[0] and errs[1] and errs[2] == "null payload"
    assert all(r["rms"] is None for r in rows)


def test_ppm_decode_solid_color_means_exact(spark):
    import numpy as np

    img = np.zeros((10, 20, 3), dtype=np.uint8)
    img[..., 0] = 200  # red plane
    got = MM.decode_ppm(_media_df(spark, [MM.ppm_bytes(img)])).collect()[0]
    assert (got["width"], got["height"]) == (20, 10)
    assert got["mean_r"] == 200.0 and got["mean_g"] == 0.0
    assert abs(got["mean_luma"] - 0.299 * 200) < 1e-3


def test_ppm_resize_matches_numpy_reference(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8).astype(np.uint8)
    out = MM.resize_ppm(
        _media_df(spark, [MM.ppm_bytes(img)]), max_side=16
    ).collect()[0]
    assert out["error"] is None
    rw, rh = out["resized_width"], out["resized_height"]
    assert (rw, rh) == (12, 16)  # 48x64 -> fit 16 => scale 0.25
    # reference nearest-neighbor
    yi = (np.arange(rh) * (64 / rh)).astype(int)
    xi = (np.arange(rw) * (48 / rw)).astype(int)
    ref = img[yi][:, xi]
    assert bytes(out["payload"]) == MM.ppm_bytes(ref)


def test_ppm_malformed_reports_error(spark):
    rows = MM.decode_ppm(
        _media_df(spark, [b"P5\n1 1\n255\nx", b"P6\n1000 1000\n255\nxx"])
    ).collect()
    assert all(r["error"] is not None for r in rows)
