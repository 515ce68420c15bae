"""Multimodal binary-column plumbing: header codec, deterministic fake
decode shapes, Arrow mapInPandas pipeline, frame sampling."""

import numpy as np
import pytest

from tsf import multimodal as mm


def test_header_roundtrip_image():
    blob, mt = mm._encode_one("d", "ab")  # 2 bytes -> even -> image
    assert mt == "image"
    meta = mm.parse_header(blob)
    assert meta["media_type"] == "image"
    assert meta["width"] == 2 * 7 % 1024 + 1
    assert meta["height"] == 2 * 13 % 768 + 1
    assert meta["channels"] == 3
    assert meta["byte_len"] == 14 + 2


def test_header_roundtrip_audio():
    blob, mt = mm._encode_one("d", "abc")  # 3 bytes -> odd -> audio
    assert mt == "audio"
    meta = mm.parse_header(blob)
    assert meta["sample_rate"] == 16000
    assert meta["n_samples"] == 3 * 31 % 8000 + 1


def test_unicode_counts_bytes_not_chars():
    blob, mt = mm._encode_one("d", "é")  # 2 utf-8 bytes -> image
    assert mt == "image"
    assert mm.parse_header(blob)["width"] == 2 * 7 % 1024 + 1


def test_empty_text():
    blob, mt = mm._encode_one("d", "")
    assert mt == "image"
    img = mm.decode_image(blob)
    assert img.shape == (1 * 13 % 768 + 1, 1, 3) or img.shape == (1, 1, 3)


def test_decode_image_shape_and_determinism():
    blob, _ = mm._encode_one("d", "hello world!")  # 12 bytes even
    img = mm.decode_image(blob)
    h, w, c = 12 * 13 % 768 + 1, 12 * 7 % 1024 + 1, 3
    assert img.shape == (h, w, c)
    assert img.dtype == np.uint8
    assert np.array_equal(img, mm.decode_image(blob))  # deterministic fake


def test_decode_audio_shape_and_range():
    blob, _ = mm._encode_one("d", "odd")
    a = mm.decode_audio(blob)
    assert a.shape == (3 * 31 % 8000 + 1,)
    assert a.dtype == np.float32
    assert (a >= -1.0).all() and (a < 1.0).all()


def test_type_mismatch_raises():
    img_blob, _ = mm._encode_one("d", "ab")
    with pytest.raises(ValueError):
        mm.decode_audio(img_blob)
    with pytest.raises(ValueError):
        mm.parse_header(b"XXXX" + bytes(10))


def test_spark_pipeline_meta_and_features(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(40)
    media = mm.synth_media(docs)
    meta = mm.decode_media_meta(media).toPandas()
    assert len(meta) == 40
    assert set(meta["media_type"]) <= {"image", "audio"}
    img = meta[meta["media_type"] == "image"]
    assert img["width"].notna().all() and img["sample_rate"].isna().all()

    feats = mm.media_features(media).toPandas()
    assert len(feats) == 40
    assert feats["n_values"].gt(0).all()
    assert np.isfinite(feats["mean_val"]).all()
    # image n_values == w*h*c from the metadata
    j = feats.merge(meta, on=["doc_id", "media_type"])
    im = j[j["media_type"] == "image"]
    assert (im["n_values"] == im["width"] * im["height"] * im["channels"]).all()
    au = j[j["media_type"] == "audio"]
    assert (au["n_values"] == au["n_samples"]).all()


def test_frame_sample_shapes(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(10)
    media = mm.synth_media(docs)
    frames = mm.frame_sample(media, every=16).toPandas()
    if len(frames):
        meta = mm.decode_media_meta(media).toPandas()
        meta = meta[meta["media_type"] == "image"].set_index("doc_id")
        for _, r in frames.iterrows():
            m = meta.loc[r["doc_id"]]
            assert r["frame_id"] % 16 == 0 and r["frame_id"] < m["height"]
            assert len(r["frame"]) == m["width"] * m["channels"]


def test_decode_stages_spread_partitions(spark, sf001):
    """The decode-heavy UDF stages must not inherit the input's
    file-size-based split count: a 0.6MB parquet is ONE split, but the
    decode expands ~10^4x, so media_features/frame_sample repartition to
    the session parallelism first (regression: 40s single-task stage)."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    media = mm.synth_media(docs)
    target = spark.sparkContext.defaultParallelism
    for op in (mm.media_features(media),
               mm.frame_sample(media, every=8)):
        assert op.rdd.getNumPartitions() >= target
