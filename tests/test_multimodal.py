"""Multimodal plumbing tests: binary columns + mapInPandas kernels
(decode stubbed — deterministic fake; the Spark-side plumbing is real)."""

from __future__ import annotations

import pytest

from aos_spark.llm import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", b"\x89PNG-fake-bytes-1", "image/png", 4, 4, None),
        ("img2", "image", b"\x89PNG-fake-bytes-22", "image/png", 8, 8, None),
        ("imgnull", "image", None, "image/png", None, None, None),
        ("vid1", "video", b"RIFF-fake-video", "video/mp4", 16, 16, 3.5),
        ("aud1", "audio", b"ID3-fake-audio", "audio/mp3", None, None, 2.0),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_image_features_deterministic(spark, media):
    feats = MM.extract_image_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {"img1", "img2", "imgnull", "vid1", "aud1"}
    assert rows["img1"]["n_bytes"] == 17
    assert rows["imgnull"]["n_bytes"] is None
    assert 0.0 <= rows["img1"]["mean_luma"] <= 1.0
    assert len(rows["img1"]["phash"]) == 16
    # deterministic: same payload → same features on a second run
    again = {r["media_id"]: r for r in MM.extract_image_features(media, fake=True).collect()}
    assert again["img1"]["phash"] == rows["img1"]["phash"]


def test_sample_frames_fanout(spark, media):
    frames = MM.sample_frames(media, every_s=1.0, fake=True)
    rows = frames.collect()
    # only the video row fans out: floor(3.5 / 1.0) = 3 frames
    assert {r["media_id"] for r in rows} == {"vid1"}
    assert sorted(r["frame_ts"] for r in rows) == [0.0, 1.0, 2.0]
    assert all(len(r["frame_phash"]) == 16 for r in rows)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="image library"):
        MM.decode_image(b"bytes", fake=False)


def test_extract_audio_features(spark, media):
    rows = {r["media_id"]: r for r in MM.extract_audio_features(media, fake=True).collect()}
    assert set(rows) == {"aud1"}  # only audio rows cross the Python boundary
    assert rows["aud1"]["duration_s"] == 2.0
    assert 0.0 <= rows["aud1"]["rms"] <= 1.0
    assert isinstance(rows["aud1"]["clipped"], bool)
    again = {r["media_id"]: r for r in MM.extract_audio_features(media, fake=True).collect()}
    assert again["aud1"]["rms"] == rows["aud1"]["rms"]


def test_audio_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="audio library"):
        MM.decode_audio(b"bytes", fake=False)
