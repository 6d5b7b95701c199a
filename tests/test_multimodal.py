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
    # image rows ONLY (r9 review: the kernel previously emitted bogus
    # 'image' features for audio/video rows too — the kind filter now
    # keeps non-image payloads off the Python boundary, like the
    # audio/video siblings)
    assert set(rows) == {"img1", "img2", "imgnull"}
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


def test_real_decode_unrecognized_payload_raises():
    with pytest.raises(NotImplementedError, match="image library"):
        MM.decode_image(b"bytes", fake=False)


def test_real_ppm_decode_exact_luma():
    """P6 PPM with half white / half black pixels → mean luma exactly 0.5."""
    ppm = b"P6\n2 2\n255\n" + bytes([255, 255, 255, 0, 0, 0, 0, 0, 0, 255, 255, 255])
    feat = MM.decode_image(ppm, fake=False)
    assert feat["mean_luma"] == pytest.approx(0.5)
    assert len(feat["phash"]) == 16


def test_real_pgm_decode_with_comment_and_maxval():
    """P5 grayscale with a header comment and a non-255 maxval must scale."""
    pgm = b"P5\n# a comment\n2 1\n100\n" + bytes([100, 0])
    feat = MM.decode_image(pgm, fake=False)
    assert feat["mean_luma"] == pytest.approx(0.5)


def test_real_bmp_decode_rgb_order_and_flip():
    """Uncompressed 24-bit BMP: bottom-up rows and BGR byte order must be
    undone — a file whose FIRST stored row is blue represents an image
    whose BOTTOM row is blue."""
    import struct as S

    w = h = 2
    stride = (w * 3 + 3) & ~3
    header = b"BM" + S.pack("<IHHI", 14 + 40 + stride * h, 0, 0, 54)
    dib = S.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    blue_row = bytes([255, 0, 0] * w) + b"\0" * (stride - 3 * w)  # BGR
    red_row = bytes([0, 0, 255] * w) + b"\0" * (stride - 3 * w)
    bmp = header + dib + blue_row + red_row  # stored bottom-up
    arr = MM._parse_bmp(bmp)
    assert arr.shape == (2, 2, 3)
    assert list(arr[0, 0]) == [255.0, 0.0, 0.0]  # top row red
    assert list(arr[1, 0]) == [0.0, 0.0, 255.0]  # bottom row blue
    feat = MM.decode_image(bmp, fake=False)
    expected = (0.299 * 255 + 0.114 * 255) / 2 / 255.0  # half red, half blue
    assert feat["mean_luma"] == pytest.approx(expected)


def test_phash_distinguishes_gradient_from_flat():
    flat = b"P5\n8 8\n255\n" + bytes([128] * 64)
    grad = b"P5\n8 8\n255\n" + bytes(range(0, 256, 4))
    f1 = MM.decode_image(flat, fake=False)
    f2 = MM.decode_image(grad, fake=False)
    assert f1["phash"] != f2["phash"]


def _wav_pcm16(samples, rate=8000):
    import struct as S

    import numpy as np

    body = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF" + S.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + S.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + S.pack("<I", len(body)) + body
    )


def test_real_wav_decode_duration_rms_clipping():
    wav = _wav_pcm16([16384, -16384] * 4000, rate=8000)  # 1 s square wave
    feat = MM.decode_audio(wav, fake=False)
    assert feat["duration_s"] == pytest.approx(1.0)
    assert feat["rms"] == pytest.approx(0.5)
    assert feat["clipped"] is False
    hot = MM.decode_audio(_wav_pcm16([32767, 0, 0, 0]), fake=False)
    assert hot["clipped"] is True


def test_real_wav_features_through_spark(spark):
    rows = [("a1", "audio", _wav_pcm16([16384, -16384] * 400, rate=800), "audio/wav",
             None, None, 99.0)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = MM.extract_audio_features(df, fake=False).collect()[0]
    assert got["duration_s"] == pytest.approx(1.0)  # decoded, not the 99.0 metadata
    assert got["rms"] == pytest.approx(0.5)


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


def test_pil_decode_failure_falls_through_to_zero_dep(monkeypatch):
    """ADVICE r4: when an image library IS importable but can't decode the
    payload, the tiered decoder must fall through to the zero-dep parsers
    (and the documented NotImplementedError), not leak the library's own
    error. Simulated with a stub PIL whose open() always fails."""
    import sys
    import types

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")

    def _open(_buf):
        raise ValueError("cannot identify image file")

    pil_image.open = _open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    # PPM payload still decodes via the zero-dep tier
    ppm = b"P6 2 1 255\n" + bytes([255, 255, 255, 0, 0, 0])
    out = MM.decode_image(ppm, fake=False)
    assert abs(out["mean_luma"] - 0.5) < 1e-6
    # garbage payload reaches the documented NotImplementedError
    with pytest.raises(NotImplementedError, match="image library"):
        MM.decode_image(b"not-an-image", fake=False)


# ----------------------------------------------------------- real video tier

import struct


def _chunk(cid, body):
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _riff_list(ltype, body):
    return _chunk(b"LIST", ltype + body)


def _avi_bytes(frame_values, fps=2.0, w=4, h=2, compressed=False):
    """Minimal RIFF/AVI: avih + vids strh/strf + movi of solid-gray 24-bit
    DIB frames (value per frame from frame_values)."""
    usec = int(1_000_000 / fps)
    avih = struct.pack(
        "<IIIIIIIIII", usec, 0, 0, 0, len(frame_values), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = b"vids" + (b"MJPG" if compressed else b"DIB ") + b"\x00" * 48
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
    stride = (w * 3 + 3) & ~3
    frames = b""
    for v in frame_values:
        row = bytes([v, v, v] * w) + b"\x00" * (stride - w * 3)
        tag = b"00dc" if compressed else b"00db"
        frames += _chunk(tag, row * h)
    hdrl = _riff_list(
        b"hdrl", _chunk(b"avih", avih) + _riff_list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    movi = _riff_list(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_avi_frame_grab_luma_and_duration():
    """3 solid-gray frames at 2 fps: true duration 1.5 s, per-frame mean
    luma equals the gray value exactly (zero-dep DIB decode)."""
    avi = _avi_bytes([0, 100, 200])
    assert abs(MM.video_duration_s(avi) - 1.5) < 1e-9
    feats = MM.decode_video_frames(avi, [0.0, 0.5, 1.0], fake=False)
    assert [f["frame_ts"] for f in feats] == [0.0, 0.5, 1.0]
    got = [round(f["mean_luma"] * 255) for f in feats]
    assert got == [0, 100, 200]  # frame i is solid gray i
    assert all(len(f["phash"]) == 16 for f in feats)


def test_real_avi_through_spark_plumbing(spark):
    """sample_frames(fake=False) decodes the AVI payload itself: duration
    comes from the container (metadata column deliberately wrong)."""
    avi = _avi_bytes([0, 100, 200])
    rows = [("v1", "video", avi, "video/avi", 4, 2, 99.0)]  # lying metadata
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = MM.sample_frames(df, every_s=0.5, fake=False).collect()
    assert sorted(r["frame_ts"] for r in out) == [0.0, 0.5, 1.0]  # 1.5s real
    assert all(r["media_id"] == "v1" for r in out)


def test_compressed_avi_without_codec_is_explicit_stub():
    """MJPEG-style '00dc' frames need an image library; without one the
    kernel must raise the documented NotImplementedError, not garbage."""
    avi = _avi_bytes([0, 100], compressed=True)
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: compressed tier would decode")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="image library"):
        MM.decode_video_frames(avi, [0.0], fake=False)


def test_non_avi_video_payload_is_explicit_stub():
    with pytest.raises(NotImplementedError, match="video library"):
        MM.decode_video_frames(b"not-a-video", [0.0], fake=False)


def test_sample_frames_null_duration_and_corrupt_payload_robustness(spark):
    """r9 review: a NULL duration_s arrived as truthy NaN and crashed the
    fake path (int(NaN)); truncated PNM/BMP headers raised raw parse
    errors out of the decode tier instead of the documented
    NotImplementedError fallthrough; negative timestamps indexed from
    the END of the frame list."""
    import pytest

    rows = [("v1", "video", b"RIFFxxxxAVI ", "video/avi", None, None, None)]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = MM.sample_frames(media, every_s=1.0, fake=True).collect()
    assert out == []  # NULL duration -> zero frames, no crash

    from aos_spark.llm.multimodal import _decode_image_array, decode_video_frames

    assert _decode_image_array(b"P6") is None          # truncated PNM header
    assert _decode_image_array(b"BM\x01\x02") is None  # truncated BMP header

    # negative timestamp clamps to frame 0, not frames[-k]
    payload = _avi_bytes([0, 255], fps=1.0)
    f_neg = MM.decode_video_frames(payload, [-5.0], fake=False)
    f_zero = MM.decode_video_frames(payload, [0.0], fake=False)
    assert f_neg[0]["phash"] == f_zero[0]["phash"]
