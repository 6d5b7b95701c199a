"""Independent-truth checks, multimodal tier: the last family VERDICT r10
named (similarity/sketch/minhash/text landed in test_independent_truth_ml)
that had only oracle+pytest evidence.

The three gate queries chain synth → REAL byte-level parse → integer
features inside Arrow-batched mapInPandas. The replicas here attack both
halves with author-independent implementations:

- **decode side**: the WAV payloads are re-parsed with the Python STDLIB
  ``wave`` module (a parser nobody in this repo wrote) + ``array``; the
  AVI payloads are re-walked with an iterative stack-based RIFF walker
  using ``int.from_bytes`` and pure-byte DIB indexing (vs the engine's
  recursive ``struct`` walker + numpy raster reshape) — and each decoded
  PIXEL/SAMPLE is checked element-wise against the closed form, which is
  strictly stronger than comparing aggregate features.
- **feature side**: every aggregate (Σs², clip count, zero crossings,
  Σrgb, max/min) is recomputed with pure-Python loops — no numpy — and
  compared EXACTLY (all integer) against the Spark query output.
- **real image kernel**: PPM/BMP payloads written by an independent
  encoder (including a top-down negative-height BMP, the variant the
  synth never emits), decoded through the real kernel, and compared to a
  no-numpy luma/aHash replica with explicit tie-margin guards.

Shared PARAMETERS (the synth byte-generators, imported like a column
name — they define the fixture) are the only engine code used; every
parse and every aggregate is recomputed from first principles.
"""

from __future__ import annotations

import array
import hashlib
import io
import math
import struct
import wave

import pandas as pd
import pytest

from aos_spark.llm.multimodal import synth_avi_dib, synth_wav_pcm16
from aos_spark.queries import QUERIES


def _close(a, b, rel=1e-6, abs_=2e-6):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- audio


def _wav_features_stdlib(payload: bytes) -> dict:
    """Decode with the stdlib ``wave`` module (independent RIFF parser),
    recover int16 samples via ``array``, aggregate with plain loops."""
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = array.array("h")
    samples.frombytes(raw)  # '<i2' == native 'h' on little-endian
    sum_sq = 0
    n_clipped = 0
    zero_crossings = 0
    prev = None
    for s in samples:
        sum_sq += s * s
        if abs(s) >= 32766:
            n_clipped += 1
        if prev is not None and prev * s < 0:
            zero_crossings += 1
        prev = s
    return {
        "n_samples": len(samples),
        "sample_rate": rate,
        "sum_sq": sum_sq,
        "n_clipped": n_clipped,
        "zero_crossings": zero_crossings,
        "samples": list(samples),
    }


def _wav_features_closed_form(doc_id: int) -> dict:
    """No bytes at all: the synth's documented closed form, recomputed."""
    n = 100 + (doc_id % 50)
    vals = [((doc_id * 31 + i * 7919) % 65536) - 32768 for i in range(n)]
    return {
        "n_samples": n,
        "sample_rate": 8000,
        "sum_sq": sum(v * v for v in vals),
        "n_clipped": sum(1 for v in vals if abs(v) >= 32766),
        "zero_crossings": sum(
            1 for a, b in zip(vals, vals[1:]) if a * b < 0
        ),
        "samples": vals,
    }


def test_wav_synth_bytes_match_closed_form_via_stdlib_decoder(docs):
    """Encode half: synth bytes, decoded by a parser this repo did not
    write, must reproduce the closed form SAMPLE-BY-SAMPLE."""
    for doc_id in docs["doc_id"].head(64):
        got = _wav_features_stdlib(synth_wav_pcm16(int(doc_id)))
        want = _wav_features_closed_form(int(doc_id))
        assert got == want, doc_id


def test_multimodal_audio_features_matches_pure_python(spark, sf_dir, docs):
    """Decode half: the Spark chain (pandas-UDF synth → chunk-walking
    parser → integer aggregates) vs the closed-form pure-Python replica,
    EXACT on every integer feature for every document."""
    expect = {}
    for doc_id in docs["doc_id"]:
        f = _wav_features_closed_form(int(doc_id))
        expect[str(int(doc_id))] = (
            f["n_samples"], f["sample_rate"], f["sum_sq"],
            f["n_clipped"], f["zero_crossings"],
        )
    got = {
        r["media_id"]: (
            r["n_samples"], r["sample_rate"], r["sum_sq"],
            r["n_clipped"], r["zero_crossings"],
        )
        for r in QUERIES["multimodal_audio_features"](spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------- video


def _walk_avi_iterative(data: bytes):
    """Independent AVI walk: iterative explicit-stack traversal (vs the
    engine's recursive walker), ``int.from_bytes`` (vs ``struct``).
    Returns (w, h, bits, usec_per_frame, [frame bytes in file order])."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not AVI"
    w = h = bits = usec = None
    last_fcc = None
    frames: list[bytes] = []
    stack = [(12, min(8 + int.from_bytes(data[4:8], "little"), len(data)))]
    while stack:
        pos, end = stack.pop()
        if pos + 8 > end:
            continue
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = pos + 8
        nxt = body + size + (size & 1)
        stack.append((nxt, end))  # continuation first (LIFO → child next)
        if cid == b"LIST":
            stack.append((body + 4, min(body + size, end)))
        elif cid == b"avih":
            usec = int.from_bytes(data[body : body + 4], "little")
        elif cid == b"strh":
            last_fcc = data[body : body + 4]
        elif cid == b"strf" and last_fcc == b"vids":
            w = int.from_bytes(data[body + 4 : body + 8], "little", signed=True)
            h_raw = int.from_bytes(
                data[body + 8 : body + 12], "little", signed=True
            )
            h = abs(h_raw)
            bits = int.from_bytes(data[body + 14 : body + 16], "little")
        elif cid.endswith(b"db"):
            frames.append(data[body : body + size])
    return w, h, bits, usec, frames


def _dib_rgb_pure(buf: bytes, w: int, h: int):
    """Pure-byte bottom-up BGR decode: {(y, x, c): value} in display space
    with c ∈ {0:R, 1:G, 2:B} — no numpy, no reshape."""
    stride = (w * 3 + 3) & ~3
    px = {}
    for r in range(h):
        y = h - 1 - r  # buffer rows are bottom-up
        for x in range(w):
            base = r * stride + x * 3
            px[(y, x, 2)] = buf[base]      # B
            px[(y, x, 1)] = buf[base + 1]  # G
            px[(y, x, 0)] = buf[base + 2]  # R
    return px


def test_avi_synth_pixels_match_closed_form_elementwise(docs):
    """Encode half, element-wise: every pixel of every frame recovered by
    the independent walker + pure-byte DIB decode equals the closed form
    (id·7 + f·131 + y·17 + x·29 + c·53) mod 256."""
    for doc_id in docs["doc_id"].head(48):
        doc_id = int(doc_id)
        w, h, bits, usec, frames = _walk_avi_iterative(synth_avi_dib(doc_id))
        assert (w, h, bits) == (4, 2, 24) and usec == 40_000
        assert len(frames) == 3 + doc_id % 4
        for f, buf in enumerate(frames):
            px = _dib_rgb_pure(buf, w, h)
            for (y, x, c), v in px.items():
                want = (doc_id * 7 + f * 131 + y * 17 + x * 29 + c * 53) % 256
                assert v == want, (doc_id, f, y, x, c)


def test_multimodal_video_features_matches_pure_python(spark, sf_dir, docs):
    """The Spark chain vs closed-form pure-Python aggregates, EXACT."""
    expect = {}
    for doc_id in docs["doc_id"]:
        doc_id = int(doc_id)
        nf = 3 + doc_id % 4
        vals = [
            (doc_id * 7 + f * 131 + y * 17 + x * 29 + c * 53) % 256
            for f in range(nf)
            for y in range(2)
            for x in range(4)
            for c in range(3)
        ]
        expect[str(doc_id)] = (nf, 4, 2, sum(vals), max(vals), min(vals))
    got = {
        r["media_id"]: (
            r["n_frames"], r["width"], r["height"],
            r["sum_rgb"], r["max_pixel"], r["min_pixel"],
        )
        for r in QUERIES["multimodal_video_features"](spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------- image


def test_multimodal_image_features_matches_hashlib_replica(spark, sf_dir, docs):
    """The gate query's declared-fake kernel, replicated from its
    definition with hashlib over the raw utf-8 text: n_bytes exact,
    mean_luma = digest[0]/255 exact, phash = first 16 hex chars."""
    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        payload = (text or "").encode("utf-8")
        digest = hashlib.md5(payload).digest()
        expect[str(int(doc_id))] = (
            len(payload), digest[0] / 255.0, digest.hex()[:16]
        )
    got = {
        r["media_id"]: (r["n_bytes"], r["mean_luma"], r["phash"])
        for r in QUERIES["multimodal_image_features"](spark, sf_dir).collect()
    }
    assert got == expect


def _ppm_bytes(w: int, h: int, pix) -> bytes:
    """Independent P6 encoder (comment + unusual whitespace on purpose)."""
    body = bytes(
        pix(y, x, c) for y in range(h) for x in range(w) for c in range(3)
    )
    return b"P6\n# independent encoder\n%d %d\n255\n" % (w, h) + body


def _bmp_topdown_bytes(w: int, h: int, pix) -> bytes:
    """Independent 24-bit BMP encoder writing TOP-DOWN rows (negative
    height) — the raster variant the engine's own synth never produces,
    so the decoder's row-order branch is exercised by foreign bytes."""
    stride = (w * 3 + 3) & ~3
    raster = bytearray(stride * h)
    for y in range(h):  # top-down: buffer row y IS display row y
        for x in range(w):
            base = y * stride + x * 3
            raster[base] = pix(y, x, 2)      # B
            raster[base + 1] = pix(y, x, 1)  # G
            raster[base + 2] = pix(y, x, 0)  # R
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + bytes(raster)


def _luma_ahash_pure(w: int, h: int, pix, side: int = 8):
    """No-numpy replica of the real kernel's features: mean luma and the
    8×8 average hash with the engine's exact block boundaries
    (ys = i·h // side). Returns (mean_luma, phash_hex, min_margin) where
    min_margin is the smallest |block_mean − overall_mean| — the caller
    asserts it is far from the knife edge so bit equality is implied,
    never float luck."""
    luma = [
        [0.299 * pix(y, x, 0) + 0.587 * pix(y, x, 1) + 0.114 * pix(y, x, 2)
         for x in range(w)]
        for y in range(h)
    ]
    mean_luma = sum(sum(row) for row in luma) / (w * h) / 255.0
    ys = [i * h // side for i in range(side + 1)]
    xs = [j * w // side for j in range(side + 1)]
    small = []
    for i in range(side):
        for j in range(side):
            y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            block = [luma[y][x] for y in range(y0, y1) for x in range(x0, x1)]
            small.append(sum(block) / len(block))
    overall = sum(small) / len(small)
    bits = ["1" if v > overall else "0" for v in small]
    margin = min(abs(v - overall) for v in small)
    return mean_luma, f"{int(''.join(bits), 2):016x}", margin


def test_real_image_kernel_matches_no_numpy_replica(spark):
    """REAL decode path (fake=False) through the Spark mapInPandas
    plumbing over foreign-encoder payloads — P6 PPM and a top-down BMP —
    vs the pure-Python luma/aHash replica."""
    from aos_spark.llm.multimodal import extract_image_features

    w, h = 16, 12

    def pix(seed):
        return lambda y, x, c: (seed * 11 + y * 37 + x * 13 + c * 71) % 256

    payloads = {
        "ppm_1": _ppm_bytes(w, h, pix(1)),
        "ppm_2": _ppm_bytes(w, h, pix(2)),
        "bmp_td": _bmp_topdown_bytes(w, h, pix(3)),
    }
    media = spark.createDataFrame(
        [(k, "image", v) for k, v in payloads.items()],
        "media_id string, kind string, payload binary",
    )
    got = {
        r["media_id"]: r
        for r in extract_image_features(media, fake=False).collect()
    }
    for mid, seed in (("ppm_1", 1), ("ppm_2", 2), ("bmp_td", 3)):
        luma, phash, margin = _luma_ahash_pure(w, h, pix(seed))
        assert margin > 1e-6, "degenerate fixture: aHash knife edge"
        _close(got[mid]["mean_luma"], luma, rel=1e-9, abs_=1e-12)
        assert got[mid]["phash"] == phash, mid
        assert got[mid]["n_bytes"] == len(payloads[mid])
