"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode kernels are TIERED (VERDICT r3 #7):

- **image**: PIL when importable (any format) → zero-dep parsers for
  binary PPM/PGM (P6/P5) and uncompressed 24-bit BMP — REAL byte-level
  decode with real luma + 8×8 average-hash perceptual hash → the
  deterministic content-hash fake (``fake=True``) for payloads that are
  neither.
- **audio**: zero-dep RIFF/WAVE PCM16 parser (duration, RMS, clip
  detection from real samples) → the fake.
- **video**: frame GRABBING stays stubbed (container/codec parsing needs
  ffmpeg); the fan-out plumbing is real.

Scale notes: binary payloads ride in their own column so Parquet keeps them
out of metadata-only scans (column pruning); feature extraction is
``mapInPandas`` over batches whose size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)


def _parse_pnm(data: bytes) -> np.ndarray | None:
    """Binary PPM (P6, H×W×3) / PGM (P5, H×W) → uint8-ish array."""
    if data[:2] not in (b"P5", b"P6"):
        return None
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (with '#' comments), then ONE whitespace byte, then raster
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    channels = 3 if data[:2] == b"P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    arr = np.frombuffer(data, dtype=dt, count=w * h * channels, offset=i)
    arr = arr.astype("float64") * (255.0 / maxval)
    return arr.reshape((h, w, 3) if channels == 3 else (h, w))


def _parse_bmp(data: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP (the plain Windows DIB) → H×W×3 RGB."""
    if data[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(data, dtype="u1", count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1].astype("float64")  # BGR → RGB


def _decode_image_array(payload: bytes) -> np.ndarray | None:
    """Tiered image decode: PIL (any format) → PPM/PGM → 24-bit BMP.
    Import failure and decode failure are separate concerns: a payload
    PIL can't identify must still fall through to the zero-dep parsers
    (and ultimately the documented NotImplementedError), not raise
    UnidentifiedImageError only in PIL-bearing environments."""
    try:
        import io as _io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        Image = None
    if Image is not None:
        try:
            return np.asarray(
                Image.open(_io.BytesIO(payload)).convert("RGB")
            ).astype("float64")
        except Exception:
            pass  # undecodable by PIL — try the zero-dep parsers
    # truncated/garbled headers raise from the zero-dep parsers (int(b'')
    # → ValueError in PNM, struct.error/ValueError in BMP): map them to
    # the None-fallthrough so a corrupt payload surfaces as the
    # documented NotImplementedError, not a raw parse crash that kills
    # the whole Arrow batch (r9 review)
    try:
        arr = _parse_pnm(payload)
    except (ValueError, IndexError, struct.error):
        arr = None
    if arr is None:
        try:
            arr = _parse_bmp(payload)
        except (ValueError, IndexError, struct.error):
            arr = None
    return arr


def _average_hash(gray: np.ndarray, side: int = 8) -> str:
    """8×8 average hash: block-mean downsample, threshold at the mean —
    the standard aHash perceptual fingerprint, 64 bits as 16 hex chars."""
    h, w = gray.shape
    ys = np.arange(side + 1) * h // side
    xs = np.arange(side + 1) * w // side
    small = np.array(
        [
            [gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
             for j in range(side)]
            for i in range(side)
        ]
    )
    bits = (small > small.mean()).ravel()
    return f"{int(''.join('1' if b else '0' for b in bits), 2):016x}"


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    """Image decode kernel: real luma + aHash for decodable payloads
    (PIL / PPM / PGM / BMP); ``fake=True`` keeps the deterministic
    content-hash stand-in for synthetic plumbing tests."""
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        return {
            "mean_luma": digest[0] / 255.0,
            "phash": digest.hex()[:16],
        }
    arr = _decode_image_array(payload or b"")
    if arr is None:
        raise NotImplementedError(
            "payload is not PPM/PGM/uncompressed-24-bit-BMP and no "
            "importable image library (PIL) could decode it; pass "
            "fake=True for the deterministic test kernel"
        )
    luma = (
        0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
        if arr.ndim == 3
        else arr
    )
    return {
        "mean_luma": float(luma.mean() / 255.0),
        "phash": _average_hash(luma),
    }


def extract_image_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Batch-at-a-time: each Arrow batch is decoded in one Python call; only
    the small feature frame crosses back to the JVM. Rows are filtered to
    ``kind = 'image'`` BEFORE the Python boundary when the column exists
    (r9 review — the audio/video kernels already enforce their kind;
    without the filter, non-image payloads crossed to Python to crash the
    real decoder or silently got fake 'image' features)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "phash": [f["phash"] for f in feats],
                }
            )

    if "kind" in df.columns:
        df = df.filter(F.col("kind") == "image")
    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("clipped", T.BooleanType(), True),
    ]
)


def _parse_wav_pcm16(data: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE PCM16 → (samples as float in [-1,1], sample_rate). Walks
    the chunk list (fmt may precede LIST/fact chunks before data)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, rate, bits, fmt_code = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt_code, _ch, rate = struct.unpack_from("<HHI", data, body)
            (bits,) = struct.unpack_from("<H", data, body + 14)
        elif cid == b"data":
            if fmt_code != 1 or bits != 16 or not rate:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt_code}, bits={bits}); PCM16 only"
                )
            n = size // 2
            samples = np.frombuffer(data, dtype="<i2", count=n, offset=body)
            return samples.astype("float64") / 32768.0, rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    return None


def decode_audio(payload: bytes, *, fake: bool = False) -> dict:
    """Audio decode kernel: real RIFF/WAVE PCM16 parse (RMS, clipping,
    duration from actual samples); ``fake=True`` keeps the deterministic
    digest stand-in for synthetic payloads."""
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        return {"rms": digest[1] / 255.0, "clipped": digest[2] > 240, "duration_s": None}
    parsed = _parse_wav_pcm16(payload or b"")
    if parsed is None:
        raise NotImplementedError(
            "payload is not RIFF/WAVE PCM and no audio library is available; "
            "pass fake=True for the deterministic test kernel"
        )
    samples, rate = parsed
    rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
    clipped = bool((np.abs(samples) >= 32766 / 32768.0).any())
    return {
        "rms": rms,
        "clipped": clipped,
        "duration_s": samples.size / rate if rate else None,
    }


def extract_audio_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas audio features over the binary payload column (same
    Arrow-batch contract as the image kernel); rows of other kinds are
    filtered before the Python boundary so only audio bytes cross it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_audio(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    # real decode knows the true duration; fake trusts metadata
                    "duration_s": [
                        f["duration_s"] if f["duration_s"] is not None else meta
                        for f, meta in zip(feats, pdf["duration_s"])
                    ],
                    "rms": [f["rms"] for f in feats],
                    "clipped": [f["clipped"] for f in feats],
                }
            )

    return (
        df.filter("kind = 'audio'")
        .select("media_id", "payload", "duration_s")
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


def _parse_avi(data: bytes):
    """Zero-dep RIFF/AVI parse → (fps, width, height, bits, frames) where
    frames is an ordered list of (tag, bytes) with tag b'db' (uncompressed
    DIB) or b'dc' (codec-compressed). Walks the LIST tree the same way the
    WAV parser walks its chunk list; video stream format comes from the
    'strf' following a 'vids' 'strh'. Returns None for non-AVI payloads."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    state = {"usec": None, "w": None, "h": None, "bits": None, "last_strh": b""}
    frames: list[tuple[bytes, bytes]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, min(body + size, len(data)))
            elif cid == b"avih":
                (state["usec"],) = struct.unpack_from("<I", data, body)
            elif cid == b"strh":
                state["last_strh"] = data[body : body + 4]  # fccType
            elif cid == b"strf" and state["last_strh"] == b"vids":
                bw, bh = struct.unpack_from("<ii", data, body + 4)
                (state["bits"],) = struct.unpack_from("<H", data, body + 14)
                state["w"], state["h"] = bw, abs(bh)
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
                frames.append((cid[2:4], data[body : body + size]))
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(data))
    if not frames or not state["w"] or not state["usec"]:
        return None
    fps = 1_000_000.0 / state["usec"]
    return fps, state["w"], state["h"], state["bits"], frames


def _dib_frame_to_rgb(buf: bytes, w: int, h: int, bits: int) -> np.ndarray:
    """Uncompressed AVI video frame ('00db'): bottom-up BGR rows padded to
    4 bytes — the same raster layout as the BMP parser's pixel block."""
    if bits != 24:
        raise NotImplementedError(f"only 24-bit DIB frames supported (got {bits})")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype="u1", count=stride * h).reshape(h, stride)
    rows = rows[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].astype("float64")  # flip + BGR → RGB


def decode_video_frames(
    payload: bytes, timestamps: list[float], *, fake: bool = False
) -> list[dict]:
    """Frame-grab kernel: for each sampled timestamp return
    {frame_ts, mean_luma, phash} of the nearest frame. Real path parses
    RIFF/AVI; uncompressed 24-bit DIB streams decode zero-dep, compressed
    streams (e.g. MJPEG '00dc') go through the tiered image decoder (PIL
    when importable — each frame is a complete JPEG) and raise the
    documented NotImplementedError otherwise. ``fake=True`` keeps the
    deterministic digest stand-in for synthetic payloads."""
    if fake:
        out = []
        for ts in timestamps:
            digest = hashlib.md5((payload or b"") + str(ts).encode()).digest()
            out.append(
                {
                    "frame_ts": ts,
                    "mean_luma": digest[0] / 255.0,
                    "phash": digest.hex()[:16],
                }
            )
        return out
    parsed = _parse_avi(payload or b"")
    if parsed is None:
        raise NotImplementedError(
            "payload is not RIFF/AVI and no video library is available; "
            "pass fake=True for the deterministic test kernel"
        )
    fps, w, h, bits, frames = parsed
    out = []
    for ts in timestamps:
        # clamp BOTH ends: a negative timestamp otherwise indexes from
        # the END of the frame list via Python's negative indexing (r9)
        idx = max(0, min(int(round(ts * fps)), len(frames) - 1))
        tag, buf = frames[idx]
        if tag == b"db":
            arr = _dib_frame_to_rgb(buf, w, h, bits)
        else:
            arr = _decode_image_array(buf)
            if arr is None:
                raise NotImplementedError(
                    "compressed AVI stream and no importable image library "
                    "can decode its frames; re-encode to uncompressed DIB "
                    "or install PIL"
                )
        luma = (
            0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
            if arr.ndim == 3
            else arr
        )
        out.append(
            {
                "frame_ts": ts,
                "mean_luma": float(luma.mean() / 255.0),
                "phash": _average_hash(luma),
            }
        )
    return out


def video_duration_s(payload: bytes) -> float | None:
    """True duration of an AVI payload (frame count / fps), None if not AVI."""
    parsed = _parse_avi(payload or b"")
    if parsed is None:
        return None
    fps, _w, _h, _bits, frames = parsed
    return len(frames) / fps


def sample_frames(df: DataFrame, every_s: float = 1.0, *, fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp.
    Real path (fake=False) decodes frames from the AVI payload itself and
    takes the TRUE duration from the container (frames/fps) — the metadata
    column is only trusted in fake mode. Row fan-out, schema, and Arrow
    batching are identical either way, so the plumbing tested at scale is
    the plumbing the real kernel rides."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ts", T.DoubleType(), False),
            T.StructField("frame_phash", T.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_ts": [], "frame_phash": []}
            for _, r in pdf.iterrows():
                if fake:
                    # pd.isna, not `or`: a NULL duration arrives as NaN,
                    # which is truthy — int(NaN / every_s) then raised
                    # and killed the whole job (r9 review)
                    dur = r["duration_s"]
                    dur = 0.0 if pd.isna(dur) else float(dur)
                else:
                    dur = video_duration_s(r["payload"]) or 0.0
                n = int(dur / every_s)
                ts_list = [i * every_s for i in range(n)]
                feats = decode_video_frames(r["payload"], ts_list, fake=fake)
                for f in feats:
                    rows["media_id"].append(r["media_id"])
                    rows["frame_ts"].append(f["frame_ts"])
                    rows["frame_phash"].append(f["phash"])
            yield pd.DataFrame(rows)

    return df.filter("kind = 'video'").mapInPandas(batches, schema=out_schema)


AUDIO_INT_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("n_clipped", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def synth_wav_pcm16(media_id: int, *, rate: int = 8000) -> bytes:
    """Deterministic RIFF/WAVE PCM16 payload from an integer id:
    n = 100 + id%50 samples, sample i = ((id·31 + i·7919) mod 65536) − 32768.
    Pure integer closed form, so an SQL oracle can recompute every decoded
    feature without touching bytes — the bridge that lets REAL byte-level
    encode/decode plumbing sit inside an exactly-checkable gate query."""
    n = 100 + (media_id % 50)
    vals = [((media_id * 31 + i * 7919) % 65536) - 32768 for i in range(n)]
    samples = np.asarray(vals, dtype="<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def audio_int_features(df: DataFrame) -> DataFrame:
    """Integer-exact audio features over REAL RIFF/WAVE PCM16 payloads:
    the bytes go through the actual chunk-walking parser
    (_parse_wav_pcm16), and every feature is an order-independent integer
    aggregate of the recovered int16 samples — n_samples, Σs² (energy),
    clip count (|s| ≥ 32766), zero crossings — so the result is
    bit-reproducible under ANY Arrow batch split or partitioning, unlike
    a float RMS whose summation order the engine owns.

    Same mapInPandas contract as the image/audio kernels: rows filtered
    to kind='audio' before the Python boundary, one Arrow batch in, one
    out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "n_samples": [],
                "sample_rate": [],
                "sum_sq": [],
                "n_clipped": [],
                "zero_crossings": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_wav_pcm16(payload or b"")
                if parsed is None:
                    raise NotImplementedError(
                        "payload is not RIFF/WAVE PCM16; audio_int_features "
                        "has no fake tier — synthesize with synth_wav_pcm16"
                    )
                fsamples, rate = parsed
                ints = np.rint(fsamples * 32768.0).astype(np.int64)
                out["media_id"].append(mid)
                out["n_samples"].append(int(ints.size))
                out["sample_rate"].append(int(rate))
                out["sum_sq"].append(int((ints * ints).sum()))
                out["n_clipped"].append(int((np.abs(ints) >= 32766).sum()))
                out["zero_crossings"].append(
                    int(((ints[:-1] * ints[1:]) < 0).sum()) if ints.size > 1 else 0
                )
            yield pd.DataFrame(out)

    return (
        df.filter("kind = 'audio'")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=AUDIO_INT_FEATURES_SCHEMA)
    )


VIDEO_INT_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("sum_rgb", T.LongType(), True),
        T.StructField("max_pixel", T.LongType(), True),
        T.StructField("min_pixel", T.LongType(), True),
    ]
)


def synth_avi_dib(media_id: int, *, width: int = 4, height: int = 2) -> bytes:
    """Deterministic RIFF/AVI with uncompressed 24-bit DIB frames from an
    integer id: n_frames = 3 + id%4; display-space pixel value at
    (frame f, row y, col x, channel c∈{R,G,B}) =
    (id·7 + f·131 + y·17 + x·29 + c·53) mod 256. The closed form lets an
    SQL oracle recompute every decoded feature — the audio synth's video
    sibling, driving the REAL chunk-walking AVI parser and bottom-up BGR
    DIB raster decode end to end."""
    n_frames = 3 + (media_id % 4)
    stride = (width * 3 + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    frames = []
    for f in range(n_frames):
        buf = bytearray(stride * height)
        for r in range(height):  # buffer rows are bottom-up
            y = height - 1 - r
            for x in range(width):
                base = r * stride + x * 3
                # bytes are B, G, R == channels 2, 1, 0
                for b_i, c in ((0, 2), (1, 1), (2, 0)):
                    buf[base + b_i] = (
                        media_id * 7 + f * 131 + y * 17 + x * 29 + c * 53
                    ) % 256
        frames.append(chunk(b"00db", bytes(buf)))

    avih = chunk(b"avih", struct.pack("<I", 40_000) + b"\x00" * 52)
    strh = chunk(b"strh", b"vids" + b"\x00" * 52)
    strf = chunk(
        b"strf",
        struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24,
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_int_features(df: DataFrame) -> DataFrame:
    """Integer-exact video features over REAL RIFF/AVI payloads: every
    frame goes through _parse_avi + the bottom-up BGR DIB raster decode,
    and the features are order-independent integer aggregates over all
    decoded RGB samples (Σ values, max, min) — bit-reproducible under any
    Arrow batching, the audio_int_features discipline. mapInPandas with
    rows filtered to kind='video' before the Python boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in VIDEO_INT_FEATURES_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_avi(payload or b"")
                if parsed is None:
                    raise NotImplementedError(
                        "payload is not RIFF/AVI; video_int_features has no "
                        "fake tier — synthesize with synth_avi_dib"
                    )
                _fps, w, h, bits, frames = parsed
                total = 0
                mx, mn = -1, 256
                n = 0
                for tag, buf in frames:
                    if tag != b"db":
                        raise NotImplementedError(
                            "compressed AVI stream in the integer-exact path"
                        )
                    arr = _dib_frame_to_rgb(buf, w, h, bits).astype(np.int64)
                    total += int(arr.sum())
                    mx = max(mx, int(arr.max()))
                    mn = min(mn, int(arr.min()))
                    n += 1
                out["media_id"].append(mid)
                out["n_frames"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_rgb"].append(total)
                out["max_pixel"].append(mx)
                out["min_pixel"].append(mn)
            yield pd.DataFrame(out)

    return (
        df.filter("kind = 'video'")
        .select("media_id", "payload")
        .mapInPandas(batches, schema=VIDEO_INT_FEATURES_SCHEMA)
    )
