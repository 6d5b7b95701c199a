"""Zero-dependency baseline (Geo)TIFF codec — the no-library decode path
for S17 raster ingestion (reference: impact_analysis.py:813-920 delegates
to a raster library; this container ships none, so we read the bytes
ourselves).

Scope: classic TIFF 6.0 baseline, both byte orders, UNCOMPRESSED striped
single-band rasters (uint8/16/32, int8/16/32, float32/64) + the two
GeoTIFF georeferencing tags that gridded products like WorldPop/GHSL
carry (ModelPixelScale 33550, ModelTiepoint 33922). That covers the
"decode a gridded analysis raster" case end-to-end with real bytes;
anything fancier (compression, tiling, palettes, BigTIFF) belongs to the
optional ``rasterio`` fast path in io/raster.py, which is preferred
automatically when importable.

The writer exists so round-trip tests exercise the parser against real
files and so block frames can be exported back to a GIS-readable format
without a raster library.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF field types we consume: {type code: (struct fmt, bytes)}
_FIELD = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 11: ("f", 4), 12: ("d", 8)}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922

_FORMATS = {1: "u", 2: "i", 3: "f"}  # TIFF SampleFormat → numpy kind


def _read_ifd(data: bytes, bo: str) -> dict[int, list]:
    """Parse the first IFD into {tag: [values]}."""
    (off,) = struct.unpack_from(bo + "I", data, 4)
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(bo + "HHI", data, base)
        if ftype not in _FIELD:
            continue
        fmt, fsize = _FIELD[ftype]
        total = fsize * count
        if total <= 4:
            vals = struct.unpack_from(bo + fmt * count, data, base + 8)
        else:
            (voff,) = struct.unpack_from(bo + "I", data, base + 8)
            vals = struct.unpack_from(bo + fmt * count, data, voff)
        tags[tag] = list(vals)
    return tags


def parse_tiff(data: bytes) -> tuple[np.ndarray, tuple[float, float, float, float] | None]:
    """Decode baseline-TIFF bytes → (2-D numpy array, georef or None).

    Georef is ``(x0, y0, dx, dy)`` — west edge, north edge, cell width,
    cell height — derived from ModelTiepoint + ModelPixelScale exactly the
    way GDAL builds its affine for north-up rasters.
    """
    if len(data) < 8:
        raise ValueError("not a TIFF: shorter than the 8-byte header")
    order = data[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError(f"not a classic TIFF (magic {magic}; BigTIFF unsupported)")
    tags = _read_ifd(data, bo)

    width = tags[_TAG_WIDTH][0]
    height = tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp} (baseline reader)")
    samples = tags.get(_TAG_SAMPLES, [1])[0]
    if samples != 1:
        raise ValueError(f"multi-sample TIFF ({samples}) unsupported; single band only")
    bits = tags.get(_TAG_BITS, [8])[0]
    sfmt = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
    kind = _FORMATS.get(sfmt)
    if kind is None or bits % 8:
        raise ValueError(f"unsupported sample format {sfmt}/{bits}-bit")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")

    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype=dtype, count=width * height).reshape(height, width)

    georef = None
    scale = tags.get(_TAG_PIXEL_SCALE)
    tie = tags.get(_TAG_TIEPOINT)
    if scale and tie and len(tie) >= 6:
        i, j, _k, x, y, _z = tie[:6]
        dx, dy = float(scale[0]), float(scale[1])
        georef = (float(x) - i * dx, float(y) + j * dy, dx, dy)
    return arr, georef


def write_baseline_geotiff(
    arr: np.ndarray,
    x0: float | None = None,
    y0: float | None = None,
    dx: float | None = None,
    dy: float | None = None,
) -> bytes:
    """Encode a 2-D array as little-endian uncompressed single-strip
    baseline TIFF (+ GeoTIFF georef tags when given). Inverse of
    ``parse_tiff`` for everything the parser reads."""
    arr = np.ascontiguousarray(arr)
    if arr.ndim != 2:
        raise ValueError("expected a 2-D single-band array")
    kind_to_fmt = {"u": 1, "i": 2, "f": 3}
    if arr.dtype.kind not in kind_to_fmt:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    arr = arr.astype(arr.dtype.newbyteorder("<"))
    h, w = arr.shape
    bits = arr.dtype.itemsize * 8
    geo = x0 is not None

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload≤4 or b"")
    extras: list[tuple[int, bytes]] = []  # (entry index, out-of-line payload)

    def ent(tag: int, ftype: int, count: int, vals: list[float | int]) -> None:
        fmt, fsize = _FIELD[ftype]
        payload = struct.pack("<" + fmt * count, *vals)
        if len(payload) <= 4:
            entries.append((tag, ftype, count, payload.ljust(4, b"\0")))
        else:
            extras.append((len(entries), payload))
            entries.append((tag, ftype, count, b"\0\0\0\0"))

    pixels = arr.tobytes()
    ent(_TAG_WIDTH, 4, 1, [w])
    ent(_TAG_HEIGHT, 4, 1, [h])
    ent(_TAG_BITS, 3, 1, [bits])
    ent(_TAG_COMPRESSION, 3, 1, [1])
    ent(262, 3, 1, [1])  # PhotometricInterpretation: BlackIsZero
    strip_entry_idx = len(entries)
    ent(_TAG_STRIP_OFFSETS, 4, 1, [0])  # patched below
    ent(_TAG_SAMPLES, 3, 1, [1])
    ent(_TAG_ROWS_PER_STRIP, 4, 1, [h])
    ent(_TAG_STRIP_COUNTS, 4, 1, [len(pixels)])
    ent(_TAG_SAMPLE_FORMAT, 3, 1, [kind_to_fmt[arr.dtype.kind]])
    if geo:
        ent(_TAG_PIXEL_SCALE, 12, 3, [float(dx), float(dy), 0.0])
        ent(_TAG_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, float(x0), float(y0), 0.0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    cursor = ifd_off + ifd_size
    patched: dict[int, bytes] = {}
    for idx, payload in extras:
        patched[idx] = struct.pack("<I", cursor)
        cursor += len(payload)
    patched[strip_entry_idx] = struct.pack("<I", cursor)  # pixel data last

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for idx, (tag, ftype, count, payload) in enumerate(entries):
        out += struct.pack("<HHI", tag, ftype, count)
        out += patched.get(idx, payload)
    out += struct.pack("<I", 0)  # no next IFD
    for _, payload in extras:
        out += payload
    out += pixels
    return bytes(out)
