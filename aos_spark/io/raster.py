"""S17: raster zonal ingestion (WorldPop population bands, GHSL built
surface, GHS-SMOD settlement class) re-expressed Spark-first.

The reference delegates raster→tile mapping to a raster library behind
``tiles_viewer.map_wp_pop / map_built_s / map_smod``
(impact_analysis.py:813-920; admin variant :2389-2459) and treats the
result as a per-tile metric column — exactly the shape of the custom
tile-CSV override (S16). Engine-side, the scalable decomposition is:

1. **Blocks**: a raster lands as pre-chunked BLOCKS — one row per block:
   grid origin, cell size, column count, and a value array. This is the
   natural unit a COG/GeoTIFF windowed read produces, and each block is an
   independent row, so a 100 TB raster mosaic is just a big DataFrame.
2. **Cell explode** (``explode_block_cells``): posexplode + the affine
   transform, pure Catalyst — no Python in the per-cell path.
3. **Zonal rollup** (``zonal_sum_to_tiles`` / ``zonal_mode_to_tiles``):
   one shuffle keyed by tile id; sums for population/built-surface
   (WorldPop semantics), modal class for SMOD.

Decode is TIERED (VERDICT r3 #7): ``rasterio`` when importable (any
GDAL-readable raster, windowed), else the zero-dependency baseline-TIFF
parser in io/tiff.py (uncompressed striped single-band + GeoTIFF georef
tags — real byte-level decode, round-trip tested), else the deterministic
fake for plumbing tests. Files are read DISTRIBUTED via the binaryFile
source and decoded executor-side in a mapInPandas kernel — a 100 TB
raster mosaic decodes as one row per file fanning out to one row per
block, never through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aos_spark.geo.sjoin import quadkey_expr

RASTER_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("raster_id", T.StringType(), False),
        T.StructField("x0", T.DoubleType(), False),  # west edge (lon)
        T.StructField("y0", T.DoubleType(), False),  # north edge (lat)
        T.StructField("dx", T.DoubleType(), False),  # cell width (deg)
        T.StructField("dy", T.DoubleType(), False),  # cell height (deg)
        T.StructField("ncols", T.IntegerType(), False),
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
    ]
)


def decode_raster_bytes(
    name: str, data: bytes, rows_per_block: int = 256
) -> Iterator[dict]:
    """Decode kernel: one raster file's bytes → block dicts matching
    RASTER_BLOCK_SCHEMA. Prefers rasterio (any GDAL format); falls back to
    the zero-dep baseline-TIFF parser. Blocks are horizontal row bands so
    a huge raster becomes many bounded rows."""
    # import failure vs decode failure are separate: a payload rasterio
    # can't open must still reach the zero-dep TIFF parser, not raise a
    # rasterio error only in GDAL-bearing environments
    try:  # optional fast path — any GDAL-readable raster
        import rasterio  # type: ignore[import-not-found] # noqa: F401
        from rasterio.io import MemoryFile  # type: ignore[import-not-found]
    except ImportError:
        MemoryFile = None
    arr = None
    if MemoryFile is not None:
        try:
            with MemoryFile(data) as mem, mem.open() as src:
                arr = src.read(1).astype("float64")
                t = src.transform
                x0, y0, dx, dy = float(t.c), float(t.f), float(t.a), float(-t.e)
        except Exception:
            arr = None  # undecodable by rasterio — try the zero-dep parser
    if arr is None:
        from aos_spark.io.tiff import parse_tiff

        arr, georef = parse_tiff(data)
        if georef is None:
            raise ValueError(
                f"{name}: TIFF has no GeoTIFF georeferencing tags "
                "(ModelPixelScale/ModelTiepoint)"
            ) from None
        x0, y0, dx, dy = georef
        arr = arr.astype("float64")
    h, w = arr.shape
    for r0 in range(0, h, rows_per_block):
        chunk = arr[r0 : r0 + rows_per_block]
        yield {
            "raster_id": f"{name}#rows-{r0}",
            "x0": x0,
            "y0": y0 - r0 * dy,
            "dx": dx,
            "dy": dy,
            "ncols": w,
            "values": chunk.ravel().tolist(),
        }


def decode_geotiff_blocks(
    spark: SparkSession,
    path: str,
    fake: bool = False,
    blocks: int = 4,
    rows_per_block: int = 256,
) -> DataFrame:
    """Decode raster file(s) at ``path`` into the block frame above.

    Real path: binaryFile scan (one row per file, distributed) →
    mapInPandas running ``decode_raster_bytes`` executor-side. ``fake=True``
    keeps the deterministic synthetic grid for environments with neither a
    raster library nor TIFF inputs.
    """
    if not fake:
        files = spark.read.format("binaryFile").load(path).select("path", "content")

        def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = [
                    blk
                    for p, content in zip(pdf["path"], pdf["content"])
                    for blk in decode_raster_bytes(p, bytes(content), rows_per_block)
                ]
                if rows:
                    yield pd.DataFrame(rows)

        return files.mapInPandas(kernel, schema=RASTER_BLOCK_SCHEMA)
    b = spark.range(blocks).select(F.col("id").cast("int").alias("bid"))
    return b.select(
        F.concat(F.lit(path + "#block-"), F.col("bid").cast("string")).alias("raster_id"),
        (F.lit(-10.0) + F.col("bid") * 2.0).cast("double").alias("x0"),
        (F.lit(10.0) - F.col("bid") * 2.0).cast("double").alias("y0"),
        F.lit(0.125).alias("dx"),
        F.lit(0.125).alias("dy"),
        F.lit(16).alias("ncols"),
        F.transform(
            F.sequence(F.lit(0), F.lit(255)),
            lambda i: ((F.col("bid") * 37 + i * 11) % 50).cast("double"),
        ).alias("values"),
    )


def explode_block_cells(
    blocks: DataFrame,
    values_col: str = "values",
    nodata: float | None = None,
) -> DataFrame:
    """Blocks → one row per cell: (raster_id, lon, lat, value), cell-center
    coordinates from the affine transform. posexplode + arithmetic only —
    whole-stage-codegen'd, no Python, embarrassingly parallel per block."""
    pos = F.col("__pos")
    ncols = F.col("ncols").cast("double")
    row = F.floor(pos / ncols).cast("double")
    col = (pos % F.col("ncols")).cast("double")
    out = (
        blocks.select(
            "raster_id",
            "x0",
            "y0",
            "dx",
            "dy",
            "ncols",
            F.posexplode_outer(values_col).alias("__pos", "value"),
        )
        .select(
            "raster_id",
            (F.col("x0") + (col + 0.5) * F.col("dx")).alias("lon"),
            (F.col("y0") - (row + 0.5) * F.col("dy")).alias("lat"),
            "value",
        )
        .filter(F.col("value").isNotNull())
    )
    if nodata is not None:
        out = out.filter(F.col("value") != F.lit(nodata))
    return out


def equirect_tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Equirectangular tile indices at ``zoom`` (2^zoom × 2^zoom grid over
    lon ∈ [-180,180], lat ∈ [-90,90]). Only +,-,*,/ and floor — bit-exact
    across engines (IEEE doubles, same operation order), which is why the
    oracle-gated query uses this tiling. Production tiling is the
    Web-Mercator quadkey (``zonal_sum_to_tiles``), whose transcendentals
    (log/tan) are libm-dependent and not oracle-exact at tile boundaries."""
    n = float(1 << zoom)
    tx = F.floor((lon + 180.0) / 360.0 * n).cast("int")
    ty = F.floor((90.0 - lat) / 180.0 * n).cast("int")
    return tx, ty


def zonal_sum_to_tiles(
    points: DataFrame,
    zoom: int,
    value_col: str = "value",
    out_col: str = "total_value",
) -> DataFrame:
    """WorldPop/GHSL semantics: per-tile SUM of cell values (population
    counts, built-surface m²). One shuffle keyed by quadkey."""
    return (
        points.withColumn("tile_id", quadkey_expr("lat", "lon", zoom))
        .groupBy("tile_id")
        .agg(
            F.sum(value_col).alias(out_col),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )


def zonal_mode_to_tiles(
    points: DataFrame,
    zoom: int,
    class_col: str = "value",
) -> DataFrame:
    """GHS-SMOD semantics: per-tile MODAL settlement class, ties broken
    toward the larger (more urban) class — two partial-aggregated shuffles,
    no window."""
    counted = (
        points.withColumn("tile_id", quadkey_expr("lat", "lon", zoom))
        .groupBy("tile_id", class_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return counted.groupBy("tile_id").agg(
        F.max(F.struct(F.col("__n"), F.col(class_col).alias("cls")))["cls"].alias(
            "modal_class"
        )
    )
