"""Tests for S17 raster zonal ingestion (io/raster.py): block explode
geometry, zonal sum/mode rollups, and the decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aos_spark.io import raster


def _one_block(spark, values, ncols=2, x0=0.0, y0=1.0, dx=0.5, dy=0.5):
    return spark.createDataFrame(
        [("r0", x0, y0, dx, dy, ncols, values)], schema=raster.RASTER_BLOCK_SCHEMA
    )


def test_explode_block_cells_geometry(spark):
    # 2x2 block: values laid out row-major from the NW corner
    df = _one_block(spark, [1.0, 2.0, 3.0, 4.0])
    rows = {
        (r["lon"], r["lat"]): r["value"]
        for r in raster.explode_block_cells(df).collect()
    }
    assert rows == {
        (0.25, 0.75): 1.0,
        (0.75, 0.75): 2.0,
        (0.25, 0.25): 3.0,
        (0.75, 0.25): 4.0,
    }


def test_explode_skips_nodata_and_nulls(spark):
    df = _one_block(spark, [1.0, None, -9999.0, 4.0])
    vals = sorted(
        r["value"] for r in raster.explode_block_cells(df, nodata=-9999.0).collect()
    )
    assert vals == [1.0, 4.0]


def test_zonal_sum_quadkey_path(spark):
    # all 4 cells of a half-degree block land in one zoom-5 quadkey tile
    df = _one_block(spark, [1.0, 2.0, 3.0, 4.0])
    pts = raster.explode_block_cells(df)
    out = raster.zonal_sum_to_tiles(pts, zoom=5).collect()
    assert len(out) == 1
    assert out[0]["total_value"] == 10.0
    assert out[0]["n_cells"] == 4
    assert len(out[0]["tile_id"]) == 5  # zoom digits


def test_zonal_mode_tie_breaks_urban(spark):
    # SMOD classes: tie between 11 and 23 within the tile -> keep 23 (more urban)
    df = _one_block(spark, [11.0, 23.0, 23.0, 11.0])
    pts = raster.explode_block_cells(df)
    out = raster.zonal_mode_to_tiles(pts, zoom=5).collect()
    assert len(out) == 1
    assert out[0]["modal_class"] == 23.0


def test_tiff_roundtrip_dtypes():
    """write_baseline_geotiff ↔ parse_tiff must round-trip values and
    georef bit-exactly for every supported dtype."""
    import numpy as np

    from aos_spark.io import tiff

    for dtype in ("uint8", "uint16", "int16", "int32", "float32", "float64"):
        arr = (np.arange(12).reshape(3, 4) * 3 + 1).astype(dtype)
        data = tiff.write_baseline_geotiff(arr, x0=-10.0, y0=45.5, dx=0.25, dy=0.5)
        got, georef = tiff.parse_tiff(data)
        assert got.dtype.kind == arr.dtype.kind and got.dtype.itemsize == arr.dtype.itemsize
        assert (got == arr).all(), dtype
        assert georef == (-10.0, 45.5, 0.25, 0.5)


def test_tiff_parser_rejects_garbage():
    import pytest as _pytest

    from aos_spark.io import tiff

    with _pytest.raises(ValueError, match="byte-order"):
        tiff.parse_tiff(b"PK\x03\x04" + b"\0" * 16)
    with _pytest.raises(ValueError, match="shorter"):
        tiff.parse_tiff(b"II")


def test_real_decode_end_to_end(spark, tmp_path):
    """A real GeoTIFF written to disk must decode through the distributed
    binaryFile→mapInPandas path into blocks whose exploded cells carry the
    exact values and affine-correct cell-center coordinates."""
    import numpy as np

    from aos_spark.io import tiff

    arr = np.arange(20, dtype="float64").reshape(5, 4)
    (tmp_path / "t.tif").write_bytes(
        tiff.write_baseline_geotiff(arr, x0=2.0, y0=10.0, dx=0.5, dy=1.0)
    )
    blocks = raster.decode_geotiff_blocks(
        spark, str(tmp_path / "t.tif"), rows_per_block=2
    )
    rows = blocks.collect()
    assert len(rows) == 3  # 5 rows in bands of 2: 2+2+1
    assert {r["ncols"] for r in rows} == {4}
    assert sorted(r["y0"] for r in rows) == [6.0, 8.0, 10.0]
    cells = {
        (r["lon"], r["lat"]): r["value"]
        for r in raster.explode_block_cells(blocks).collect()
    }
    assert len(cells) == 20
    assert cells[(2.25, 9.5)] == 0.0  # NW cell center
    assert cells[(3.75, 5.5)] == 19.0  # SE cell center


def test_real_decode_requires_georef(spark, tmp_path):
    import numpy as np

    from aos_spark.io import tiff

    (tmp_path / "plain.tif").write_bytes(
        tiff.write_baseline_geotiff(np.ones((2, 2), dtype="uint8"))
    )
    with pytest.raises(Exception, match="georeferencing"):
        raster.decode_geotiff_blocks(spark, str(tmp_path / "plain.tif")).collect()


def test_fake_decode_plumbs_end_to_end(spark):
    blocks = raster.decode_geotiff_blocks(spark, "x.tif", fake=True, blocks=3)
    assert blocks.schema == raster.RASTER_BLOCK_SCHEMA
    pts = raster.explode_block_cells(blocks)
    assert pts.count() == 3 * 256
    tiles = raster.zonal_sum_to_tiles(pts, zoom=6)
    total = tiles.agg(F.sum("n_cells")).first()[0]
    assert total == 3 * 256
