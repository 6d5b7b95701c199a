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


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(NotImplementedError, match="raster library"):
        raster.decode_geotiff_blocks(spark, "x.tif")


def test_fake_decode_plumbs_end_to_end(spark):
    blocks = raster.decode_geotiff_blocks(spark, "x.tif", fake=True, blocks=3)
    assert blocks.schema == raster.RASTER_BLOCK_SCHEMA
    pts = raster.explode_block_cells(blocks)
    assert pts.count() == 3 * 256
    tiles = raster.zonal_sum_to_tiles(pts, zoom=6)
    total = tiles.agg(F.sum("n_cells")).first()[0]
    assert total == 3 * 256
