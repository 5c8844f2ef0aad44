"""Distributed COG writer: layout, sparse tiles, overviews, round-trip."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.sources import write_cog
from rasterframes_spark.sources import geotiff as GT
from rasterframes_spark.tile import Tile, TILE_SCHEMA

TILE_T = TILE_SCHEMA.simpleString()
TS = 64  # tile size


def _layer_df(spark, rng, gw=5, gh=4, skip=()):
    """A gw x gh grid of 64x64 uint16 tiles over extent (0, 0, gw, gh) —
    key row 0 = northernmost (ymax edge)."""
    rows = []
    for r in range(gh):
        for c in range(gw):
            if (c, r) in skip:
                continue
            arr = rng.integers(1, 200, (TS, TS)).astype("uint16")
            mask = rng.random((TS, TS)) < 0.1
            rows.append({
                "spatial_key": {"col": c, "row": r},
                "tile": Tile(np.ma.masked_array(arr, mask=mask),
                             "uint16ud0").to_row(),
                "extent": {"xmin": float(c), "ymin": float(gh - r - 1),
                           "xmax": float(c + 1), "ymax": float(gh - r)},
            })
    schema = (
        "spatial_key struct<col:int,row:int>, "
        f"tile {TILE_T}, "
        "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>"
    )
    return spark.createDataFrame(rows, schema=schema).repartition(4), rows


def _expected_mosaic(rows, gw=5, gh=4):
    out = np.zeros((gh * TS, gw * TS), dtype="uint16")
    for row in rows:
        c, r = row["spatial_key"]["col"], row["spatial_key"]["row"]
        t = Tile.from_parts(row["tile"]["cell_type"], TS, TS,
                            row["tile"]["cells"])
        out[r * TS:(r + 1) * TS, c * TS:(c + 1) * TS] = np.ma.filled(
            t.masked(), 0)
    return out


def test_cog_roundtrip_full_res(spark, rng, tmp_path):
    df, rows = _layer_df(spark, rng)
    out = str(tmp_path / "t.tif")
    meta = write_cog(df, out, crs="EPSG:32617")
    assert (meta["width"], meta["height"]) == (5 * TS, 4 * TS)
    data = open(out, "rb").read()
    assert len(data) == meta["file_bytes"]
    info = GT.read_info(data)
    assert (info.width, info.height) == (5 * TS, 4 * TS)
    assert (info.tile_width, info.tile_height) == (TS, TS)
    assert info.crs == "EPSG:32617"
    assert info.extent == (0.0, 0.0, 5.0, 4.0)
    got = GT.read_window(data, info, 0, 0, info.width, info.height)
    assert np.array_equal(got, _expected_mosaic(rows))


def test_cog_layout_is_cloud_optimized(spark, rng, tmp_path):
    """IFDs at the head; overview data before full-res data; row-major."""
    df, _ = _layer_df(spark, rng)
    out = str(tmp_path / "t.tif")
    meta = write_cog(df, out)
    data = open(out, "rb").read()
    infos = GT.read_ifd_chain(data)
    assert len(infos) == meta["levels"] >= 2
    # levels shrink by 2x in grid terms
    for i in range(1, len(infos)):
        assert infos[i].width <= -(-infos[i - 1].width // 2) + TS
    # every chunk offset sits after the header region, and full-res chunks
    # come LAST in the file (overviews first = zoomed-out range reads
    # touch only the file head)
    full = [o for o in infos[0].chunk_offsets if o]
    ovr = [o for inf in infos[1:] for o in inf.chunk_offsets if o]
    assert min(full) > max(ovr)
    # row-major within the full-res level
    assert full == sorted(full)


def test_cog_sparse_tiles(spark, rng, tmp_path):
    skip = {(0, 0), (3, 2)}
    df, rows = _layer_df(spark, rng, skip=skip)
    out = str(tmp_path / "t.tif")
    meta = write_cog(df, out)
    assert meta["tiles_sparse"] >= len(skip)  # plus any empty overview cells
    data = open(out, "rb").read()
    info = GT.read_info(data)
    # sparse entries follow the GDAL convention: offset 0 / bytecount 0
    assert info.chunk_offsets[0] == 0 and info.chunk_counts[0] == 0
    got = GT.read_window(data, info, 0, 0, info.width, info.height)
    exp = _expected_mosaic(rows)
    assert np.array_equal(got, exp)
    # the skipped regions read back as the fill value
    assert not got[:TS, :TS].any()


def test_cog_overview_content(spark, rng, tmp_path):
    """Overview level 1 equals the NoData-aware 2x2 mean pool of level 0."""
    df, rows = _layer_df(spark, rng, gw=2, gh=2)
    out = str(tmp_path / "t.tif")
    write_cog(df, out, overview_resample="nearest", min_overview_tiles=1)
    data = open(out, "rb").read()
    infos = GT.read_ifd_chain(data)
    assert len(infos) >= 2
    full = GT.read_window(data, infos[0], 0, 0, infos[0].width, infos[0].height)
    ovr = GT.read_window(data, infos[1], 0, 0, infos[1].width, infos[1].height)
    # nearest = exact top-left decimation wherever data exists
    assert np.array_equal(ovr, full[::2, ::2])


def test_cog_empty_raises(spark):
    schema = ("spatial_key struct<col:int,row:int>, "
              f"tile {TILE_T}, "
              "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>")
    empty = spark.createDataFrame([], schema=schema)
    with pytest.raises(ValueError, match="empty"):
        write_cog(empty, "/tmp/nope.tif")
