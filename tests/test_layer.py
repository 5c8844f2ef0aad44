"""Parquet tile-layer round-trip, Z2 range decomposition correctness, and
pushdown evidence (PushedFilters in the physical plan)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasterframes_spark import sources as S
from rasterframes_spark.geom import sfc
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"
EXT_T = "struct<xmin:double,ymin:double,xmax:double,ymax:double>"


def test_z2_ranges_cover_points():
    rng = np.random.default_rng(5)
    bbox = (-20.0, 10.0, -5.0, 25.0)
    ranges = sfc.z2_ranges(*bbox, max_depth=8)
    assert ranges
    # every point inside the bbox must have its z2 in some range
    xs = rng.uniform(bbox[0], bbox[2], 200)
    ys = rng.uniform(bbox[1], bbox[3], 200)
    z = sfc.z2_index(xs, ys)
    for v in z:
        assert any(lo <= int(v) <= hi for lo, hi in ranges)
    # and a far-away point must not (ranges are selective)
    far = int(sfc.z2_index(np.array([150.0]), np.array([-70.0]))[0])
    assert not any(lo <= far <= hi for lo, hi in ranges)


@pytest.fixture(scope="module")
def layer_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("layer") / "tiles")
    rng = np.random.default_rng(11)
    rows = []
    for gy in range(8):
        for gx in range(8):
            t = Tile(rng.integers(0, 100, (4, 4)).astype("int32"), "int32raw")
            rows.append({
                "spatial_key": {"col": gx, "row": gy},
                "tile": t.to_row(),
                "extent": {"xmin": gx * 2.0, "ymin": gy * 2.0,
                           "xmax": gx * 2.0 + 2.0, "ymax": gy * 2.0 + 2.0},
                "crs": "EPSG:4326",
            })
    df = spark.createDataFrame(
        rows,
        schema=(f"spatial_key struct<col:int,row:int>, tile {TILE_T}, "
                f"extent {EXT_T}, crs string"),
    )
    S.write_tile_layer(df, d, num_partitions=4)
    return d


def test_layer_roundtrip_and_metadata(spark, layer_path):
    df = S.read_tile_layer(spark, layer_path)
    assert df.count() == 64
    assert "spatial_index" in df.columns
    meta = S.layer_metadata(layer_path)
    assert meta["extent"] == [0.0, 0.0, 16.0, 16.0]
    assert meta["tile_count"] == 64
    assert meta["max_tile_size"] == [2.0, 2.0]


def test_layer_extent_query_exact(spark, layer_path):
    # query box overlapping tiles (1..2, 1..2) => 4 tiles
    got = S.read_tile_layer(spark, layer_path, query_extent=(2.5, 2.5, 5.5, 5.5))
    keys = {(r["spatial_key"]["col"], r["spatial_key"]["row"]) for r in got.collect()}
    assert keys == {(1, 1), (1, 2), (2, 1), (2, 2)}
    # boundary-touching counts as intersecting (<=/>= semantics)
    got2 = S.read_tile_layer(spark, layer_path, query_extent=(4.0, 4.0, 4.0, 4.0))
    keys2 = {(r["spatial_key"]["col"], r["spatial_key"]["row"]) for r in got2.collect()}
    assert keys2 == {(1, 1), (1, 2), (2, 1), (2, 2)}


def test_layer_pushdown_in_plan(spark, layer_path):
    q = S.read_tile_layer(spark, layer_path, query_extent=(2.5, 2.5, 5.5, 5.5))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "spatial_index" in plan


def test_bucketed_layer_table_exchange_free_join(spark, tmp_path_factory):
    """Two layers written as bucketed tables on spatial_index join WITHOUT
    any Exchange in the physical plan, and bucketed reads answer extent
    queries identically to the path-based layer."""
    warehouse = str(tmp_path_factory.mktemp("wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS rf_test LOCATION '{warehouse}'")
    rng = np.random.default_rng(7)
    def mk(seed):
        rows = []
        for gy in range(8):
            for gx in range(8):
                t = Tile(rng.integers(0, 100, (4, 4)).astype("int32"), "int32raw")
                rows.append({
                    "spatial_key": {"col": gx, "row": gy},
                    "tile": t.to_row(),
                    "extent": {"xmin": gx * 2.0, "ymin": gy * 2.0,
                               "xmax": gx * 2.0 + 2.0, "ymax": gy * 2.0 + 2.0},
                    "crs": "EPSG:4326",
                })
        return spark.createDataFrame(
            rows,
            schema=(f"spatial_key struct<col:int,row:int>, tile {TILE_T}, "
                    f"extent {EXT_T}, crs string"))
    try:
        S.write_tile_layer_table(mk(1), "rf_test.layer_a", n_buckets=4)
        S.write_tile_layer_table(mk(2), "rf_test.layer_b", n_buckets=4)

        a = S.read_tile_layer_table(spark, "rf_test.layer_a")
        b = S.read_tile_layer_table(spark, "rf_test.layer_b").select(
            "spatial_index", F.col("tile").alias("tile_b"))
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "spatial_index")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 64
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

        # extent query parity with the path-based reader
        got = S.read_tile_layer_table(
            spark, "rf_test.layer_a", query_extent=(2.5, 2.5, 5.5, 5.5))
        keys = {(r["spatial_key"]["col"], r["spatial_key"]["row"])
                for r in got.collect()}
        assert keys == {(1, 1), (1, 2), (2, 1), (2, 2)}
    finally:
        spark.sql("DROP DATABASE IF EXISTS rf_test CASCADE")


def test_pyramid_up_and_build(spark):
    """2x2 mean pooling exact vs numpy; missing children leave NoData
    quadrants; build_pyramid chains levels 16 -> 4 -> 1."""
    import rasterframes_spark as rf
    from rasterframes_spark.functions._kernel import decode_struct_pdf
    import pandas as pd

    rng = np.random.default_rng(5)
    full = rng.random((16, 16)) * 100
    rows = []
    for gy in range(4):
        for gx in range(4):
            if (gx, gy) == (3, 3):
                continue  # hole: parent (1,1) has a NoData quadrant
            t = Tile(full[gy*4:(gy+1)*4, gx*4:(gx+1)*4].copy(), "float64")
            rows.append({"spatial_key": {"col": gx, "row": gy},
                         "tile": t.to_row(),
                         "extent": {"xmin": gx*1.0, "ymin": 4.0-(gy+1),
                                    "xmax": gx+1.0, "ymax": 4.0-gy},
                         "crs": "EPSG:4326"})
    layer = spark.createDataFrame(
        rows, schema=(f"spatial_key struct<col:int,row:int>, tile {TILE_T}, "
                      f"extent {EXT_T}, crs string"))
    got = {(r["spatial_key"]["col"], r["spatial_key"]["row"]): r
           for r in rf.pyramid_up(layer).collect()}
    assert set(got) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    for (px, py), r in got.items():
        tile = decode_struct_pdf(pd.DataFrame([r["tile"].asDict()]))[0]
        block = full[py*8:(py+1)*8, px*8:(px+1)*8]
        exp = block.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3) \
            .reshape(4, 4, 4).mean(axis=2)
        m = np.asarray(tile.masked().filled(np.nan))
        if (px, py) == (1, 1):
            assert np.isnan(m[2:, 2:]).all()  # the hole quadrant
            assert np.allclose(m[:2, :], exp[:2, :])
        else:
            assert np.allclose(m, exp)
    levels = rf.build_pyramid(layer, 2)
    assert [l.count() for l in levels] == [15, 4, 1]
    # nearest decimation picks top-left pixels exactly
    near = {(r["spatial_key"]["col"], r["spatial_key"]["row"]): r
            for r in rf.pyramid_up(layer, method="nearest").collect()}
    t00 = decode_struct_pdf(pd.DataFrame([near[(0, 0)]["tile"].asDict()]))[0]
    assert np.array_equal(np.asarray(t00.masked()), full[0:8:2, 0:8:2])


def test_write_slippy_pyramid(spark, tmp_path):
    """Multi-zoom slippy export: each zoom directory exists with PNG tiles;
    coarser zooms come from pyramid_up aggregation."""
    from rasterframes_spark import sources as S
    from rasterframes_spark.sources.png import decode_png

    rng = np.random.default_rng(8)
    rows = []
    for gy in range(2):
        for gx in range(2):
            t = Tile(rng.integers(0, 100, (8, 8)).astype("int32"), "int32raw")
            rows.append({"spatial_key": {"col": gx, "row": gy},
                         "tile": t.to_row(),
                         "extent": {"xmin": -10.0 + gx * 10, "ymin": 0.0 + (1 - gy) * 10,
                                    "xmax": 0.0 + gx * 10, "ymax": 10.0 + (1 - gy) * 10},
                         "crs": "EPSG:4326"})
    layer = spark.createDataFrame(
        rows, schema=(f"spatial_key struct<col:int,row:int>, tile {TILE_T}, "
                      f"extent {EXT_T}, crs string"))
    out = str(tmp_path / "slippy")
    S.write_slippy_pyramid(layer, out, max_zoom=3, min_zoom=2)
    import glob
    for z in (2, 3):
        pngs = glob.glob(f"{out}/{z}/*/*.png")
        assert pngs, f"no tiles at zoom {z}"
        arr = decode_png(open(pngs[0], "rb").read())
        assert arr.shape == (256, 256)


def test_read_layer_catalog_rejects_remote_uri(spark, tmp_path):
    import pytest
    from rasterframes_spark.sources.layer import read_layer_catalog

    with pytest.raises(ValueError, match="s3"):
        read_layer_catalog(spark, "s3://bucket/catalog")
    # file:// and plain local paths list (empty dir -> empty catalog)
    assert read_layer_catalog(spark, str(tmp_path)).count() == 0
    assert read_layer_catalog(spark, f"file://{tmp_path}").count() == 0
