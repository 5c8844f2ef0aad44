"""SQL registration parity, grouped local aggregates, overview raster,
resample methods, local algebra escape hatch."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


@pytest.fixture(scope="module")
def tdf(spark, rng):
    tiles = [Tile(rng.integers(0, 100, (4, 4)).astype("int32"), "int32raw")
             for _ in range(6)]
    df = spark.createDataFrame(
        [{"grp": i % 2, "tile": t.to_row()} for i, t in enumerate(tiles)],
        schema=f"grp int, tile {TILE_T}",
    )
    return df, tiles


def test_sql_registration(spark, tdf):
    df, tiles = tdf
    df.createOrReplaceTempView("tiles_sql")
    got = spark.sql("""
        select grp, sum(rf_tile_sum(tile)) as s, sum(rf_data_cells(tile)) as n
        from tiles_sql group by grp order by grp
    """).collect()
    exp = {}
    for i, t in enumerate(tiles):
        exp.setdefault(i % 2, 0)
        exp[i % 2] += float(t.masked().sum())
    assert got[0]["s"] == exp[0] and got[1]["s"] == exp[1]
    assert got[0]["n"] == 48

    one = spark.sql("""
        select st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)) as d,
               st_intersects(st_geom_from_wkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                             st_point(1.0, 1.0)) as i
    """).head()
    assert one["d"] == 5.0 and one["i"]


def test_grouped_agg_local(spark, tdf):
    df, tiles = tdf
    out = rf.grouped_agg_local(df, ["grp"], "tile", "mean").orderBy("grp").collect()
    for row in out:
        g = row["grp"]
        stack = np.ma.stack([t.masked().astype("float64")
                             for i, t in enumerate(tiles) if i % 2 == g])
        got = Tile.from_parts(row["tile"]["cell_type"], 4, 4, bytes(row["tile"]["cells"]))
        assert np.allclose(np.asarray(got.masked()), np.asarray(stack.mean(axis=0)))
    mx = rf.grouped_agg_local(df, ["grp"], "tile", "max").orderBy("grp").collect()
    stack0 = np.ma.stack([t.masked().astype("float64")
                          for i, t in enumerate(tiles) if i % 2 == 0])
    got0 = Tile.from_parts(mx[0]["tile"]["cell_type"], 4, 4, bytes(mx[0]["tile"]["cells"]))
    assert np.allclose(np.asarray(got0.masked()), np.asarray(stack0.max(axis=0)))


def test_overview_raster(spark):
    # 2 tiles side by side: left constant 1, right constant 2
    t1 = Tile(np.full((8, 8), 1.0), "float64")
    t2 = Tile(np.full((8, 8), 2.0), "float64")
    EXT = "struct<xmin:double,ymin:double,xmax:double,ymax:double>"
    df = spark.createDataFrame(
        [{"tile": t1.to_row(), "extent": {"xmin": 0.0, "ymin": 0.0, "xmax": 8.0, "ymax": 8.0}, "crs": "EPSG:32617"},
         {"tile": t2.to_row(), "extent": {"xmin": 8.0, "ymin": 0.0, "xmax": 16.0, "ymax": 8.0}, "crs": "EPSG:32617"}],
        schema=f"tile {TILE_T}, extent {EXT}, crs string",
    )
    ov = rf.rf_agg_overview_raster(df, "tile", "extent", "crs", 8, 4,
                                   (0.0, 0.0, 16.0, 8.0), dest_crs="EPSG:32617")
    a = np.asarray(ov.masked())
    assert a.shape == (4, 8)
    assert float(a[:, :4].mean()) == 1.0 and float(a[:, 4:].mean()) == 2.0


def test_overview_tree_merge_bounds_driver_collect(spark):
    """With a 64-partition source the driver must collect <= 32 tree-merged
    canvases, and the merged overview must equal the narrow-source result."""
    rng = np.random.default_rng(3)
    EXT = "struct<xmin:double,ymin:double,xmax:double,ymax:double>"
    rows = []
    for i in range(64):
        gx, gy = i % 8, i // 8
        t = Tile(rng.integers(0, 50, (4, 4)).astype("float64"), "float64")
        rows.append({"tile": t.to_row(),
                     "extent": {"xmin": gx * 4.0, "ymin": gy * 4.0,
                                "xmax": gx * 4.0 + 4.0, "ymax": gy * 4.0 + 4.0},
                     "crs": "EPSG:32617"})
    df = spark.createDataFrame(rows, schema=f"tile {TILE_T}, extent {EXT}, crs string")
    wide = df.repartition(64)
    assert wide.rdd.getNumPartitions() == 64

    from rasterframes_spark.functions import aggregates as A
    seen = {}
    orig = A._overview_partials

    def spy(src, partial, merge_pass, merge_partitions):
        out = orig(src, partial, merge_pass, merge_partitions)
        seen["n"] = out.count()
        return out

    A._overview_partials = spy
    try:
        ov = rf.rf_agg_overview_raster(wide, "tile", "extent", "crs", 32, 32,
                                       (0.0, 0.0, 32.0, 32.0),
                                       dest_crs="EPSG:32617")
    finally:
        A._overview_partials = orig
    assert seen["n"] <= 32
    narrow = rf.rf_agg_overview_raster(df.coalesce(2), "tile", "extent", "crs",
                                       32, 32, (0.0, 0.0, 32.0, 32.0),
                                       dest_crs="EPSG:32617")
    assert np.array_equal(np.asarray(ov.masked()), np.asarray(narrow.masked()))
    assert np.array_equal(np.ma.getmaskarray(ov.masked()),
                          np.ma.getmaskarray(narrow.masked()))


def test_resample_bilinear(spark):
    t = Tile(np.array([[0.0, 2.0], [4.0, 6.0]]), "float64")
    df = spark.createDataFrame([{"t": t.to_row()}], schema=f"t {TILE_T}")
    row = df.select(rf.rf_resample("t", 2, "bilinear").alias("r")).head()["r"]
    up = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], bytes(row["cells"]))
    a = np.asarray(up.masked())
    assert a.shape == (4, 4)
    assert a[0, 0] == 0.0 and a[-1, -1] == 6.0
    assert a.min() >= 0.0 and a.max() <= 6.0
    # monotone along rows/cols for a monotone input
    assert np.all(np.diff(a, axis=0) >= 0) and np.all(np.diff(a, axis=1) >= 0)


def test_local_algebra_escape_hatch(spark):
    t = Tile(np.array([[1.0, 4.0], [9.0, 16.0]]), "float64")
    df = spark.createDataFrame([{"t": t.to_row()}], schema=f"t {TILE_T}")
    row = df.select(rf.rf_local_algebra(
        lambda a: np.ma.sqrt(a) + 1, "t", out_ct="float64").alias("r")).head()["r"]
    got = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], bytes(row["cells"]))
    assert np.allclose(np.asarray(got.masked()), [[2, 3], [4, 5]])


def test_proj_raster_autounwrap(spark):
    t = Tile(np.arange(4, dtype="float64").reshape(2, 2), "float64")
    EXT = "struct<xmin:double,ymin:double,xmax:double,ymax:double>"
    df = spark.createDataFrame(
        [{"pr": {"tile": t.to_row(),
                 "extent": {"xmin": 0.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0},
                 "crs": "EPSG:4326"}}],
        schema=f"pr struct<tile:{TILE_T},extent:{EXT},crs:string>",
    )
    # tile functions accept the proj_raster struct directly
    assert df.select(rf.rf_tile_sum("pr").alias("s")).head()["s"] == 6.0
    r = df.select(rf.rf_local_add("pr", 1).alias("r")).head()["r"]
    got = Tile.from_parts(r["cell_type"], r["cols"], r["rows"], bytes(r["cells"]))
    assert np.allclose(np.asarray(got.masked()), [[1, 2], [3, 4]])
