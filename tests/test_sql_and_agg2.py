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


def test_resample_cubic_and_aggregates(spark):
    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 100, (8, 8))
    m = np.zeros((8, 8), dtype=bool)
    m[0, 0] = m[3, 5] = True
    t = Tile(np.ma.masked_array(arr, m), "float64")
    df = spark.createDataFrame([{"t": t.to_row()}], schema=f"t {TILE_T}")

    def get(method, factor):
        row = df.select(rf.rf_resample("t", factor, method).alias("r")) \
            .head()["r"]
        out = Tile.from_parts(row["cell_type"], row["cols"], row["rows"],
                              bytes(row["cells"]))
        return out.masked()

    # cubic: interpolates exactly at 1:1 sample points away from NoData,
    # upsample shape, NoData spreads to touched taps
    up = get("cubic_convolution", 2)
    assert up.shape == (16, 16)
    assert up.mask.any() and not up.mask.all()
    # interior agreement: factor-1 cubic == identity where no NoData taps
    ident = get("cubic", 1)
    ok = ~np.ma.getmaskarray(ident)
    np.testing.assert_allclose(np.asarray(ident)[ok], arr[ok], atol=1e-9)

    # aggregate methods vs per-block numpy oracles (2x2 blocks)
    v = np.ma.masked_array(arr, m)
    blocks = {}
    for name, fn in [("average", np.ma.mean), ("sum", np.ma.sum),
                     ("min", np.ma.min), ("max", np.ma.max),
                     ("median", np.ma.median)]:
        exp = np.zeros((4, 4))
        for i in range(4):
            for j in range(4):
                exp[i, j] = fn(v[2*i:2*i+2, 2*j:2*j+2])
        got = get(name, 0.5)
        np.testing.assert_allclose(np.asarray(got), exp, atol=1e-9,
                                   err_msg=name)
        assert not got.mask.any()

    # mode: build a tile with clear block majorities
    mo = np.array([[1, 1, 2, 3], [1, 4, 3, 3], [5, 5, 6, 6],
                   [5, 7, 6, 8]], dtype="float64")
    dfm = spark.createDataFrame(
        [{"t": Tile(mo, "float64").to_row()}], schema=f"t {TILE_T}")
    row = dfm.select(rf.rf_resample("t", 0.5, "mode").alias("r")).head()["r"]
    got = Tile.from_parts(row["cell_type"], row["cols"], row["rows"],
                          bytes(row["cells"])).masked()
    np.testing.assert_array_equal(np.asarray(got), [[1.0, 3.0], [5.0, 6.0]])

    # all-NoData block -> NoData out
    allnd = np.ma.masked_array(arr, np.ones_like(m))
    dfn = spark.createDataFrame(
        [{"t": Tile(allnd, "float64").to_row()}], schema=f"t {TILE_T}")
    row = dfn.select(rf.rf_resample("t", 0.5, "average").alias("r")).head()["r"]
    gotn = Tile.from_parts(row["cell_type"], row["cols"], row["rows"],
                           bytes(row["cells"])).masked()
    assert np.ma.getmaskarray(gotn).all()

    # median/mode reject non-integer blocks
    import pytest as _pytest
    with _pytest.raises(Exception):
        df.select(rf.rf_resample("t", 0.3, "median").alias("r")).head()


def test_resample_to_tile_target(spark):
    """Reference parity: factor may be a TILE column — resample left to
    the right tile's dims, per-axis factors independent
    (Resample.scala:56-126)."""
    a = Tile(np.arange(16, dtype="float64").reshape(4, 4), "float64")
    tgt = Tile(np.zeros((8, 2)), "float64")   # 2x rows, 0.5x cols
    df = spark.createDataFrame(
        [{"a": a.to_row(), "b": tgt.to_row()}],
        schema=f"a {TILE_T}, b {TILE_T}")
    for method in ("nearest", "bilinear", "cubic_convolution", "average"):
        row = df.select(
            rf.rf_resample("a", F.col("b"), method).alias("r")).head()["r"]
        assert (row["rows"], row["cols"]) == (8, 2), method
    # nearest value check: col index maps 0,1 -> src cols 0,2
    row = df.select(rf.rf_resample("a", F.col("b"), "nearest").alias("r")) \
        .head()["r"]
    out = Tile.from_parts(row["cell_type"], row["cols"], row["rows"],
                          bytes(row["cells"]))
    src = np.arange(16, dtype="float64").reshape(4, 4)
    ri = np.minimum((np.arange(8) / 2.0).astype(int), 3)
    ci = np.minimum((np.arange(2) * 2.0).astype(int), 3)
    np.testing.assert_array_equal(np.asarray(out.cells), src[np.ix_(ri, ci)])
