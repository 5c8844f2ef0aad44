"""Fluent DataFrame methods (the reference's monkey-patched surface —
pyrasterframes __init__.py:341-344, rf_types.py:79-180)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"
EXT_T = "struct<xmin:double,ymin:double,xmax:double,ymax:double>"


@pytest.fixture(scope="module")
def layer(spark):
    rng = np.random.default_rng(21)
    rows = []
    for gy in range(2):
        for gx in range(3):
            t = Tile((np.ones((4, 4)) * (gy * 3 + gx)).astype("int32"), "int32raw")
            rows.append({
                "spatial_key": {"col": gx, "row": gy},
                "tile": t.to_row(),
                "extent": {"xmin": gx * 1.0, "ymin": gy * 1.0,
                           "xmax": gx + 1.0, "ymax": gy + 1.0},
                "crs": "EPSG:4326",
            })
    return spark.createDataFrame(
        rows, schema=(f"spatial_key struct<col:int,row:int>, tile {TILE_T}, "
                      f"extent {EXT_T}, crs string"))


def test_tile_columns_and_keys(spark, layer):
    cols = layer.tile_columns()
    assert len(cols) == 1
    assert layer.select(cols[0]).columns == ["tile"]
    assert layer.select(layer.spatial_key_column()).count() == 6
    with pytest.raises(ValueError):
        layer.temporal_key_column()
    assert layer.as_layer() is layer
    with pytest.raises(ValueError):
        layer.drop("spatial_key").as_layer()


def test_with_bounds_center(spark, layer):
    from rasterframes_spark.geom.functions import st_x, st_y, st_as_text
    b = layer.with_bounds().with_center()
    row = b.where((F.col("spatial_key.col") == 2)
                  & (F.col("spatial_key.row") == 1)).select(
        st_as_text("bounds").alias("wkt"),
        st_x("center").alias("cx"), st_y("center").alias("cy")).head()
    assert row["cx"] == 2.5 and row["cy"] == 1.5
    assert row["wkt"].startswith("POLYGON")
    # lat/lng form: already EPSG:4326 -> same coordinates
    c = layer.with_center_lat_lng().select(
        st_x("center").alias("x"), st_y("center").alias("y")).collect()
    assert {(r["x"], r["y"]) for r in c} == {
        (gx + 0.5, gy + 0.5) for gx in range(3) for gy in range(2)}


def test_fluent_joins_and_index(spark, layer):
    other = layer.select("spatial_key", F.col("tile").alias("tile_b"))
    j = layer.spatial_join(other)
    assert j.count() == 6
    idx = layer.with_spatial_index()
    assert "spatial_index" in idx.columns
    rj = layer.raster_join(layer.select(
        F.col("tile").alias("t2"), "extent", "crs"), left_tile="tile",
        right_tiles=["t2"])
    assert rj.count() == 6


def test_to_raster_mosaic(spark, layer):
    ras = layer.to_int_raster("tile", cols=12, rows=8)
    assert ras.shape == (8, 12) and ras.dtype == np.int32
    # each 4x4 block is the constant gy*3+gx
    for gy in range(2):
        for gx in range(3):
            assert (ras[gy*4:(gy+1)*4, gx*4:(gx+1)*4] == gy * 3 + gx).all()
    d = layer.to_double_raster("tile", cols=12, rows=8)
    assert d.dtype == np.float64 and (d == ras).all()


def test_reader_writer_aliases(spark, layer, tmp_path):
    """spark.read.geotrellis / geotrellis_catalog / df.write-style aliases
    (the reference's DataFrameReader/Writer patches)."""
    from rasterframes_spark import sources as S

    base = tmp_path / "catalog"
    base.mkdir()
    S.write_tile_layer(layer, str(base / "layer_a"), num_partitions=2)
    S.write_tile_layer(layer, str(base / "layer_b"), num_partitions=2)

    back = spark.read.geotrellis(str(base / "layer_a"))
    assert back.count() == 6
    assert "spatial_index" in back.columns

    cat = spark.read.geotrellis_catalog(str(base))
    got = {(r["layer"], r["tile_count"]) for r in cat.collect()}
    assert got == {("layer_a", 6), ("layer_b", 6)}
    assert all(r["crs"] == "EPSG:4326" for r in cat.collect())

    # geojson reader alias
    gj = base / "f.geojson"
    gj.write_text('{"type":"FeatureCollection","features":[{"type":"Feature",'
                  '"geometry":{"type":"Point","coordinates":[1.0,2.0]},'
                  '"properties":{"name":"p1"}}]}')
    pts = spark.read.geojson(str(gj))
    assert pts.count() == 1


def test_fluent_st_join(spark):
    from rasterframes_spark.geom import functions as GFn

    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 50.0, 50.0)], "pid int, x double, y double") \
        .select("pid", GFn.st_point("x", "y").alias("geometry"))
    poly = spark.createDataFrame(
        [(7, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")],
        "zid int, wkt string") \
        .select("zid", GFn.st_geom_from_wkt("wkt").alias("geometry"))
    out = pts.st_join(poly, predicate="within", grid_size=10.0).collect()
    assert [(r["pid"], r["zid"]) for r in out] == [(1, 7)]
    knn = pts.st_knn_join(poly, 1, 100.0, grid_size=50.0).collect()
    assert {r["pid"] for r in knn} == {1, 2}


def test_ipython_display_helpers(spark):
    """Notebook display module (reference rf_ipython.py counterpart):
    tile PNG round-trips through the own codec, HTML embeds a data URI,
    DataFrame html/markdown render tiles inline; register_formatters is
    a safe no-op without IPython."""
    import numpy as np

    from rasterframes_spark import ipython as ipy
    from rasterframes_spark.sources.png import decode_png
    from rasterframes_spark.tile import Tile

    t = Tile(np.ma.masked_array(
        np.arange(256, dtype="float64").reshape(16, 16),
        mask=np.arange(256).reshape(16, 16) == 5), "float64")
    png = ipy.tile_to_png(t)
    arr = decode_png(png)
    assert arr.shape == (16, 16, 3)
    html = ipy.tile_to_html(t, width=32)
    assert html.startswith('<img src="data:image/png;base64,')
    assert 'width="32"' in html
    assert ipy.binary_to_html(png).startswith("<img ")
    assert ipy.binary_to_html(b"notpng") == b"notpng"

    TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"
    df = spark.createDataFrame(
        [{"name": "a", "tile": t.to_row()}], schema=f"name string, tile {TILE_T}")
    h = ipy.spark_df_to_html(df, num_rows=1)
    assert "<table>" in h and "data:image/png" in h and "<th>name</th>" in h
    md = ipy.spark_df_to_markdown(df, num_rows=1)
    assert "| name | tile |" in md and "Tile(16x16, float64)" in md

    import pytest as _p
    with _p.raises(ValueError):
        ipy.tile_to_png(t, lower_percentile=99, upper_percentile=1)
    # no IPython in this environment: graceful False
    assert ipy.register_formatters() is False


def test_fluent_warc_and_netcdf_readers(spark, tmp_path):
    import numpy as np

    from rasterframes_spark.sources.netcdf import write_netcdf
    from rasterframes_spark.sources.warc import write_warc

    (tmp_path / "x.warc.gz").write_bytes(write_warc(
        [({"WARC-Type": "response", "WARC-Target-URI": "https://a.b/c"},
          b"HTTP/1.1 200 OK\r\n\r\n<p>hello fluent.</p>")]))
    rows = spark.read.warc(str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0].url == "https://a.b/c"

    p = tmp_path / "t.nc"
    p.write_bytes(write_netcdf(
        {"v": (("y", "x"), np.arange(12.0).reshape(3, 4))},
        dims={"y": 3, "x": 4}))
    assert spark.read.netcdf(str(p), "v").count() == 1
