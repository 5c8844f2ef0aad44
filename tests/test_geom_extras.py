"""Additional st_* parity functions + reprojected extent aggregate."""

import json

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.geom import core as G


@pytest.fixture(scope="module")
def gdf(spark):
    return spark.createDataFrame([{"id": 1}])


def test_geohash_roundtrip(spark, gdf):
    df = gdf.select(rf.st_point(F.lit(-78.5), F.lit(38.0)).alias("p"))
    gh = df.select(rf.st_geohash("p", 9).alias("gh")).head()["gh"]
    box = df.select(rf.st_envelope(
        rf.st_geom_from_geohash(F.lit(gh))).alias("e")).head()["e"]
    assert box["xmin"] <= -78.5 <= box["xmax"]
    assert box["ymin"] <= 38.0 <= box["ymax"]
    assert (box["xmax"] - box["xmin"]) < 0.001  # 9 chars is ~5m cells


def test_exterior_ring_numpoints_valid(spark, gdf):
    poly = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    df = gdf.select(rf.st_geom_from_wkt(F.lit(poly)).alias("g"))
    row = df.select(
        rf.st_length(rf.st_exterior_ring("g")).alias("len"),
        rf.st_num_points("g").alias("np"),
        rf.st_is_valid("g").alias("v"),
    ).head()
    assert row["len"] == 16.0 and row["np"] == 10 and row["v"]
    bad = gdf.select(rf.st_is_valid(
        rf.st_geom_from_wkt(F.lit("POLYGON ((0 0, 1 0, 0 0))"))).alias("v")).head()["v"]
    assert not bad


def test_length_sphere_and_closest_point(spark, gdf):
    line = "LINESTRING (0 0, 1 0)"
    df = gdf.select(rf.st_geom_from_wkt(F.lit(line)).alias("l"))
    d = df.select(rf.st_length_sphere("l").alias("d")).head()["d"]
    assert abs(d - 111195) < 10  # 1 deg at equator
    cp = df.select(rf.st_as_text(rf.st_closest_point(
        "l", rf.st_point(F.lit(0.9), F.lit(5.0)))).alias("t")).head()["t"]
    assert cp == "POINT (1 0)"


def test_as_geojson(spark, gdf):
    df = gdf.select(rf.st_geom_from_wkt(F.lit("POINT (1.5 2.5)")).alias("g"))
    gj = json.loads(df.select(rf.st_as_geojson("g").alias("j")).head()["j"])
    assert gj == {"type": "Point", "coordinates": [1.5, 2.5]}


def test_agg_reprojected_extent(spark):
    # two UTM-17N extents; aggregate bbox in EPSG:4326 must contain both
    from rasterframes_spark.geom import proj as P

    e1 = P.transform_extent((-78.6, 37.9, -78.5, 38.0), "EPSG:4326", "EPSG:32617")
    e2 = P.transform_extent((-78.4, 38.1, -78.3, 38.2), "EPSG:4326", "EPSG:32617")
    rows = [
        {"extent": dict(zip(["xmin", "ymin", "xmax", "ymax"], e)), "crs": "EPSG:32617"}
        for e in (e1, e2)
    ]
    df = spark.createDataFrame(
        rows, schema="extent struct<xmin:double,ymin:double,xmax:double,ymax:double>, crs string")
    got = df.agg(rf.rf_agg_reprojected_extent("extent", "crs", "EPSG:4326").alias("e")).head()["e"]
    assert got["xmin"] <= -78.6 and got["xmax"] >= -78.3
    assert got["ymin"] <= 37.9 and got["ymax"] >= 38.2


def test_color_ramp_png(spark, gdf):
    from rasterframes_spark.tile import Tile

    t = Tile(np.arange(64, dtype="float64").reshape(8, 8), "float64")
    df = spark.createDataFrame(
        [{"t": t.to_row()}],
        schema="t struct<cell_type:string,cols:int,rows:int,cells:binary>")
    png = df.select(rf.rf_render_color_ramp_png("t", "viridis").alias("p")).head()["p"]
    assert bytes(png)[:8] == b"\x89PNG\r\n\x1a\n"


def test_color_ramp_full_name_registry(spark):
    """All 22 reference ColorRampNames resolve (util/package.scala:156-181)
    and decode to valid PNGs; unknown names raise."""
    import numpy as np
    import pytest as _pytest

    from rasterframes_spark.functions.proj_raster import _ramp_lut
    from rasterframes_spark.sources.png import decode_png
    from rasterframes_spark.tile import Tile

    names = ["BlueToOrange", "LightYellowToOrange", "BlueToRed",
             "GreenToRedOrange", "LightToDarkSunset", "LightToDarkGreen",
             "HeatmapYellowToRed", "HeatmapBlueToYellowToRedSpectrum",
             "HeatmapDarkRedToYellowWhite",
             "HeatmapLightPurpleToDarkPurpleToWhite",
             "ClassificationBoldLandUse", "ClassificationMutedTerrain",
             "Magma", "Inferno", "Plasma", "Viridis",
             "Greyscale2", "Greyscale8", "Greyscale32", "Greyscale64",
             "Greyscale128", "Greyscale256"]
    for n in names:
        assert _ramp_lut(n).shape == (256, 3), n
    t = Tile(np.arange(64, dtype="float64").reshape(8, 8), "float64")
    df = spark.createDataFrame(
        [{"t": t.to_row()}],
        schema="t struct<cell_type:string,cols:int,rows:int,cells:binary>")
    png = df.select(
        rf.rf_render_color_ramp_png("t", "BlueToOrange").alias("p")
    ).head()["p"]
    arr = decode_png(bytes(png))
    assert arr.shape[:2] == (8, 8)
    with _pytest.raises(ValueError):
        _ramp_lut("NotARamp")


def test_rasterize_column_dims(spark):
    """rf_rasterize with COLUMN cols/rows (reference num_cols_col
    signature) — per-row tile sizes."""
    import numpy as np

    from rasterframes_spark.tile import Tile

    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 4, 4),
         (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 8, 2)],
        "id int, wkt string, nc int, nr int") \
        .select("id", rf.st_geom_from_wkt("wkt").alias("g"),
                F.struct(F.lit(0.0).alias("xmin"), F.lit(0.0).alias("ymin"),
                         F.lit(10.0).alias("xmax"),
                         F.lit(10.0).alias("ymax")).alias("ext"),
                "nc", "nr")
    rows = {r["id"]: r["t"] for r in df.select(
        "id", rf.rf_rasterize("g", "ext", 7, F.col("nc"), F.col("nr"))
        .alias("t")).collect()}
    assert (rows[1]["cols"], rows[1]["rows"]) == (4, 4)
    assert (rows[2]["cols"], rows[2]["rows"]) == (8, 2)
    t = Tile.from_parts(rows[2]["cell_type"], 8, 2, bytes(rows[2]["cells"]))
    assert np.asarray(t.cells).shape == (2, 8)
    assert np.all(np.asarray(t.cells) == 7)  # polygon covers the extent
