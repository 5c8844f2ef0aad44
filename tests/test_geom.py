"""Geometry core + st_* surface vs hand-computed oracles — mirrors
GeometryFunctionsSpec / ReprojectGeometrySpec (SURVEY §5)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.geom import core as G
from rasterframes_spark.geom import proj as P
from rasterframes_spark.geom import sfc


# -- pure core ----------------------------------------------------------------


def test_wkb_roundtrip():
    geoms = [
        ("Point", (1.5, -2.5)),
        ("LineString", [(0, 0), (1, 1), (2, 0)]),
        ("Polygon", [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                     [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]]),
        ("MultiPoint", [(0, 0), (1, 1)]),
        ("MultiLineString", [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]),
        ("MultiPolygon", [[[(0, 0), (1, 0), (1, 1), (0, 0)]],
                          [[(5, 5), (6, 5), (6, 6), (5, 5)]]]),
    ]
    for g in geoms:
        assert G.wkb_loads(G.wkb_dumps(g)) == g


def test_wkt_roundtrip():
    for wkt in [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    ]:
        g = G.wkt_loads(wkt)
        assert G.wkt_loads(G.wkt_dumps(g)) == g


def test_area_with_hole():
    poly = ("Polygon", [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                        [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]])
    assert G.area(poly) == 15.0


def test_length_and_centroid():
    line = ("LineString", [(0, 0), (3, 4)])
    assert G.length(line) == 5.0
    assert G.centroid(line) == (1.5, 2.0)
    box = G.box_polygon(0, 0, 2, 2)
    assert G.centroid(box) == (1.0, 1.0)


def test_point_in_polygon_with_hole():
    rings = [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
             [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]]
    assert G.point_in_polygon((3, 3), rings)
    assert not G.point_in_polygon((1.5, 1.5), rings)  # inside hole
    assert G.point_in_polygon((0, 0), rings)  # boundary inclusive


def test_intersects_cases():
    a = G.box_polygon(0, 0, 2, 2)
    b = G.box_polygon(1, 1, 3, 3)
    c = G.box_polygon(5, 5, 6, 6)
    assert G.intersects(a, b)
    assert not G.intersects(a, c)
    # containment without boundary crossing
    inner = G.box_polygon(0.5, 0.5, 1.5, 1.5)
    assert G.intersects(a, inner)
    # line crossing polygon
    line = ("LineString", [(-1, 1), (3, 1)])
    assert G.intersects(line, a)
    assert G.intersects(a, line)
    # point
    assert G.intersects(("Point", (1, 1)), a)
    assert not G.intersects(("Point", (9, 9)), a)


def test_contains_within():
    a = G.box_polygon(0, 0, 4, 4)
    inner = G.box_polygon(1, 1, 2, 2)
    assert G.contains(a, inner)
    assert G.within(inner, a)
    assert not G.contains(inner, a)
    assert G.contains(a, ("Point", (2, 2)))


def test_distance():
    a = G.box_polygon(0, 0, 1, 1)
    b = G.box_polygon(4, 0, 5, 1)
    assert G.distance(a, b) == 3.0
    assert G.distance(("Point", (0, 0)), ("Point", (3, 4))) == 5.0
    assert G.distance(("Point", (2, 5)), ("LineString", [(0, 0), (4, 0)])) == 5.0


def test_distance_sphere_equator_degree():
    # 1 degree of longitude at the equator ≈ 111.19 km (R=6371008.8m)
    d = G.distance_sphere((0, 0), (1, 0))
    assert abs(d - 2 * math.pi * 6371008.8 / 360) < 1.0


# -- projection ---------------------------------------------------------------


def test_webmercator_roundtrip():
    lon = np.array([-122.4, 0.0, 151.2])
    lat = np.array([37.8, 0.0, -33.9])
    x, y = P.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
    lon2, lat2 = P.transform_points(x, y, "EPSG:3857", "EPSG:4326")
    assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)
    # known value: lon=180 -> x = pi*R
    x, _ = P.transform_points([180.0], [0.0], "EPSG:4326", "EPSG:3857")
    assert abs(x[0] - math.pi * 6378137.0) < 1e-6


def test_utm_roundtrip_and_known_point():
    # UTM zone 17N: lon=-78.5, lat=38.0 (reference's Elkton VA area)
    e, n = P.transform_points([-78.5], [38.0], "EPSG:4326", "EPSG:32617")
    lon, lat = P.transform_points(e, n, "EPSG:32617", "EPSG:4326")
    assert abs(lon[0] + 78.5) < 1e-7 and abs(lat[0] - 38.0) < 1e-7
    # zone central meridian maps to easting 500000
    e, _ = P.transform_points([-81.0], [38.0], "EPSG:4326", "EPSG:32617")
    assert abs(e[0] - 500000.0) < 1e-6


def test_extent_reproject_contains_corners():
    ext = (-78.6, 37.9, -78.4, 38.1)
    utm = P.transform_extent(ext, "EPSG:4326", "EPSG:32617")
    back = P.transform_extent(utm, "EPSG:32617", "EPSG:4326")
    assert back[0] <= ext[0] and back[1] <= ext[1]
    assert back[2] >= ext[2] and back[3] >= ext[3]


# -- SFC ----------------------------------------------------------------------


def test_z2_ordering_locality():
    # nearby points share high bits; distant points differ
    i1 = sfc.z2_index(np.array([10.0]), np.array([10.0]))[0]
    i2 = sfc.z2_index(np.array([10.001]), np.array([10.001]))[0]
    i3 = sfc.z2_index(np.array([-170.0]), np.array([-80.0]))[0]
    assert abs(int(i1) - int(i2)) < abs(int(i1) - int(i3))


def test_grid_cells_cover():
    cells = sfc.grid_cells(0.5, 0.5, 2.5, 1.5, 1.0)
    assert len(cells) == 3 * 2  # x cells {0,1,2} × y cells {0,1}
    # overlapping extents share at least one cell
    c2 = sfc.grid_cells(2.0, 1.0, 3.0, 2.0, 1.0)
    assert set(cells) & set(c2)


# -- Spark surface ------------------------------------------------------------


@pytest.fixture(scope="module")
def geo_df(spark):
    rows = [
        {"id": 1, "x": 0.0, "y": 0.0, "x2": 3.0, "y2": 4.0},
        {"id": 2, "x": 10.0, "y": 10.0, "x2": 10.0, "y2": 11.0},
    ]
    return spark.createDataFrame(rows)


def test_st_point_distance_spark(spark, geo_df):
    out = geo_df.select(
        "id",
        rf.st_distance(rf.st_point("x", "y"), rf.st_point("x2", "y2")).alias("d"),
    ).orderBy("id").collect()
    assert out[0]["d"] == 5.0 and out[1]["d"] == 1.0


def test_st_predicates_spark(spark, geo_df):
    df = geo_df.select(
        "id",
        rf.st_geom_from_wkt(F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")).alias("poly"),
        rf.st_point("x", "y").alias("pt"),
    )
    got = df.select("id", rf.st_intersects("poly", "pt").alias("i"),
                    rf.st_contains("poly", "pt").alias("c"),
                    rf.st_covers("poly", "pt").alias("cv")).orderBy("id").collect()
    # (0,0) is a corner: intersected and covered but NOT strictly contained
    assert got[0]["i"] and got[0]["cv"] and not got[0]["c"]
    assert not got[1]["i"] and not got[1]["c"] and not got[1]["cv"]


def test_st_area_centroid_translate_spark(spark, geo_df):
    df = geo_df.limit(1).select(
        rf.st_geom_from_wkt(F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")).alias("g")
    )
    row = df.select(
        rf.st_area("g").alias("a"),
        rf.st_x(rf.st_centroid("g")).alias("cx"),
        rf.st_area(rf.st_translate("g", 5, 5)).alias("a2"),
        rf.st_as_text("g").alias("wkt"),
    ).head()
    assert row["a"] == 4.0 and row["cx"] == 1.0 and row["a2"] == 4.0
    assert row["wkt"].startswith("POLYGON")


def test_st_reproject_spark(spark, geo_df):
    df = geo_df.limit(1).select(rf.st_point(F.lit(-78.5), F.lit(38.0)).alias("p"))
    row = df.select(
        rf.st_x(rf.st_reproject("p", "EPSG:4326", "EPSG:32617")).alias("e")
    ).head()
    assert 715000 < row["e"] < 725000  # 2.5° east of zone-17 CM ≈ 719.5 km


def test_extent_geometry_roundtrip_spark(spark, geo_df):
    df = geo_df.limit(1).select(
        rf.extent_struct(F.lit(0), F.lit(0), F.lit(2), F.lit(3)).alias("e")
    )
    row = df.select(
        rf.st_area(rf.st_geometry("e")).alias("a"),
        rf.st_envelope(rf.st_geometry("e")).alias("env"),
    ).head()
    assert row["a"] == 6.0
    assert row["env"]["xmax"] == 2.0 and row["env"]["ymax"] == 3.0


def test_sfc_indexes_spark(spark, geo_df):
    df = geo_df.select(
        "id",
        rf.rf_z2_index("x", "y").alias("z2"),
        rf.rf_xz2_index(rf.extent_struct("x", "y", "x2", "y2")).alias("xz2"),
        rf.rf_spatial_grid_cells(rf.extent_struct("x", "y", "x2", "y2"), 1.0).alias("cells"),
    ).collect()
    assert all(r["z2"] is not None and r["xz2"] is not None for r in df)
    assert len(df[0]["cells"]) == 4 * 5


# -- DE-9IM relate engine (geom/relate.py; SpatialRelation.scala:74-114) ------


def test_relate_matrix_canonical():
    from rasterframes_spark.geom import relate as R
    A = G.box_polygon(0, 0, 2, 2)
    assert R.relate_matrix(A, G.box_polygon(1, 1, 3, 3)) == "212101212"  # overlap
    assert R.relate_matrix(A, G.box_polygon(2, 0, 4, 2)) == "FF2F11212"  # shared edge
    assert R.relate_matrix(A, G.box_polygon(2, 2, 3, 3)) == "FF2F01212"  # corner
    assert R.relate_matrix(A, G.box_polygon(0, 0, 2, 2)) == "2FFF1FFF2"  # equal


def test_covers_vs_contains_boundary():
    from rasterframes_spark.geom import relate as R
    A = G.box_polygon(0, 0, 2, 2)
    on_edge = ("Point", (1.0, 0.0))
    inside = ("Point", (1.0, 1.0))
    boundary_line = ("LineString", [(0.0, 0.0), (2.0, 0.0)])
    assert R.covers(A, on_edge) and not R.contains(A, on_edge)
    assert R.covers(A, inside) and R.contains(A, inside)
    assert R.covers(A, boundary_line) and not R.contains(A, boundary_line)
    assert R.touches(A, on_edge) and R.touches(on_edge, A)


def test_crosses_overlaps_touches_lines():
    from rasterframes_spark.geom import relate as R
    L1 = ("LineString", [(0.0, 0.0), (2.0, 0.0)])
    assert R.crosses(L1, ("LineString", [(1.0, -1.0), (1.0, 1.0)]))
    assert R.overlaps(L1, ("LineString", [(1.0, 0.0), (3.0, 0.0)]))
    # endpoint-on-interior: touches, not crosses
    assert R.touches(L1, ("LineString", [(1.0, 0.0), (1.0, 5.0)]))
    assert not R.crosses(L1, ("LineString", [(1.0, 0.0), (1.0, 5.0)]))
    # line through a polygon
    A = G.box_polygon(0, 0, 2, 2)
    cut = ("LineString", [(-1.0, 1.0), (3.0, 1.0)])
    assert R.crosses(cut, A) and R.crosses(A, cut)
    assert not R.crosses(("LineString", [(0.5, 1.0), (1.5, 1.0)]), A)


def test_relate_with_holes():
    from rasterframes_spark.geom import relate as R
    H = ("Polygon", [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                     [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]])
    in_hole = G.box_polygon(1.5, 1.5, 2.5, 2.5)
    assert not R.contains(H, in_hole) and R.relate_matrix(H, in_hole)[0] == "F"
    spanning = G.box_polygon(0.5, 0.5, 3.5, 3.5)  # hole pokes into it
    assert R.overlaps(H, spanning) and not R.contains(H, spanning)
    ring_band = G.box_polygon(0.25, 0.25, 0.75, 0.75)  # inside the band
    assert R.contains(H, ring_band)


def test_st_relate_spark(spark, geo_df):
    df = geo_df.limit(1).select(
        rf.st_geom_from_wkt(F.lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")).alias("a"),
        rf.st_geom_from_wkt(F.lit("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")).alias("b"),
        rf.st_geom_from_wkt(F.lit("POINT (1 0)")).alias("p"),
    )
    row = df.select(
        rf.st_relate("a", "b").alias("m"),
        rf.st_overlaps("a", "b").alias("o"),
        rf.st_touches("a", "p").alias("t"),
        rf.st_covers("a", "p").alias("cv"),
        rf.st_contains("a", "p").alias("ct"),
        rf.st_relate_bool("a", "b", "T*T***T**").alias("rb"),
    ).first()
    assert row["m"] == "212101212" and row["o"] and row["t"]
    assert row["cv"] and not row["ct"] and row["rb"]


def test_st_predicates_sql(spark, geo_df):
    geo_df.limit(1).createOrReplaceTempView("one_row")
    row = spark.sql("""
        select st_touches(st_geom_from_wkt('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
                          st_geom_from_wkt('POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))')) as t,
               st_crosses(st_geom_from_wkt('LINESTRING (-1 0.5, 2 0.5)'),
                          st_geom_from_wkt('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) as x,
               st_relate(st_geom_from_wkt('POINT (5 5)'),
                         st_geom_from_wkt('POINT (5 5)')) as m
        from one_row""").first()
    assert row["t"] and row["x"] and row["m"] == "0FFFFFFF2"
