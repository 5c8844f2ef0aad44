"""Full SQL surface: st_* long-tail + tile aggregates callable from
spark.sql (reference registers everything in FunctionRegistry,
core/.../expressions/package.scala:89-189)."""

import numpy as np
import pytest

from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


@pytest.fixture(scope="module")
def sql_tables(spark):
    rows = [{"grp": i % 2, "tile": Tile(
        np.ma.masked_array(np.full((4, 4), float(i + 1)),
                           mask=(np.arange(16).reshape(4, 4) == 0) if i == 0 else False),
        "float64").to_row()} for i in range(6)]
    spark.createDataFrame(rows, schema=f"grp int, tile {TILE_T}") \
        .createOrReplaceTempView("sql_tiles")
    spark.createDataFrame([
        {"wkt": "LINESTRING (0 0, 1 0, 1 1)",
         "poly": "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))",
         "mg": "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"},
    ]).createOrReplaceTempView("sql_geoms")
    return True


def test_sql_longtail_st(spark, sql_tables):
    r = spark.sql("""
        select st_asText(st_pointN(st_lineFromText(wkt), 2)) as p2,
               st_numGeometries(st_geomFromWKT(mg)) as ng,
               st_asText(st_geometryN(st_geomFromWKT(mg), 2)) as g2,
               st_dimension(st_geomFromWKT(poly)) as dim,
               st_isRing(st_exteriorRing(st_geomFromWKT(poly))) as ring,
               st_isClosed(st_lineFromText(wkt)) as closed,
               st_area(st_makePolygon(st_lineFromText(wkt))) as a,
               st_area(st_makeBBox(0, 0, 3, 4)) as bba,
               st_asText(st_interiorRingN(st_geomFromWKT(poly), 1)) as ir,
               st_geometryType(st_boundary(st_geomFromWKT(poly))) as btype,
               st_castToPoint(st_lineFromText(wkt)) as badcast,
               st_asText(st_translate(st_geomFromWKT('POINT (1 2)'), 2, 3)) as tr,
               st_x(st_pointFromGeoHash(st_geoHash(st_geomFromWKT('POINT (10 20)'), 12))) as ghx,
               st_area(st_geomFromGeoHash('u0qj5', 10)) as gha10,
               st_area(st_geomFromGeoHash('u0qj5')) as gha,
               st_aggregateDistanceSphere(array(st_makePoint(0.0, 0.0), st_makePoint(1.0, 0.0))) as ad
        from sql_geoms
    """).head()
    assert r["p2"] == "POINT (1 0)"
    assert r["ng"] == 2
    assert r["g2"] == "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"
    assert r["dim"] == 2
    assert r["ring"] and not r["closed"]
    assert abs(r["a"] - 0.5) < 1e-12
    assert r["bba"] == 12.0
    assert r["ir"].startswith("LINESTRING (0.5 0.5")
    assert r["btype"] == "MultiLineString"
    assert r["badcast"] is None
    assert r["tr"] == "POINT (3 5)"
    assert abs(r["ghx"] - 10.0) < 1e-6
    # 2-arg geoHash form truncates to the requested bit precision
    assert r["gha10"] > r["gha"] > 0
    assert abs(r["ad"] - 111195.0802335329) < 1e-3


def test_sql_tile_aggregates(spark, sql_tables):
    rows = spark.sql("""
        select grp, rf_agg_mean(tile) as m, rf_agg_data_cells(tile) as dc,
               rf_agg_no_data_cells(tile) as ndc,
               rf_agg_min(tile) as mn, rf_agg_max(tile) as mx,
               rf_agg_variance(tile) as v
        from sql_tiles group by grp order by grp
    """).collect()
    # grp 0: tiles 1,3,5 (tile 1 has one masked cell) -> 47 data cells
    g0 = rows[0]
    assert g0["dc"] == 47 and g0["ndc"] == 1
    assert g0["mn"] == 1.0 and g0["mx"] == 5.0
    exp = (15 * 1.0 + 16 * 3.0 + 16 * 5.0) / 47
    assert abs(g0["m"] - exp) < 1e-12
    exp_var = (15 * 1.0 + 16 * 9.0 + 16 * 25.0) / 47 - exp * exp
    assert abs(g0["v"] - exp_var) < 1e-9
    g1 = rows[1]
    assert g1["dc"] == 48 and g1["ndc"] == 0
    assert g1["m"] == (2.0 + 4.0 + 6.0) / 3


def test_sql_matches_dataframe_api(spark, sql_tables):
    import rasterframes_spark as rf
    from pyspark.sql import functions as F

    df = spark.table("sql_tiles")
    api = df.groupBy("grp").agg(rf.rf_agg_mean("tile").alias("m")).orderBy("grp").collect()
    sql = spark.sql(
        "select grp, rf_agg_mean(tile) as m from sql_tiles group by grp order by grp"
    ).collect()
    for a, s in zip(api, sql):
        assert abs(a["m"] - s["m"]) < 1e-12


def test_reference_export_surface_complete(spark):
    """Every rf_*/st_* name the reference's Python API exports
    (python/pyrasterframes/rasterfunctions.py) resolves in this package,
    either verbatim or in snake_case."""
    import rasterframes_spark as rf
    ref_names = [
        # generated from the reference export list; kept inline so the test
        # is self-contained (the reference tree isn't present at CI time)
        "rf_agg_local_stats", "rf_agg_local_min", "rf_agg_local_max",
        "rf_agg_local_mean", "rf_agg_local_data_cells",
        "rf_agg_local_no_data_cells", "rf_assemble_tile", "rf_cell_types",
        "rf_explode_tiles", "rf_explode_tiles_sample", "rf_focal_std_dev",
        "rf_moransI", "rf_local_add_double", "rf_local_add_int",
        "rf_local_divide_double", "rf_local_divide_int",
        "rf_local_equal_double", "rf_local_equal_int",
        "rf_local_greater_double", "rf_local_greater_equal_double",
        "rf_local_greater_equal_int", "rf_local_greater_int",
        "rf_local_less_double", "rf_local_less_equal_double",
        "rf_local_less_equal_int", "rf_local_less_int",
        "rf_local_multiply_double", "rf_local_multiply_int",
        "rf_local_subtract_double", "rf_local_subtract_int",
        "rf_local_unequal_double", "rf_local_unequal_int",
    ]
    for n in ref_names:
        assert hasattr(rf, n), n

    # spot-check the typed overloads actually compute
    import numpy as np
    from rasterframes_spark.tile import Tile
    t = Tile(np.arange(16, dtype="float64").reshape(4, 4), "float64")
    df = spark.createDataFrame(
        [{"t": t.to_row()}],
        schema="t struct<cell_type:string,cols:int,rows:int,cells:binary>")
    row = df.select(
        rf.rf_tile_sum(rf.rf_local_add_int("t", 5)).alias("a"),
        rf.rf_tile_sum(rf.rf_local_multiply_double("t", 2.0)).alias("m"),
    ).head()
    assert row["a"] == float(np.arange(16).sum() + 5 * 16)
    assert row["m"] == float(np.arange(16).sum() * 2)
    assert "uint16" in rf.rf_cell_types()
