"""NoData handling — the reference's nodata-handling.pymd workflow
(`python/docs/nodata-handling.pymd`): cell types and their NoData
semantics, NoData propagation through local algebra, changing a tile's
NoData via user-defined cell types, mixed-cell-type promotion, and
NoData in aggregation.

Run: python examples/nodata_handling.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


def main(spark=None):
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark.tile import CellType, Tile

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session

        spark = create_rf_spark_session(master="local[4]",
                                        app_name="nodata-example")

    # --- cell types and their NoData ----------------------------------
    ctors = [CellType.bool(), CellType.int8(), CellType.uint8(),
             CellType.int16(), CellType.uint16(), CellType.int32(),
             CellType.float32(), CellType.float64()]
    assert [c.cell_type_name for c in ctors] == [
        "bool", "int8", "uint8", "int16", "uint16", "int32",
        "float32", "float64"]
    # 'raw' types carry no NoData: every cell is a valid observation
    raw = CellType("uint16raw")
    assert not raw.is_floating_point() and not raw.has_no_data()
    # the plain integral types designate a sentinel (uint16 -> 0)
    ct = CellType("uint16")
    assert ct.has_no_data() and ct.no_data_value() == 0
    # user-defined NoData renames the type
    assert CellType.uint16().with_no_data_value(99).cell_type_name == \
        "uint16ud99"
    # floats default to NaN, overridable
    assert np.isnan(CellType.float32().no_data_value())
    assert CellType.float32().with_no_data_value(-99.9).no_data_value() \
        == -99.9

    # --- NoData and local arithmetic ----------------------------------
    # x: left half 0, right half 1; y: all zeros
    n = 100
    xa = np.zeros((n, n), dtype="int16")
    xa[:, n // 2:] = 1
    x = Tile(xa, "int16")
    y = Tile(np.zeros((n, n), dtype="int16"), "int16")
    df = spark.createDataFrame([{"x": x.to_row(), "y": y.to_row()}],
                               schema=f"x {TILE_T}, y {TILE_T}")
    # mask the 1s to NoData, then add: Data + NoData = NoData
    masked = (df.withColumn("x_nd", rf.rf_mask_by_value("x", "x", F.lit(1)))
              .withColumn("x_nd_y_sum", rf.rf_local_add("x_nd", "y")))
    stats = masked.select(
        rf.rf_data_cells("x_nd_y_sum").alias("data"),
        rf.rf_no_data_cells("x_nd_y_sum").alias("nd")).head()
    assert (stats["data"], stats["nd"]) == (n * n // 2, n * n // 2)

    # --- changing a tile's NoData via cell-type conversion ------------
    bands = np.zeros((n, n), dtype="int16")
    for i in range(4):
        bands[:, i * n // 4:(i + 1) * n // 4] = i
    t = Tile(bands, "int16")
    df2 = spark.createDataFrame([{"tile": t.to_row()}],
                                schema=f"tile {TILE_T}")

    def nodata_ct(nd):
        return CellType("uint16").with_no_data_value(nd).cell_type_name

    chained = (df2
               .withColumn("tile_nd_1",
                           rf.rf_convert_cell_type("tile", nodata_ct(1)))
               .withColumn("tile_nd_2",
                           rf.rf_convert_cell_type("tile_nd_1",
                                                   nodata_ct(2))))
    r = chained.select(
        rf.rf_no_data_cells("tile_nd_1").alias("n1"),
        rf.rf_no_data_cells("tile_nd_2").alias("n2")).head()
    # ud1 masks the 1s; converting THAT tile to ud2 additionally masks
    # the 2s while the previously-masked cells stay masked
    assert r["n1"] == n * n // 4
    assert r["n2"] == n * n // 2

    # --- combining tiles of different cell types ----------------------
    fx = Tile(np.ones((n, n)) * 2, CellType.float64())
    iy = Tile(np.ones((n, n)) * 3, CellType.int32())
    df3 = spark.createDataFrame([{"x": fx.to_row(), "y": iy.to_row()}],
                                schema=f"x {TILE_T}, y {TILE_T}")
    kinds = df3.select(
        rf.rf_cell_type("x").alias("cx"),
        rf.rf_cell_type("y").alias("cy"),
        rf.rf_cell_type(rf.rf_local_add("x", "y")).alias("cs")).head()
    # int + float promotes to the float type
    assert kinds["cx"].startswith("float64")
    assert kinds["cs"].startswith("float64")

    # --- NoData in aggregation ----------------------------------------
    agg = chained.select(
        rf.rf_tile_sum("tile").alias("s_all"),
        rf.rf_tile_sum("tile_nd_2").alias("s_masked"),
        rf.rf_tile_mean("tile_nd_2").alias("m_masked")).head()
    # full tile: 2500 cells each of 0,1,2,3
    assert agg["s_all"] == 2500 * (0 + 1 + 2 + 3)
    # masked tile: only the 0s and 3s remain
    assert agg["s_masked"] == 2500 * 3
    assert agg["m_masked"] == 1.5  # (0*2500 + 3*2500) / 5000
    print("nodata_handling example OK")
    if own:
        spark.stop()
    return {"nd_cells": r["n2"], "masked_sum": agg["s_masked"]}


if __name__ == "__main__":
    main()
