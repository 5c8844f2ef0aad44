"""In-memory raster source (ProjectedRasterMethods.toDF analog)."""

import numpy as np

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark import sources as S


def test_raster_from_array_chunks(spark, rng):
    arr = rng.integers(1, 1000, (100, 160)).astype("uint16")
    df = S.raster_from_array(spark, arr, (0.0, 0.0, 16.0, 10.0),
                             tile_dimensions=(64, 64))
    # 160x100 in 64x64 chunks -> 3x2 grid
    assert df.count() == 6
    total = df.agg(F.sum(rf.rf_tile_sum("tile"))).head()[0]
    assert total == float(arr.sum())
    # extents tile the full raster
    agg = df.agg(rf.rf_agg_extent("extent").alias("e")).head()["e"]
    assert (agg["xmin"], agg["ymin"], agg["xmax"], agg["ymax"]) == (0.0, 0.0, 16.0, 10.0)
    # spatial keys unique
    keys = {(r["spatial_key"]["col"], r["spatial_key"]["row"]) for r in df.collect()}
    assert keys == {(c, r) for c in range(3) for r in range(2)}


def test_raster_from_array_nodata(spark):
    arr = np.array([[0, 5], [7, 0]], dtype="uint16")  # 0 == ND for uint16
    df = S.raster_from_array(spark, arr, (0, 0, 2, 2), tile_dimensions=(2, 2))
    assert df.select(rf.rf_data_cells("tile")).head()[0] == 2
    assert df.select(rf.rf_no_data_cells("tile")).head()[0] == 2
