"""Raster time series — the reference's time-series workflow
(`python/docs/time-series.pymd`): a temporal stack of scenes, grouped by
calendar period, composited per-pixel, then reduced to a per-period
scalar trend.

Here: 12 monthly scenes of a seasonally-varying field -> per-quarter
cell-wise mean composite (`agg_local(..., group_cols=['quarter'])`, one
shuffle) -> per-quarter mean (pure built-in combine).

Run: python examples/time_series.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    import numpy as np

    import rasterframes_spark as rf
    from rasterframes_spark.functions.aggregates import agg_local
    from rasterframes_spark.tile import Tile
    from pyspark.sql import functions as F

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="time-series-example")

    # 12 monthly scenes: base gradient + seasonal sine + per-month noise
    rng = np.random.default_rng(0)
    base = np.linspace(0.2, 0.8, 32 * 32).reshape(32, 32)
    TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"
    rows = []
    for m in range(1, 13):
        seasonal = 0.2 * np.sin(2 * np.pi * (m - 1) / 12.0)
        arr = base + seasonal + rng.normal(0, 0.01, base.shape)
        rows.append({"month": m, "quarter": (m - 1) // 3 + 1,
                     "ndvi": Tile(arr.astype("float64"), "float64").to_row()})
    scenes = spark.createDataFrame(
        rows, schema=f"month int, quarter int, ndvi {TILE_T}")

    # per-quarter per-pixel mean composite (single shuffle on quarter)
    composites = agg_local(scenes, "ndvi", which="mean",
                           group_cols=["quarter"])

    # reduce each composite to its scene-wide mean -> the seasonal trend
    trend = (composites
             .select("quarter", rf.rf_tile_mean("tile").alias("mean_ndvi"))
             .orderBy("quarter"))
    out = [(r["quarter"], float(r["mean_ndvi"])) for r in trend.collect()]
    for qtr, m in out:
        print(f"Q{qtr}: mean NDVI {m:.4f}")
    if own:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
