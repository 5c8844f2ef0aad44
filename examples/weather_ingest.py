"""Weather-data ingest — GRIB through the engine, batch and streaming.

The reference reads GRIB only through its GDAL branch
(`core/src/main/scala/org/locationtech/rasterframes/ref/RFRasterSource.scala:105-158`);
here both editions decode natively (r10), so a forecast archive works
like any other raster catalog:

1. batch: GRIB2 (spatial-differencing packed, the NCEP default) and
   legacy GRIB1 files in ONE `read_raster` catalog — mixed editions,
   same tile rows, `rf_*` aggregates downstream;
2. streaming: the same files landing in a watched directory flow
   through `read_raster_stream` (mixed formats per payload, corrupt
   uploads skipped) into a checkpointed parquet sink.

Run: python examples/weather_ingest.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark.sources.grib1 import write_grib1
    from rasterframes_spark.sources.grib2 import write_grib2
    from rasterframes_spark.sources.raster_reader import (read_raster,
                                                          realize_tiles)
    from rasterframes_spark.streaming import read_raster_stream

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session

        spark = create_rf_spark_session(master="local[4]",
                                        app_name="weather-example")

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(8)
    ext = (-110.0, 30.0, -94.0, 46.0)       # CONUS-ish 16x16-degree box
    # a GFS-style stack: temperature + wind speed, 0.5-degree grid
    t2m = rng.normal(288.0, 8.0, size=(32, 32))
    wind = np.abs(rng.normal(6.0, 3.0, size=(32, 32)))
    with open(f"{d}/gfs.grib2", "wb") as f:
        f.write(write_grib2([t2m, wind], ext, nbits=16, dscale=2,
                            packing="complex_diff",
                            params=[(0, 0), (2, 1)]))
    # a legacy archive member (edition 1, IBM hex-float reference)
    with open(f"{d}/reanalysis.grib", "wb") as f:
        f.write(write_grib1([t2m], ext, nbits=16, dscale=2))

    # ---- batch: both editions in one catalog (band 0 = t2m in each)
    df = (read_raster(spark, [f"{d}/gfs.grib2", f"{d}/reanalysis.grib"],
                      tile_dimensions=(32, 32))
          .withColumn("tile", realize_tiles(F.col("tile_ref"))))
    per_file = (df.groupBy("path")
                .agg(F.sum(rf.rf_tile_sum("tile")).alias("total"))
                .collect())
    batch_rows = df.count()
    # the GRIB2 stack's second field (wind) as its own tile column
    gfs = (read_raster(spark, [f"{d}/gfs.grib2"], band_indexes=(0, 1),
                       tile_dimensions=(32, 32)))
    tile_cols = [c for c in gfs.columns if c.startswith("tile")]
    bands = len(tile_cols)

    # ---- streaming: the same directory as a continuous feed
    with open(f"{d}/station_notes.txt", "w") as f:
        f.write("not a raster - must be skipped, not crash the query")
    out_dir, ckpt = tempfile.mkdtemp(), tempfile.mkdtemp()
    stream = read_raster_stream(spark, d, tile_dimensions=(32, 32))
    q = (stream.select("path", rf.rf_tile_mean("tile").alias("mean"))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.read.parquet(out_dir).count()

    # ---- streaming, multi-band (r11): bands= mirrors the batch
    # reader's band_indexes — the GFS feed serves t2m AND wind per
    # chunk row; the pattern keeps the 1-band edition-1 file (and the
    # sidecar) out of this query
    out2, ck2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    q2 = (read_raster_stream(spark, d, tile_dimensions=(32, 32),
                             pattern="*.grib2", bands=(0, 1))
          .select("path", rf.rf_tile_mean("tile_b0").alias("t2m_mean"),
                  rf.rf_tile_mean("tile_b1").alias("wind_mean"))
          .writeStream.format("parquet").option("path", out2)
          .option("checkpointLocation", ck2)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    streamed_mb = spark.read.parquet(out2).count()

    if own:
        spark.stop()
    return {"batch_rows": batch_rows, "files": len(per_file),
            "bands": bands, "streamed_rows": streamed,
            "streamed_multiband_rows": streamed_mb}


if __name__ == "__main__":
    out = main()
    print(out)
