"""NDVI workflow — the reference's flagship docs example
(python/docs/getting-started.pymd analog): read a two-band scene, compute
the normalized difference, aggregate statistics, render a PNG.

Run: python examples/ndvi.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    import rasterframes_spark as rf
    from rasterframes_spark import sources as S
    from rasterframes_spark.sources import geotiff as GT
    from pyspark.sql import functions as F

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]", app_name="ndvi-example")

    # synthesize a two-band scene (stands in for Landsat B4/B5)
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(8)
    red = (1 + rng.random((256, 256)) * 2999).astype("uint16")
    nir = red + (1 + rng.random((256, 256)) * 3999).astype("uint16")
    ext = (-78.7, 37.8, -78.2, 38.3)
    for name, band in [("b4", red), ("b5", nir)]:
        with open(f"{d}/{name}.tiff", "wb") as f:
            f.write(GT.write_geotiff(band, ext, crs="EPSG:4326", nodata=0))

    # catalog read: one row per (scene, chunk), lazy refs per band
    cat = spark.createDataFrame([{"b4_path": f"{d}/b4.tiff", "b5_path": f"{d}/b5.tiff"}])
    red_chunks = S.read_raster(spark, cat.select("b4_path"), tile_dimensions=(128, 128))
    nir_chunks = S.read_raster(spark, cat.select("b5_path"), tile_dimensions=(128, 128))
    both = (
        red_chunks.select(S.realize_tiles("tile_ref").alias("red"), "extent", "crs")
        .join(nir_chunks.select(S.realize_tiles("tile_ref").alias("nir"),
                                F.col("extent").alias("e2")),
              F.expr("extent.xmin = e2.xmin and extent.ymin = e2.ymin"))
    )
    ndvi = both.select(rf.rf_normalized_difference("nir", "red").alias("ndvi"),
                       "extent", "crs")
    stats = ndvi.agg(rf.rf_agg_stats("ndvi").alias("s")).head()["s"]
    print(f"NDVI over {stats['data_cells']} cells: "
          f"mean={stats['mean']:.4f} min={stats['min']:.4f} max={stats['max']:.4f}")
    png = ndvi.limit(1).select(rf.rf_render_color_ramp_png("ndvi").alias("p")).head()["p"]
    out = f"{d}/ndvi.png"
    with open(out, "wb") as f:
        f.write(bytes(png))
    print("rendered:", out)
    if own:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
