"""Sentinel-2 JPEG2000 workflow — native .jp2 in, analytics, .jp2 out.

The reference needs GDAL for every step of this; here the whole pipeline
runs on the pure-python codec (sources/jp2.py): read a real Kakadu-encoded
Sentinel-2 band through the chunked reader (GMLJP2 georeferencing carried
into the chunk extents), compute per-chunk statistics and a rescaled
product, and export the result as a georeferenced lossless .jp2 that reads
straight back.

Run: python examples/jp2_pipeline.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B01 = "/root/reference/core/src/test/resources/B01.jp2"


def main(spark=None, scene: str = B01):
    import rasterframes_spark as rf
    from rasterframes_spark.sources import jp2
    from rasterframes_spark.sources import raster_reader as S
    from rasterframes_spark.sources import sinks
    from pyspark.sql import functions as F

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[8]",
                                        app_name="jp2-example")

    # 0. cheap scene triage before any full-resolution decode: the
    #    reduced-resolution overview costs ~1/4^n of a full decode
    raw = open(scene, "rb").read()
    overview = jp2.decode_jp2(raw, reduce=3)
    print(f"overview {overview.shape}: mean {overview.mean():.0f}, "
          f"range [{overview.min()}, {overview.max()}]")

    # 1. distributed read: one task per chunk window; each executor
    #    decodes only the JP2 tiles its windows intersect
    df = S.read_raster(spark, [scene], tile_dimensions=(640, 640))
    tiles = df.select("extent", "crs",
                      S.realize_tiles("tile_ref").alias("tile"))

    # 2. analytics on the chunked scene
    stats = tiles.agg(rf.rf_agg_stats("tile").alias("s")).first()["s"]
    print(f"scene stats: {stats['data_cells']} cells, "
          f"mean {stats['mean']:.1f}, max {stats['max']:.0f}")

    # 3. product: a reduce=2 overview (1/16 the pixels), reflectance tail
    #    clamped, kept as exact integers — distributed local algebra runs
    #    the same way on the full-resolution `tiles` frame
    from rasterframes_spark.tile import Tile

    scene_info = jp2.read_info(raw)
    ov = np.minimum(jp2.decode_jp2(raw, reduce=2).astype(np.int64) * 2,
                    8191).astype(np.uint16)
    prod = spark.createDataFrame(
        [{"tile": Tile(ov, "uint16").to_row(),
          "extent": dict(zip(("xmin", "ymin", "xmax", "ymax"),
                             (float(v) for v in scene_info.extent))),
          "crs": scene_info.crs}],
        "tile struct<cell_type:string,cols:int,rows:int,cells:binary>, "
        "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
        "crs string")
    prod = prod.select(
        "extent", "crs",
        rf.rf_convert_cell_type("tile", "uint16").alias("tile"))

    # 4. export as georeferenced lossless .jp2 (Sentinel-2-shaped:
    #    RPCL progression, 64x64 precincts) and read it straight back
    out = os.path.join(tempfile.mkdtemp(), "product.jp2")
    sinks.write_jp2(prod, out, tile_size=(256, 256), levels=3)
    info = jp2.read_info(open(out, "rb").read())
    print(f"exported {out}: {info.width}x{info.height} {info.dtype} "
          f"{info.crs} extent={tuple(round(v, 1) for v in info.extent)}")

    back = S.read_raster(spark, [out], tile_dimensions=(256, 256))
    total = back.select(S.realize_tiles("tile_ref").alias("t")).agg(
        F.sum(rf.rf_tile_sum("t"))).head()[0]
    print(f"read-back checksum: {total:.0f}")

    if own:
        spark.stop()
    return stats, info, total


if __name__ == "__main__":
    main()
