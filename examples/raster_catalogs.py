"""Raster catalogs — the reference's raster-catalogs.pymd workflow
(`python/docs/raster-catalogs.pymd`): the catalog FORMS (single URI,
1-D list / pandas DF / CSV string, 2-D multi-band Spark DF) and the
"external catalog" pattern — a scene-list CSV transformed into band URI
columns with pure Catalyst expressions, then fed to `read_raster`.

Run: python examples/raster_catalogs.py
"""

import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.sql import Row, functions as F

    from rasterframes_spark import sources as S
    from rasterframes_spark.sources import geotiff as GT

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session

        spark = create_rf_spark_session(master="local[4]",
                                        app_name="catalogs-example")

    # two scenes x two bands (stand-ins for MODIS B01/B02 granules)
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(4)
    for scene in ("2018185", "2018188"):
        for band in ("B01", "B02"):
            arr = rng.integers(1, 5000, (64, 64)).astype("uint16")
            with open(f"{d}/MCD43A4.A{scene}.h04v09_{band}.TIF", "wb") as f:
                f.write(GT.write_geotiff(arr, (-78.7, 37.8, -78.2, 38.3),
                                         crs="EPSG:4326", tile_size=32))

    scene1_b01 = f"{d}/MCD43A4.A2018185.h04v09_B01.TIF"
    scene2_b01 = f"{d}/MCD43A4.A2018188.h04v09_B01.TIF"

    # --- 1-D catalogs: same content type, one scene per row -----------
    # a plain list...
    from_list = S.read_raster(spark, [scene1_b01, scene2_b01],
                              tile_dimensions=(32, 32))
    # ...a pandas DataFrame...
    from_pandas = S.read_raster(spark, pd.DataFrame({"B01": [scene1_b01,
                                                             scene2_b01]}),
                                tile_dimensions=(32, 32))
    # ...a CSV string (the reference's `catalog` reader option form)...
    csv_cat = "\n".join(["B01", scene1_b01, scene2_b01])
    from_csv = S.read_raster(spark, csv_cat, tile_dimensions=(32, 32))
    # ...or an equivalent Spark DataFrame
    from_spark = S.read_raster(
        spark, spark.createDataFrame([Row(B01=scene1_b01),
                                      Row(B01=scene2_b01)]),
        tile_dimensions=(32, 32))
    counts = {df.count() for df in (from_list, from_pandas, from_csv,
                                    from_spark)}
    assert counts == {2 * 4}, counts  # 2 scenes x 2x2 chunk grid each

    # --- 2-D catalog: multiple bands per scene row --------------------
    two_d = spark.createDataFrame([
        Row(B01=scene1_b01, B02=scene1_b01.replace("B01", "B02")),
        Row(B01=scene2_b01, B02=scene2_b01.replace("B01", "B02")),
    ])
    both = S.read_raster(spark, two_d, catalog_cols=["B01", "B02"],
                         tile_dimensions=(32, 32))
    # one lazy tile column per catalog column, aligned on B01's grid
    assert {"B01", "B02"}.issubset(set(both.columns))
    assert both.count() == 8

    # --- external catalog: scene list CSV -> URI columns --------------
    # (mirrors the MODIS scene-list transform in raster-catalogs.pymd:
    # download_url ends in index.html; band files sit next to it)
    list_path = f"{d}/scenes.csv"
    with open(list_path, "w") as f:
        f.write("gid,download_url\n")
        for scene in ("2018185", "2018188"):
            f.write(f"MCD43A4.A{scene}.h04v09,"
                    f"file://{d}/index.html\n")
    scene_list = (spark.read.format("csv").option("header", "true")
                  .load(list_path))
    catalog = (scene_list
               .withColumn("base_url",
                           F.concat(F.regexp_replace("download_url",
                                                     "index.html$", ""),
                                    "gid"))
               .withColumn("B01", F.concat("base_url", F.lit("_B01.TIF")))
               .withColumn("B02", F.concat("base_url", F.lit("_B02.TIF"))))
    ext = S.read_raster(spark, catalog.select("B01", "B02"),
                        catalog_cols=["B01", "B02"],
                        tile_dimensions=(32, 32))
    n_ext = ext.count()
    assert n_ext == 8, n_ext

    # realizing a band from the catalog-built URIs actually decodes
    stats = ext.select(
        S.realize_tiles("B01").alias("t")).selectExpr(
        "rf_tile_sum(t) as s").agg(F.sum("s")).head()[0]
    assert stats and stats > 0
    print("raster_catalogs example OK:",
          {"one_d_chunks": counts, "two_d_chunks": n_ext})
    if own:
        spark.stop()
    return {"one_d": sorted(counts)[0], "two_d": n_ext}


if __name__ == "__main__":
    main()
