"""Unsupervised raster segmentation — the reference's
python/docs/unsupervised-learning.pymd workflow re-expressed Spark-first:

    tiles → TileExploder → NoDataFilter → VectorAssembler → KMeans →
    per-cell cluster ids → assemble_tiles into a segmentation raster.

Run: python examples/ml_unsupervised.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None, k: int = 3):
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark.ml import NoDataFilter, TileExploder

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="ml-unsupervised-example")

    import __spark_entry__ as entry

    tiles = entry._two_band(spark, "/root/testdata/sf0.001")
    pipe = Pipeline(stages=[
        TileExploder(tileCols=["qty", "price"]),
        NoDataFilter(filterCols=["qty", "price"]),
        VectorAssembler(inputCols=["qty", "price"], outputCol="features"),
        KMeans(k=k, seed=17, featuresCol="features",
               predictionCol="cluster"),
    ])
    model = pipe.fit(tiles)
    pred = model.transform(tiles)

    n_clusters = pred.select("cluster").distinct().count()
    seg = rf.assemble_tiles(
        pred.select("grp", "column_index", "row_index",
                    F.col("cluster").cast("double").alias("c")),
        ["grp"], "column_index", "row_index", "c", 16, 16, "float64")
    n_tiles = seg.count()
    print(f"clusters: {n_clusters}  segmentation tiles: {n_tiles}")
    if own:
        spark.stop()
    return n_clusters, n_tiles


if __name__ == "__main__":
    main()
