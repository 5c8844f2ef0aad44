"""Supervised learning over raster cells — the reference's
python/docs/supervised-learning.pymd workflow re-expressed Spark-first:

    tiles → TileExploder → NoDataFilter → VectorAssembler →
    LogisticRegression → per-cell predictions → assemble_tiles back
    into a prediction raster.

The label here is a deterministic function of the two bands (is the
qty band above its median while price is below its?), so the model has
real signal to learn and the example can assert out-of-sample accuracy
instead of just running. Everything between explode and assemble is
stock pyspark.ml — the bridge's whole point is that raster data drops
into existing ML pipelines with no special casing.

Run: python examples/ml_supervised.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark.ml import NoDataFilter, TileExploder

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session
        spark = create_rf_spark_session(master="local[4]",
                                        app_name="ml-supervised-example")

    import __spark_entry__ as entry

    tiles = entry._two_band(spark, "/root/testdata/sf0.001")

    # deterministic ground-truth labels as a tile: 1 where qty is high
    # AND price is low (cellwise label raster, like a landcover mask)
    label_tile = rf.rf_local_multiply(
        rf.rf_local_greater("qty", 25.0),
        rf.rf_local_less("price", 30.0))
    labeled = tiles.withColumn("label_t", label_tile)

    # explode → filter NoData → features → model : stock pyspark.ml
    pipe = Pipeline(stages=[
        TileExploder(tileCols=["qty", "price", "label_t"]),
        NoDataFilter(filterCols=["qty", "price", "label_t"]),
        VectorAssembler(inputCols=["qty", "price"], outputCol="features"),
        LogisticRegression(labelCol="label_t", featuresCol="features",
                           maxIter=20),
    ])
    train = labeled.where(F.col("grp") % 2 == 0)
    test = labeled.where(F.col("grp") % 2 == 1)
    model = pipe.fit(train)
    pred = model.transform(test)

    acc = (pred.agg(F.avg((F.col("prediction") == F.col("label_t"))
                          .cast("double")).alias("acc")).head()["acc"])

    # reassemble per-cell predictions into a prediction raster per group
    pred_tiles = rf.assemble_tiles(
        pred.select("grp", "column_index", "row_index",
                    F.col("prediction").alias("p")),
        ["grp"], "column_index", "row_index", "p", 16, 16, "float64")
    n_tiles = pred_tiles.count()
    print(f"test-cell accuracy: {acc:.3f}  prediction tiles: {n_tiles}")
    if own:
        spark.stop()
    return acc, n_tiles


if __name__ == "__main__":
    main()
