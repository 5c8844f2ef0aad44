"""TileExploder/NoDataFilter transformers + streaming ops."""

import os
import time

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.ml import TileExploder, NoDataFilter
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


def test_tile_exploder_pipeline(spark):
    t = Tile(np.arange(9, dtype="float64").reshape(3, 3), "float64")
    nd = Tile(np.ma.masked_array(np.ones((3, 3)), mask=np.eye(3, dtype=bool)), "float64")
    df = spark.createDataFrame(
        [{"id": 1, "a": t.to_row(), "b": nd.to_row()}],
        schema=f"id int, a {TILE_T}, b {TILE_T}",
    )
    exploded = TileExploder(tileCols=["a", "b"]).transform(df)
    assert set(exploded.columns) == {"id", "column_index", "row_index", "a", "b"}
    assert exploded.count() == 9
    filtered = NoDataFilter(filterCols=["a", "b"]).transform(exploded)
    assert filtered.count() == 6  # 3 diagonal cells of b are NoData->null

    # feed into an actual ML stage
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=["a", "b"], outputCol="features")
    vecs = va.transform(filtered)
    assert vecs.select("features").count() == 6


def test_windowed_tile_stats_stream(spark, tmp_path):
    from rasterframes_spark.streaming import read_tile_stream, windowed_tile_stats
    from pyspark.sql.types import StructType, StructField, TimestampType, StructType

    import datetime as dt

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    tiles = [Tile(np.full((4, 4), float(i)), "float64") for i in range(4)]
    rows = [{"ts": dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=30 * i),
             "tile": t.to_row()} for i, t in enumerate(tiles)]
    batch = spark.createDataFrame(rows, schema=f"ts timestamp, tile {TILE_T}")
    batch.write.mode("overwrite").parquet(src)

    stream = read_tile_stream(spark, src, batch.schema)
    assert stream.isStreaming
    agg = windowed_tile_stats(stream, "tile", "ts", window="1 minute")
    q = (agg.writeStream.format("memory").queryName("tile_stats")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = spark.sql("select * from tile_stats order by window").collect()
        assert len(got) == 2  # 4 tiles at 30s spacing -> two 1-min windows
        assert got[0]["data_cells"] == 32
        assert got[0]["mean"] == 0.5  # tiles 0,1
        assert got[1]["mean"] == 2.5  # tiles 2,3
    finally:
        q.stop()


def test_streaming_dedup(spark, tmp_path):
    from rasterframes_spark.streaming import streaming_dedup
    import datetime as dt

    src = str(tmp_path / "dedup_src")
    os.makedirs(src, exist_ok=True)
    rows = [{"ts": dt.datetime(2026, 1, 1, 0, 0, i), "k": "x" if i % 2 == 0 else "y"}
            for i in range(6)]
    batch = spark.createDataFrame(rows, schema="ts timestamp, k string")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = streaming_dedup(stream, ["k"], "ts")
    q = out.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = spark.sql("select k, count(*) c from dedup_out group by k").collect()
        assert {r["k"]: r["c"] for r in got} == {"x": 1, "y": 1}
    finally:
        q.stop()
