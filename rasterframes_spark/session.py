"""SparkSession bootstrap for the engine.

Analog of the reference's ``create_rf_spark_session``
(``python/pyrasterframes/utils.py``) and ``SparkSession.withRasterFrames``
(``core/.../rasterframes/package.scala:79-82``) — minus any JVM extension:
everything the engine needs is Arrow + sensible shuffle/AQE defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def create_rf_spark_session(master: str | None = None, app_name: str = "rasterframes-spark",
                            **configs) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Arrow is the data plane for every kernel. Batch by BYTES, not rows:
        # tile rows are ~128KB (a 32MB batch is ~250 tiles) while exploded
        # cell rows are ~20B (the same 32MB batch is ~1.6M rows) — a row cap
        # tuned for one starves the other.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(32 * 1024 * 1024))
        # scale posture: AQE re-plans shuffles, coalesces partitions, and
        # handles skew joins at runtime (SURVEY.md §4)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # (consumers normalize via timestamp_micros(nanos div 1000))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in configs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    register_sql_functions(spark)
    return spark


def register_sql_functions(spark: SparkSession) -> None:
    """Register the rf_*/st_* surface for SQL use — the engine's analog of
    the reference's FunctionRegistry registration
    (``core/.../expressions/package.scala:89-189``). After this,
    ``SELECT rf_tile_mean(tile) FROM tiles`` works in spark.sql."""
    from pyspark.sql.functions import pandas_udf

    import rasterframes_spark.functions.tilestats as ts
    import rasterframes_spark.functions.constructors as ctor
    import rasterframes_spark.geom.functions as gf

    def reg(name, lazy_fn):
        # lazy_pandas_udf wrappers carry (.fn, .returnType)
        spark.udf.register(name, pandas_udf(lazy_fn.returnType)(lazy_fn.fn))

    # tile -> scalar functions (single-arg, directly SQL-registrable)
    for name, op in {
        "rf_tile_sum": ts.rf_tile_sum, "rf_tile_mean": ts.rf_tile_mean,
        "rf_tile_min": ts.rf_tile_min, "rf_tile_max": ts.rf_tile_max,
        "rf_data_cells": ts.rf_data_cells, "rf_no_data_cells": ts.rf_no_data_cells,
        "rf_exists": ts.rf_exists, "rf_for_all": ts.rf_for_all,
        "rf_is_no_data_tile": ts.rf_is_no_data_tile,
    }.items():
        # tile_to_scalar ops close over a lazy udf in __closure__
        for cell in op.__closure__ or []:
            c = cell.cell_contents
            if callable(c) and hasattr(c, "returnType"):
                reg(name, c)
                break

    reg("rf_tile_stats", ts._tile_stats_udf)
    reg("rf_tile_histogram", ts._tile_hist_udf)
    reg("rf_tile_to_array_double", ctor._tile_to_array_double_udf)
    reg("rf_tile_to_array_int", ctor._tile_to_array_int_udf)
    reg("st_point", gf._point_udf)
    reg("st_geom_from_wkt", gf._from_wkt_udf)
    reg("st_distance", gf._distance_udf)
    reg("st_distance_sphere", gf._distance_sphere_udf)
    reg("st_envelope", gf._envelope_udf)
    reg("rf_xz2_index", gf._xz2_udf)
    reg("rf_z2_index", gf._z2_udf)
    # _binary_pred returns the lazy UDF itself
    for name, pred in {
        "st_intersects": gf._intersects, "st_contains": gf._contains,
        "st_within": gf._within, "st_disjoint": gf._disjoint,
        "st_equals": gf._equals, "st_covers": gf._covers,
        "st_coveredBy": gf._covered_by, "st_touches": gf._touches,
        "st_crosses": gf._crosses, "st_overlaps": gf._overlaps,
    }.items():
        reg(name, pred)
    reg("st_relate", gf._relate_udf)
