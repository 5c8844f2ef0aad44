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
        # Arrow is the data plane for every kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # scale posture: AQE re-plans shuffles, coalesces partitions, and
        # handles skew joins at runtime (SURVEY.md §4)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in configs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    register_sql_functions(spark)
    return spark


def register_sql_functions(spark: SparkSession) -> None:
    """Register the rf_* surface for SQL use — the engine's analog of the
    reference's FunctionRegistry registration
    (``core/.../expressions/package.scala:89-189``)."""
    import rasterframes_spark.functions as rf

    # scalar-signature functions registrable as SQL UDFs
    from pyspark.sql.functions import pandas_udf  # noqa: F401

    sql_fns = {
        "rf_tile_sum": rf.rf_tile_sum,
        "rf_tile_mean": rf.rf_tile_mean,
        "rf_tile_min": rf.rf_tile_min,
        "rf_tile_max": rf.rf_tile_max,
        "rf_data_cells": rf.rf_data_cells,
        "rf_no_data_cells": rf.rf_no_data_cells,
        "rf_exists": rf.rf_exists,
        "rf_for_all": rf.rf_for_all,
        "rf_is_no_data_tile": rf.rf_is_no_data_tile,
    }
    for name, fn in sql_fns.items():
        try:
            inner = fn.__closure__[0].cell_contents if fn.__closure__ else None
            if inner is not None:
                spark.udf.register(name, inner)
        except Exception:
            pass
