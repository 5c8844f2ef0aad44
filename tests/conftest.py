import numpy as np
import pytest

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    from rasterframes_spark.session import create_rf_spark_session

    s = create_rf_spark_session(
        master="local[4]",
        app_name="rf-tests",
        **{"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_tile_df(spark, tiles, extra=None):
    """DataFrame with columns (tile_id, tile [, extras])."""
    from rasterframes_spark.tile import TILE_SCHEMA
    from pyspark.sql.types import StructType, StructField, StringType

    rows = []
    for i, t in enumerate(tiles):
        row = {"tile_id": f"t{i}", "tile": t.to_row() if t is not None else None}
        if extra:
            row.update({k: v[i] for k, v in extra.items()})
        rows.append(row)
    schema = StructType(
        [StructField("tile_id", StringType(), False), StructField("tile", TILE_SCHEMA, True)]
    )
    return spark.createDataFrame(rows, schema=schema)
