"""Tile-layer storage: the engine's replacement for GeoTrellis Avro layers
(SURVEY.md §2.1 — "replace with partitioned Parquet of tile structs: free
pushdown/pruning").

Layout: a Parquet dataset of rows ``{spatial_key{col,row}, spatial_index
(Z2 of the extent centroid), tile, extent, crs [, temporal_key]}``,
**range-partitioned and sorted by spatial_index on write** so that

- Parquet column (min/max) statistics on ``spatial_index`` prune row
  groups/files for any Z2-range predicate, and
- spatially-close tiles are physically co-located (scan locality, cheap
  merges, co-partitioned layer×layer joins).

``read_tile_layer(..., query_extent=...)`` turns the extent into Z2 ranges
(quadtree decomposition, ``geom/sfc.py``) and applies them BEFORE the exact
extent filter — the predicate reaches the parquet scan as a pushed filter
(verify with ``.explain``: PushedFilters on spatial_index).

Layer-wide metadata (crs, layout, full extent, key bounds — the reference's
TileLayerMetadata) is written to ``_layer_metadata.json`` next to the data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from rasterframes_spark.geom import sfc
from rasterframes_spark.geom.functions import rf_z2_index

__all__ = [
    "write_tile_layer", "read_tile_layer", "layer_metadata",
    "write_tile_layer_table", "read_tile_layer_table", "read_layer_catalog",
]


def write_tile_layer(df: DataFrame, path: str, extent_col: str = "extent",
                     crs_col: str = "crs", num_partitions: int | None = None) -> None:
    """Write a tile DataFrame as a Z2-clustered Parquet layer."""
    n = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    out = df.withColumn("spatial_index", rf_z2_index(F.col(extent_col)))
    (
        out.repartitionByRange(n, "spatial_index")
        .sortWithinPartitions("spatial_index")
        .write.mode("overwrite")
        .parquet(path)
    )
    # layer-wide metadata (TileLayerMetadata analog) — same aggregation
    # as the bucketed-table writer (_compute_layer_meta; one source of
    # the metadata shape). Local paths write a plain json file; remote
    # paths (s3a://, hdfs://) go through a one-row Spark text write so
    # the sink works wherever the parquet write did.
    meta = _compute_layer_meta(df, extent_col, crs_col)
    if "://" not in path or path.startswith("file://"):
        local = path[7:] if path.startswith("file://") else path
        with open(os.path.join(local, "_layer_metadata.json"), "w") as f:
            json.dump(meta, f)
    else:
        (df.sparkSession.createDataFrame([(json.dumps(meta),)], "value string")
         .coalesce(1).write.mode("overwrite")
         .text(path.rstrip("/") + "/_layer_metadata"))


def layer_metadata(path: str, spark: SparkSession | None = None) -> dict:
    """Layer metadata from either storage form: the local json file, or
    (remote layers) the Spark-written ``_layer_metadata`` text dir."""
    local = path[7:] if path.startswith("file://") else path
    if "://" not in local:
        try:
            with open(os.path.join(local, "_layer_metadata.json")) as f:
                return json.load(f)
        except OSError:
            pass
    if spark is not None:
        row = spark.read.text(path.rstrip("/") + "/_layer_metadata").head()
        return json.loads(row["value"])
    raise OSError(f"no layer metadata at {path}")


def read_tile_layer(spark: SparkSession, path: str,
                    query_extent: tuple | None = None,
                    max_depth: int = 8) -> DataFrame:
    """Read a layer; with ``query_extent=(xmin,ymin,xmax,ymax)`` the scan is
    pre-filtered by Z2 ranges (pushed to Parquet stats) then exactly by
    bbox intersection."""
    df = spark.read.parquet(path)
    if query_extent is None:
        return df
    xmin, ymin, xmax, ymax = query_extent
    # expand by half the max tile footprint: the index is the extent
    # CENTROID's Z2, so a tile overlapping the query may be centered
    # up to tile_size/2 outside it
    try:
        tw, th = layer_metadata(path, spark)["max_tile_size"]
        ranges = sfc.z2_ranges(xmin - tw / 2, ymin - th / 2,
                               xmax + tw / 2, ymax + th / 2, max_depth=max_depth)
    except Exception:
        # metadata unavailable: SKIP the Z2 prefilter rather than apply
        # unexpanded ranges — the index is the extent CENTROID's Z2, so
        # unexpanded ranges silently drop tiles that overlap the query
        # but are centered outside it; the exact bbox filter below is
        # then the only (correct, just unpruned) filter
        ranges = []
    cond = None
    for lo, hi in ranges:
        c = F.col("spatial_index").between(int(lo), int(hi))
        cond = c if cond is None else (cond | c)
    if cond is not None:
        df = df.where(cond)
    return df.where(
        (F.col("extent.xmin") <= xmax) & (F.col("extent.xmax") >= xmin)
        & (F.col("extent.ymin") <= ymax) & (F.col("extent.ymax") >= ymin)
    )


# ---------------------------------------------------------------------------
# bucketed layer tables: exchange-free repeated joins
# ---------------------------------------------------------------------------


def _compute_layer_meta(df: DataFrame, extent_col: str, crs_col: str) -> dict:
    agg = df.agg(
        F.min(f"{extent_col}.xmin").alias("xmin"),
        F.min(f"{extent_col}.ymin").alias("ymin"),
        F.max(f"{extent_col}.xmax").alias("xmax"),
        F.max(f"{extent_col}.ymax").alias("ymax"),
        F.max(F.col(f"{extent_col}.xmax") - F.col(f"{extent_col}.xmin")).alias("tw"),
        F.max(F.col(f"{extent_col}.ymax") - F.col(f"{extent_col}.ymin")).alias("th"),
        F.first(crs_col).alias("crs"),
        F.count("*").alias("tile_count"),
    ).head()
    return {
        "extent": [agg["xmin"], agg["ymin"], agg["xmax"], agg["ymax"]],
        "max_tile_size": [agg["tw"], agg["th"]],
        "crs": agg["crs"],
        "tile_count": agg["tile_count"],
        "index": "z2",
    }


def write_tile_layer_table(df: DataFrame, table_name: str, n_buckets: int = 16,
                           extent_col: str = "extent", crs_col: str = "crs") -> None:
    """Write a layer as a Spark **bucketed table** on ``spatial_index``.

    Bucketing persists the shuffle: every layer written with the same
    ``n_buckets`` is hash-partitioned identically on disk, so layer x layer
    ``spatial_join(..., on=['spatial_index'])`` (and groupBy spatial_index
    rollups) plan with ZERO Exchange — at 100 TB the join cost collapses to
    a per-bucket sort-merge with no network shuffle. This is the engine's
    analog of the reference keeping both layers in the same GeoTrellis
    layout (RasterFrameLayerMethods.scala:138-191), done the Spark-native
    way. Files are additionally sorted by spatial_index within buckets so
    row-group stats still prune Z2 range predicates.

    Requires a session catalog (saveAsTable) — the plain path-based
    ``write_tile_layer`` remains the catalog-free alternative.
    """
    out = df.withColumn("spatial_index", rf_z2_index(F.col(extent_col)))
    (
        out.write.bucketBy(n_buckets, "spatial_index")
        .sortBy("spatial_index")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )
    meta = _compute_layer_meta(df, extent_col, crs_col)
    esc = json.dumps(meta).replace("'", "''")
    df.sparkSession.sql(
        f"ALTER TABLE {table_name} SET TBLPROPERTIES ('rf_layer_meta' = '{esc}')"
    )


def read_tile_layer_table(spark: SparkSession, table_name: str,
                          query_extent: tuple | None = None,
                          max_depth: int = 8) -> DataFrame:
    """Read a bucketed layer table; ``query_extent`` pre-filters by Z2
    ranges exactly like ``read_tile_layer``. The bucketing metadata rides
    with the catalog table, so downstream equi-joins on ``spatial_index``
    against another table with the same bucket count stay exchange-free."""
    df = spark.table(table_name)
    if query_extent is None:
        return df
    xmin, ymin, xmax, ymax = query_extent
    try:
        props = spark.sql(
            f"SHOW TBLPROPERTIES {table_name} ('rf_layer_meta')").head()
        tw, th = json.loads(props["value"])["max_tile_size"]
        ranges = sfc.z2_ranges(xmin - tw / 2, ymin - th / 2,
                               xmax + tw / 2, ymax + th / 2, max_depth=max_depth)
    except Exception:
        ranges = []  # same under-selection hazard as read_tile_layer
    cond = None
    for lo, hi in ranges:
        c = F.col("spatial_index").between(int(lo), int(hi))
        cond = c if cond is None else (cond | c)
    if cond is not None:
        df = df.where(cond)
    return df.where(
        (F.col("extent.xmin") <= xmax) & (F.col("extent.xmax") >= xmin)
        & (F.col("extent.ymin") <= ymax) & (F.col("extent.ymax") >= ymin)
    )


def read_layer_catalog(spark: SparkSession, base_path: str) -> DataFrame:
    """List the layers under a catalog directory (any subdirectory holding
    a ``_layer_metadata.json``) -> DataFrame of (layer, crs, tile_count,
    xmin..ymax, max_tile_w/h). The reference's geotrellis_catalog reader
    (datasource geotrellis-catalog); catalogs are driver-small metadata.
    """
    scheme = str(base_path).split("://", 1)[0] if "://" in str(base_path) else ""
    if scheme not in ("", "file"):
        # listing runs driver-side via os.listdir — a remote URI would
        # silently return an empty catalog instead of the layers
        raise ValueError(
            f"read_layer_catalog: unsupported URI scheme '{scheme}://' — "
            "catalog listing is driver-local (file paths only). Mount or "
            "sync the catalog locally, or read a known layer directly with "
            "read_layer (Spark-side parquet IO handles remote storage).")
    if scheme == "file":
        base_path = str(base_path)[len("file://"):]
    rows = []
    if os.path.isdir(base_path):
        for name in sorted(os.listdir(base_path)):
            p = os.path.join(base_path, name)
            try:
                meta = layer_metadata(p)
            except (OSError, ValueError):
                continue
            e = meta.get("extent", [None] * 4)
            ts = meta.get("max_tile_size", [None, None])
            rows.append((name, p, meta.get("crs"), meta.get("tile_count"),
                         e[0], e[1], e[2], e[3], ts[0], ts[1],
                         meta.get("index")))
    schema = ("layer string, path string, crs string, tile_count long, "
              "xmin double, ymin double, xmax double, ymax double, "
              "max_tile_w double, max_tile_h double, index string")
    return spark.createDataFrame(rows, schema=schema)
