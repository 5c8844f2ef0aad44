"""STAC catalog source (SURVEY.md §2.1, `spark.read.stacapi`).

The reference queries a STAC API on the driver and creates an items
DataFrame that chains into ``read.raster`` via asset hrefs
(``datasource/.../stac/api/StacApiDataSource.scala``,
``RasterSourceDataSource.scala:225-233``).

This environment has no network and no pystac-client, so the API call is
STUBBED: ``read_stac_items`` consumes a STAC ItemCollection (or newline-
delimited items) from a local JSON file — the exact payload a
``pystac_client.Client.search().item_collection()`` call returns — and the
``search()`` filters (bbox / datetime / collections) run as DataFrame
filters. Swapping the file for a live API call is the marked TODO.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_stac_items", "stac_asset_catalog"]


def read_stac_items(spark: SparkSession, path: str, bbox: tuple | None = None,
                    datetime_range: tuple | None = None,
                    collections: list[str] | None = None) -> DataFrame:
    """STAC ItemCollection JSON -> items DataFrame
    (id, collection, datetime, bbox struct, geometry WKB, assets map)."""
    with open(path) as f:
        doc = json.load(f)
    items = doc["features"] if isinstance(doc, dict) and "features" in doc else doc
    if isinstance(items, dict):
        items = [items]

    rows = []
    for it in items:
        bb = [None if v is None else float(v) for v in (it.get("bbox") or [None] * 4)]
        rows.append({
            "id": it.get("id"),
            "collection": it.get("collection"),
            "datetime": (it.get("properties") or {}).get("datetime"),
            "bbox": {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
            "geometry_json": json.dumps(it.get("geometry")) if it.get("geometry") else None,
            "assets": {k: (v.get("href") if isinstance(v, dict) else None)
                       for k, v in (it.get("assets") or {}).items()},
        })
    df = spark.createDataFrame(
        rows,
        schema=("id string, collection string, datetime string, "
                "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
                "geometry_json string, assets map<string,string>"),
    ).withColumn("datetime", F.to_timestamp("datetime"))

    if collections:
        df = df.where(F.col("collection").isin(list(collections)))
    if bbox:
        xmin, ymin, xmax, ymax = bbox
        df = df.where(
            (F.col("bbox.xmin") <= xmax) & (F.col("bbox.xmax") >= xmin)
            & (F.col("bbox.ymin") <= ymax) & (F.col("bbox.ymax") >= ymin)
        )
    if datetime_range:
        lo, hi = datetime_range
        df = df.where(F.col("datetime").between(lo, hi))
    return df


def stac_asset_catalog(items: DataFrame, asset_keys: list[str]) -> DataFrame:
    """Items -> raster catalog: one column of hrefs per asset key, ready for
    read_raster(catalog_col=...) chaining (the reference reads catalogs whose
    columns are band paths, RasterSourceDataSource.scala:59-63)."""
    cols = [F.col("id"), F.col("datetime")]
    for k in asset_keys:
        cols.append(F.col("assets").getItem(k).alias(f"{k}_path"))
    return items.select(*cols)
