"""STAC catalog source (SURVEY.md §2.1, `spark.read.stacapi`).

The reference queries a STAC API on the driver and creates an items
DataFrame that chains into ``read.raster`` via asset hrefs
(``datasource/.../stac/api/StacApiDataSource.scala``,
``RasterSourceDataSource.scala:225-233``).

Two entry points:

- ``read_stac_items``: consumes a STAC ItemCollection (or newline-
  delimited items) from a local JSON file — the exact payload a
  ``pystac_client.Client.search().item_collection()`` call returns.
- ``stac_api_search``: live API client — a driver-side ``urllib`` POST to
  ``{url}/search`` with bbox / datetime / collections, following ``next``
  pagination links, no pystac dependency. The items DataFrame chains into
  ``read_raster`` via ``stac_asset_catalog``.

The search itself is driver-side by design (the item list is catalog
metadata, KBs–MBs); the heavy data movement — the asset rasters — stays
distributed through read_raster's lazy refs + range reads.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_stac_items", "stac_api_search", "stac_asset_catalog"]

_ITEMS_SCHEMA = ("id string, collection string, datetime string, "
                 "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
                 "geometry_json string, assets map<string,string>")


def _items_to_df(spark: SparkSession, items: list[dict]) -> DataFrame:
    rows = []
    for it in items:
        bb = [None if v is None else float(v)
              for v in (it.get("bbox") or [None] * 4)]
        if len(bb) == 6:
            # 3D STAC bbox [xmin, ymin, zmin, xmax, ymax, zmax] — drop z
            # (a 4-element read of it would take zmin/xmax as xmax/ymax
            # and silently break every bbox filter downstream)
            bb = [bb[0], bb[1], bb[3], bb[4]]
        rows.append({
            "id": it.get("id"),
            "collection": it.get("collection"),
            "datetime": (it.get("properties") or {}).get("datetime"),
            "bbox": {"xmin": bb[0], "ymin": bb[1], "xmax": bb[2], "ymax": bb[3]},
            "geometry_json": json.dumps(it.get("geometry")) if it.get("geometry") else None,
            "assets": {k: (v.get("href") if isinstance(v, dict) else None)
                       for k, v in (it.get("assets") or {}).items()},
        })
    return spark.createDataFrame(rows, schema=_ITEMS_SCHEMA).withColumn(
        "datetime", F.to_timestamp("datetime"))


def read_stac_items(spark: SparkSession, path: str, bbox: tuple | None = None,
                    datetime_range: tuple | None = None,
                    collections: list[str] | None = None) -> DataFrame:
    """STAC ItemCollection JSON -> items DataFrame
    (id, collection, datetime, bbox struct, geometry WKB, assets map)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # newline-delimited items (one JSON object per line)
        doc = [json.loads(line) for line in text.splitlines() if line.strip()]
    items = doc["features"] if isinstance(doc, dict) and "features" in doc else doc
    if isinstance(items, dict):
        items = [items]
    df = _items_to_df(spark, items)

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


def stac_api_search(spark: SparkSession, url: str, bbox: tuple | None = None,
                    datetime_range: tuple | None = None,
                    collections: list[str] | None = None,
                    limit: int = 250, max_items: int = 10000,
                    timeout: float = 30.0) -> DataFrame:
    """Live STAC API item search -> items DataFrame.

    POSTs the STAC API ``/search`` endpoint (reference:
    ``StacApiDataSource.scala:26``; API spec: ogcapi-features ItemSearch)
    with the given filters, follows ``rel=next`` pagination links (POST
    body merge or GET href forms), and returns the same schema as
    ``read_stac_items``. ``max_items`` caps the driver-side item list.
    """
    endpoint = url.rstrip("/")
    if not endpoint.endswith("/search"):
        endpoint += "/search"
    body: dict = {"limit": int(limit)}
    if bbox:
        body["bbox"] = [float(v) for v in bbox]
    if datetime_range:
        lo, hi = datetime_range
        body["datetime"] = f"{lo}/{hi}"
    if collections:
        body["collections"] = list(collections)

    def post(u: str, payload: dict) -> dict:
        req = urllib.request.Request(
            u, data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json",
                     "Accept": "application/geo+json"},
            method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def get(u: str) -> dict:
        req = urllib.request.Request(u, headers={"Accept": "application/geo+json"})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    items: list[dict] = []
    doc = post(endpoint, body)
    while True:
        page = doc.get("features") or []
        items.extend(page)
        if not page:
            # progress guard: some servers emit a rel=next link on the
            # final empty page (or repeat one) — without this the loop
            # would spin on identical requests forever
            break
        if len(items) >= max_items:
            items = items[:max_items]
            break
        nxt = next((l for l in (doc.get("links") or [])
                    if l.get("rel") == "next"), None)
        if nxt is None:
            break
        if (nxt.get("method") or "GET").upper() == "POST":
            merged = dict(body)
            merged.update(nxt.get("body") or {})
            doc = post(nxt.get("href") or endpoint, merged)
        else:
            doc = get(nxt["href"])
    return _items_to_df(spark, items)


def stac_asset_catalog(items: DataFrame, asset_keys: list[str]) -> DataFrame:
    """Items -> raster catalog: one column of hrefs per asset key, ready for
    read_raster(catalog_col=...) chaining (the reference reads catalogs whose
    columns are band paths, RasterSourceDataSource.scala:59-63)."""
    cols = [F.col("id"), F.col("datetime")]
    if "bbox" in items.columns:
        # carry the scene bbox: read_raster(query_extent=...) then prunes
        # whole scenes before any header/pixel I/O
        cols.append(F.col("bbox"))
    for k in asset_keys:
        cols.append(F.col("assets").getItem(k).alias(f"{k}_path"))
    return items.select(*cols)
