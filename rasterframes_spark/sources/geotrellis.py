"""GeoTrellis file-backend Avro layer catalogs: pure-python read + write.

The reference exposes GeoTrellis layers as a Spark data source
(``datasource/.../geotrellis/GeoTrellisRelation.scala:60-300``,
``GeoTrellisCatalog.scala``) by delegating to GeoTrellis's AttributeStore /
LayerReader.  This module reads the same on-disk layout directly:

    <catalog>/attributes/<layer>__<zoom>__metadata.json
        JSON pair [layerId, {header, metadata, keyIndex, schema}]
        (the FileAttributeStore contract: one file per layer attribute,
        Avro writer schema + TileLayerMetadata stored as JSON)
    <catalog>/<header.path>/<zero-padded index>
        one file per space-filling-curve index value, containing ONE
        Avro-binary KeyValueRecord {pairs: [{_1: key, _2: tile}, ...]}
        (zlib-deflated by GeoTrellis's AvroEncoder; raw binary also
        accepted — the decode must consume the buffer exactly, so the
        compression sniff cannot mis-fire silently)

Reading needs no key-index math at all — keys travel inside the records;
the Z-order index is only re-derived when WRITING so produced catalogs
stay readable by GeoTrellis itself.  The Avro layer is sources/avro_io.py,
whose decoder is cross-validated against the canonical JVM implementation.

No GeoTrellis-written fixture exists in-container (the reference generates
layers at test runtime via GeoTrellis); the tile/key record schemas follow
the public geotrellis.store.avro codecs and round-trip through this
writer + the JVM Avro oracle — the same caveat class as the MRF/HDF5 rows
in the README format matrix.
"""
from __future__ import annotations

import json
import os
import zlib

import numpy as np

from rasterframes_spark.sources.avro_io import (
    decode_binary, encode_binary, parse_schema)

__all__ = ["read_geotrellis_layer", "read_geotrellis_catalog",
           "write_geotrellis_layer", "geotrellis_layer_ids",
           "decode_kv_record", "TILE_RECORDS"]


# public geotrellis.store.avro TileCodecs record shapes: record name,
# numpy dtype, avro cells item type ("bytes" = packed byte payload)
TILE_RECORDS = {
    "ByteArrayTile":   ("int8",    "bytes"),
    "UByteArrayTile":  ("uint8",   "bytes"),
    "ShortArrayTile":  ("int16",   "int"),
    "UShortArrayTile": ("uint16",  "int"),
    "IntArrayTile":    ("int32",   "int"),
    "FloatArrayTile":  ("float32", "float"),
    "DoubleArrayTile": ("float64", "double"),
}
_DTYPE_TO_RECORD = {v[0]: k for k, v in TILE_RECORDS.items()}


# ---------------------------------------------------------------------------
# attribute store
# ---------------------------------------------------------------------------


def _attributes_dir(catalog: str) -> str:
    return os.path.join(catalog, "attributes")


def geotrellis_layer_ids(catalog: str) -> list[tuple[str, int]]:
    """All (layer_name, zoom) pairs present in the catalog's attribute
    store (files named <name>__<zoom>__<attr>.json)."""
    adir = _attributes_dir(catalog)
    if not os.path.isdir(adir):
        raise ValueError(f"geotrellis: no attribute store at {adir}")
    ids = set()
    for fn in os.listdir(adir):
        if not fn.endswith(".json"):
            continue
        parts = fn[:-5].split("__")
        if len(parts) >= 3:
            try:
                ids.add((parts[0], int(parts[1])))
            except ValueError:
                continue
    return sorted(ids)


def _read_attribute(catalog: str, layer: str, zoom: int, attr: str):
    path = os.path.join(_attributes_dir(catalog),
                        f"{layer}__{zoom}__{attr}.json")
    if not os.path.exists(path):
        raise ValueError(f"geotrellis: missing attribute {attr!r} for "
                         f"{layer}:{zoom} ({path})")
    with open(path) as f:
        doc = json.load(f)
    # FileAttributeStore stores a [layerId, value] JSON pair
    if isinstance(doc, list) and len(doc) == 2:
        return doc[1]
    return doc


def _layer_attributes(catalog: str, layer: str, zoom: int) -> dict:
    """The merged layer attributes {header, metadata, keyIndex, schema}
    (GeoTrellis AvroLayerAttributes, stored under the 'metadata' key)."""
    doc = _read_attribute(catalog, layer, zoom, "metadata")
    if not isinstance(doc, dict) or "schema" not in doc:
        raise ValueError("geotrellis: attribute file lacks the avro-layer "
                         "shape {header, metadata, keyIndex, schema}")
    return doc


# ---------------------------------------------------------------------------
# payload decode
# ---------------------------------------------------------------------------


def decode_kv_record(data: bytes, schema) -> list[tuple[dict, dict]]:
    """One data-file payload -> [(key_record, tile_record), ...].

    GeoTrellis's AvroEncoder zlib-deflates payloads; older/foreign
    writers may store raw binary.  Both are accepted: the exact-consume
    decode rejects the wrong branch loudly."""
    s = schema if isinstance(schema, dict) and schema.get("_p") \
        else parse_schema(schema)
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        raw = data
    rec = decode_binary(raw, s, tag_records=True, exact=True)
    return [(p["_1"], p["_2"]) for p in rec["pairs"]]


def _tile_to_array(tile_rec: dict) -> tuple[np.ndarray, float | None]:
    """Tagged tile record -> (2-D numpy array, nodata value or None)."""
    t = tile_rec.get("_type")
    if t == "ArrayMultibandTile":
        raise ValueError("geotrellis: multiband records are expanded by "
                         "the caller (one band per row)")
    if t not in TILE_RECORDS:
        raise ValueError(f"geotrellis: unsupported tile record {t!r}")
    dtype, items = TILE_RECORDS[t]
    cols, rows = tile_rec["cols"], tile_rec["rows"]
    cells = tile_rec["cells"]
    if items == "bytes":
        a = np.frombuffer(cells, dtype=dtype, count=cols * rows)
    else:
        a = np.asarray(cells, dtype=dtype)
    nd = tile_rec.get("noDataValue")
    if isinstance(nd, bool):
        # boolean union branch = "constant default NODATA" (GeoTrellis
        # codec convention): min value for ints, NaN for floats
        if not nd:
            nd = None
        elif dtype.startswith("float"):
            nd = float("nan")
        else:
            nd = float(np.iinfo(dtype).min)
    return a.reshape(rows, cols), (None if nd is None else float(nd))


def _key_extent(key: dict, layout: dict) -> tuple[float, float, float, float]:
    le = layout["extent"]
    tl = layout["tileLayout"]
    w = (le["xmax"] - le["xmin"]) / tl["layoutCols"]
    h = (le["ymax"] - le["ymin"]) / tl["layoutRows"]
    c, r = key["col"], key["row"]
    return (le["xmin"] + c * w, le["ymax"] - (r + 1) * h,
            le["xmin"] + (c + 1) * w, le["ymax"] - r * h)


def _celltype_name(dtype: str, nodata) -> str:
    if nodata is None:
        return dtype if dtype.startswith("float") else dtype + "raw"
    if dtype.startswith("float") and (nodata != nodata):  # NaN default
        return dtype
    num = int(nodata) if float(nodata).is_integer() else nodata
    return f"{dtype}ud{num}"


# ---------------------------------------------------------------------------
# read: layer -> tile DataFrame
# ---------------------------------------------------------------------------


def read_geotrellis_layer(spark, catalog: str, layer: str, zoom: int,
                          query_extent: tuple | None = None):
    """GeoTrellis Avro layer -> DataFrame (spatial_key, [band,]
    extent, crs, tile) — the read_tile_layer row shape, decoded
    distributed (binaryFile scan over the index files; one Avro decode
    per file partition, keys from the records themselves).

    ``query_extent`` (xmin, ymin, xmax, ymax) prunes pairs at the
    SpatialKey level before tile MATERIALIZATION (numpy/Tile/Arrow
    conversion) — the reference's filter semantics
    (GeoTrellisRelation.scala PrunedScan).  The Avro record parse
    itself is per-file (keys travel inside the records), so a pruned
    file still pays one binary decode; sub-file byte pruning would
    need the key index, which only helps point lookups."""
    import pandas as pd

    from rasterframes_spark.tile import Tile

    attrs = _layer_attributes(catalog, layer, zoom)
    header = attrs.get("header", {})
    meta = attrs.get("metadata", {})
    schema_json = json.dumps(attrs["schema"]) \
        if not isinstance(attrs["schema"], str) else attrs["schema"]
    layout = meta.get("layoutDefinition")
    if layout is None:
        raise ValueError("geotrellis: metadata lacks layoutDefinition")
    crs = meta.get("crs", "")
    data_dir = os.path.join(catalog, header.get("path",
                                                f"{layer}/{zoom}"))
    if not os.path.isdir(data_dir):
        raise ValueError(f"geotrellis: no data dir {data_dir}")

    qe = tuple(float(v) for v in query_extent) if query_extent else None

    src = (spark.read.format("binaryFile")
           .load(data_dir)
           .select("path", "content"))

    out_schema = (
        "spatial_key struct<col:int,row:int>, band int, "
        "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
        "crs string, "
        "tile struct<cell_type:string,cols:int,rows:int,cells:binary>")

    def run(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for key, trec in decode_kv_record(bytes(content),
                                                  schema_json):
                    ext = _key_extent(key, layout)
                    if qe is not None and (
                            ext[2] <= qe[0] or ext[0] >= qe[2]
                            or ext[3] <= qe[1] or ext[1] >= qe[3]):
                        continue
                    bands = (trec["bands"]
                             if trec.get("_type") == "ArrayMultibandTile"
                             else [trec])
                    for bi, band_rec in enumerate(bands):
                        a, nd = _tile_to_array(band_rec)
                        ct = _celltype_name(str(a.dtype), nd)
                        if nd is not None and nd == nd:
                            tile = Tile(np.ma.masked_equal(a, nd), ct)
                        elif nd is not None:           # NaN nodata
                            tile = Tile(np.ma.masked_invalid(a), ct)
                        else:
                            tile = Tile(a, ct)
                        rows.append({
                            "spatial_key": {"col": int(key["col"]),
                                            "row": int(key["row"])},
                            "band": bi,
                            "extent": {"xmin": ext[0], "ymin": ext[1],
                                       "xmax": ext[2], "ymax": ext[3]},
                            "crs": crs,
                            "tile": tile.to_row(),
                        })
            yield pd.DataFrame(rows, columns=[
                "spatial_key", "band", "extent", "crs", "tile"])

    return src.mapInPandas(run, schema=out_schema)


def read_geotrellis_catalog(spark, catalog: str):
    """Catalog root -> DataFrame (layer, zoom, cell_type, crs, extent,
    tile_cols, tile_rows) — the reference's GeoTrellisCatalog surface."""
    rows = []
    for layer, zoom in geotrellis_layer_ids(catalog):
        try:
            meta = _layer_attributes(catalog, layer, zoom)["metadata"]
        except ValueError:
            continue
        lay = meta.get("layoutDefinition", {})
        tl = lay.get("tileLayout", {})
        ext = meta.get("extent", {})
        rows.append((layer, zoom, meta.get("cellType", ""),
                     meta.get("crs", ""),
                     (ext.get("xmin"), ext.get("ymin"),
                      ext.get("xmax"), ext.get("ymax")),
                     tl.get("tileCols"), tl.get("tileRows")))
    return spark.createDataFrame(
        rows, "layer string, zoom int, cell_type string, crs string, "
              "extent struct<xmin:double,ymin:double,xmax:double,"
              "ymax:double>, tile_cols int, tile_rows int")


# ---------------------------------------------------------------------------
# write: tile rows -> GeoTrellis layout (readable by GeoTrellis itself)
# ---------------------------------------------------------------------------


def _z2(col: int, row: int) -> int:
    z = 0
    for i in range(32):
        z |= ((col >> i) & 1) << (2 * i) | ((row >> i) & 1) << (2 * i + 1)
    return z


def _tile_schema_union() -> list:
    branches = []
    for name, (dtype, items) in TILE_RECORDS.items():
        cells = {"type": "bytes"} if items == "bytes" \
            else {"type": "array", "items": items}
        nd_t = items if items != "bytes" else "int"
        branches.append({
            "type": "record", "name": name,
            "namespace": "geotrellis.raster",
            "fields": [{"name": "cols", "type": "int"},
                       {"name": "rows", "type": "int"},
                       {"name": "cells", "type": cells},
                       {"name": "noDataValue",
                        "type": [nd_t, "null", "boolean"]}]})
    return branches


def _kv_schema() -> dict:
    return {
        "type": "record", "name": "KeyValueRecord",
        "namespace": "geotrellis.spark.io",
        "fields": [{"name": "pairs", "type": {
            "type": "array", "items": {
                "type": "record", "name": "Tuple2",
                "fields": [
                    {"name": "_1", "type": {
                        "type": "record", "name": "SpatialKey",
                        "namespace": "geotrellis.layer",
                        "fields": [{"name": "col", "type": "int"},
                                   {"name": "row", "type": "int"}]}},
                    {"name": "_2", "type": _tile_schema_union()},
                ]}}}]}


def write_geotrellis_layer(tiles: list, catalog: str, layer: str,
                           zoom: int, layout_extent: tuple,
                           layout_cols: int, layout_rows: int,
                           crs: str = "+proj=longlat +datum=WGS84 +no_defs",
                           nodata: float | None = None,
                           compress: bool = True) -> None:
    """[(col, row, 2-D numpy array), ...] -> a GeoTrellis file catalog
    layer (attributes + Z-order-indexed deflated Avro data files).

    Driver-side by design, like ``write_geotiff`` — the export path for
    interop with GeoTrellis consumers; big layers belong in the engine's
    own Parquet layers (sources/layer.py)."""
    if not tiles:
        raise ValueError("geotrellis write: no tiles")
    schema = _kv_schema()
    schema_json = json.dumps(schema)
    tc, tr = tiles[0][2].shape[1], tiles[0][2].shape[0]
    cols = [t[0] for t in tiles]
    rows = [t[1] for t in tiles]
    kb = {"minKey": {"col": min(cols), "row": min(rows)},
          "maxKey": {"col": max(cols), "row": max(rows)}}
    dtype = str(np.asarray(tiles[0][2]).dtype)
    if dtype not in _DTYPE_TO_RECORD:
        raise ValueError(f"geotrellis write: dtype {dtype} not supported")
    rec_name = _DTYPE_TO_RECORD[dtype]
    items = TILE_RECORDS[rec_name][1]

    xmin, ymin, xmax, ymax = (float(v) for v in layout_extent)
    lw = (xmax - xmin) / layout_cols
    lh = (ymax - ymin) / layout_rows
    data_ext = (xmin + min(cols) * lw, ymax - (max(rows) + 1) * lh,
                xmin + (max(cols) + 1) * lw, ymax - min(rows) * lh)

    # ---- data files: group by Z-order index, one file per index value
    by_index: dict[int, list] = {}
    for c, r, a in tiles:
        by_index.setdefault(_z2(c, r), []).append((c, r, np.asarray(a)))
    max_width = len(str(max(by_index)))
    path_rel = f"{layer}/{zoom}"
    data_dir = os.path.join(catalog, path_rel)
    os.makedirs(data_dir, exist_ok=True)
    for idx, group in by_index.items():
        pairs = []
        for c, r, a in group:
            if a.dtype.kind in "fc":
                cells = [float(v) for v in a.ravel()]
            elif items == "bytes":
                cells = a.tobytes()
            else:
                cells = [int(v) for v in a.ravel()]
            nd = None if nodata is None else (
                float(nodata) if dtype.startswith("float") else int(nodata))
            pairs.append({"_1": {"col": int(c), "row": int(r)},
                          "_2": {"_type": rec_name,
                                 "cols": int(a.shape[1]),
                                 "rows": int(a.shape[0]),
                                 "cells": cells,
                                 "noDataValue": nd}})
        payload = encode_binary({"pairs": pairs}, schema)
        if compress:
            payload = zlib.compress(payload)
        with open(os.path.join(data_dir, str(idx).zfill(max_width)),
                  "wb") as f:
            f.write(payload)

    # ---- attribute store
    os.makedirs(_attributes_dir(catalog), exist_ok=True)
    layer_id = {"name": layer, "zoom": zoom}
    attrs = {
        "header": {"format": "file",
                   "keyClass": "geotrellis.layer.SpatialKey",
                   "valueClass": "geotrellis.raster.Tile",
                   "path": path_rel},
        "metadata": {
            "extent": {"xmin": data_ext[0], "ymin": data_ext[1],
                       "xmax": data_ext[2], "ymax": data_ext[3]},
            "layoutDefinition": {
                "extent": {"xmin": xmin, "ymin": ymin,
                           "xmax": xmax, "ymax": ymax},
                "tileLayout": {"layoutCols": layout_cols,
                               "layoutRows": layout_rows,
                               "tileCols": tc, "tileRows": tr}},
            "bounds": kb,
            "cellType": _celltype_name(dtype, nodata),
            "crs": crs},
        "keyIndex": {
            "type": "zorder",
            "properties": {"keyBounds": kb}},
        "schema": schema,
    }
    with open(os.path.join(_attributes_dir(catalog),
                           f"{layer}__{zoom}__metadata.json"), "w") as f:
        json.dump([layer_id, attrs], f)
