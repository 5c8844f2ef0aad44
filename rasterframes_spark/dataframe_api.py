"""Fluent DataFrame methods — the reference's monkey-patched API surface.

pyrasterframes attaches ``raster_join``/``as_layer`` to ``DataFrame`` and
exposes layer helpers on ``RasterFrameLayer``
(`python/pyrasterframes/__init__.py:341-344`,
`python/pyrasterframes/rf_types.py:79-180`), so user code reads
``df.raster_join(other).with_center()``. This engine keeps everything a
plain DataFrame; ``install_dataframe_methods()`` (called by
``create_rf_spark_session``) attaches the same spellings, each delegating
to the canonical module function. Nothing here adds semantics.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["install_dataframe_methods"]


def _tile_columns(df: DataFrame) -> list:
    """Columns with the engine's tile struct shape (rf_types.py:86-92)."""
    from rasterframes_spark.tile import TILE_SCHEMA

    names = {f.name for f in TILE_SCHEMA.fields}
    out = []
    for f in df.schema.fields:
        dt = f.dataType
        if dt.typeName() == "struct" and names.issubset({x.name for x in dt.fields}):
            out.append(F.col(f.name))
    return out


def _spatial_key_column(df: DataFrame) -> Column:
    if "spatial_key" not in df.columns:
        raise ValueError("no spatial_key column — not a layer DataFrame")
    return F.col("spatial_key")


def _temporal_key_column(df: DataFrame) -> Column:
    if "temporal_key" not in df.columns:
        raise ValueError("no temporal_key column")
    return F.col("temporal_key")


def _as_layer(df: DataFrame, *_, **__) -> DataFrame:
    """The reference converts to RasterFrameLayer (rf_types.py:79); layers
    here are plain DataFrames with {spatial_key, >=1 tile col} — validate
    the invariant and pass through."""
    if "spatial_key" not in df.columns or not _tile_columns(df):
        raise ValueError(
            "as_layer requires a spatial_key column and at least one tile column")
    return df


def _with_bounds(df: DataFrame, extent_col: str = "extent") -> DataFrame:
    """Add 'bounds' polygon geometry of each row's extent
    (rf_types.py:144-152 / LayerSpatialColumnMethods.withBounds)."""
    from rasterframes_spark.geom.functions import st_geometry

    return df.withColumn("bounds", st_geometry(F.col(extent_col)))


def _with_center(df: DataFrame, extent_col: str = "extent") -> DataFrame:
    """Add 'center' point of each row's extent (rf_types.py:153-161)."""
    from rasterframes_spark.geom.functions import st_centroid, st_geometry

    return df.withColumn("center", st_centroid(st_geometry(F.col(extent_col))))


def _with_center_lat_lng(df: DataFrame, extent_col: str = "extent",
                         crs_col: str = "crs") -> DataFrame:
    """Add 'center' as a (longitude, latitude) point in EPSG:4326
    (rf_types.py:162-170). Requires a constant-CRS layer (the reference's
    layers are single-CRS by construction); reads the CRS from the first
    row."""
    from rasterframes_spark.geom.functions import (
        st_centroid, st_geometry, st_reproject)

    src = df.select(crs_col).first()
    if src is None:
        return df.withColumn("center", F.lit(None).cast("binary"))
    return df.withColumn(
        "center",
        st_reproject(st_centroid(st_geometry(F.col(extent_col))),
                     src[0], "EPSG:4326"))


def _with_spatial_index_m(df: DataFrame, extent_col: str = "extent",
                          num_partitions: int | None = None) -> DataFrame:
    from rasterframes_spark.sources.raster_reader import with_spatial_index

    return with_spatial_index(df, extent_col=extent_col,
                              num_partitions=num_partitions)


def _raster_join_m(df: DataFrame, other: DataFrame, **kwargs) -> DataFrame:
    from rasterframes_spark.operators.raster_join import raster_join

    return raster_join(df, other, **kwargs)


def _spatial_join_m(df: DataFrame, other: DataFrame,
                    on=("spatial_key",), how: str = "inner") -> DataFrame:
    from rasterframes_spark.operators.raster_join import spatial_join

    return spatial_join(df, other, on=list(on), how=how)


def _to_raster(df: DataFrame, colname: str, cols: int, rows: int,
               dtype: str) -> np.ndarray:
    """Paste a layer's tiles into ONE driver-side numpy raster by
    spatial_key — the reference's toIntRaster/toDoubleRaster
    (rf_types.py:128-143), explicitly a driver-side convenience (it
    materializes the full mosaic; use write_tile_layer for data-scale
    output)."""
    import pandas as pd

    from rasterframes_spark.functions._kernel import decode_struct_pdf

    rows_ = df.select("spatial_key", colname).collect()
    canvas = None
    for r in rows_:
        t = r[colname]
        if t is None:
            continue
        tile = decode_struct_pdf(pd.DataFrame([t.asDict()]))[0]
        a = np.asarray(tile.masked().filled(0), dtype=dtype)
        th, tw = a.shape
        if canvas is None:
            canvas = np.zeros((rows, cols), dtype=dtype)
        ky, kx = r["spatial_key"]["row"], r["spatial_key"]["col"]
        y0, x0 = ky * th, kx * tw
        if y0 >= rows or x0 >= cols:
            continue
        canvas[y0:y0 + th, x0:x0 + tw] = a[: rows - y0, : cols - x0]
    if canvas is None:
        canvas = np.zeros((rows, cols), dtype=dtype)
    return canvas


def _to_int_raster(df: DataFrame, colname: str, cols: int, rows: int):
    return _to_raster(df, colname, cols, rows, "int32")


def _to_double_raster(df: DataFrame, colname: str, cols: int, rows: int):
    return _to_raster(df, colname, cols, rows, "float64")


def _st_join_m(df: DataFrame, other: DataFrame, **kwargs):
    from rasterframes_spark.operators import st_join as _sj

    return _sj(df, other, **kwargs)


def _st_knn_join_m(df: DataFrame, other: DataFrame, k: int,
                   max_distance: float, **kwargs):
    from rasterframes_spark.operators import st_knn_join as _skj

    return _skj(df, other, k, max_distance, **kwargs)


_METHODS = {
    "tile_columns": _tile_columns,
    "spatial_key_column": _spatial_key_column,
    "temporal_key_column": _temporal_key_column,
    "as_layer": _as_layer,
    "with_bounds": _with_bounds,
    "with_center": _with_center,
    "with_center_lat_lng": _with_center_lat_lng,
    "with_spatial_index": _with_spatial_index_m,
    "raster_join": _raster_join_m,
    "spatial_join": _spatial_join_m,
    "st_join": _st_join_m,
    "st_knn_join": _st_knn_join_m,
    "to_int_raster": _to_int_raster,
    "to_double_raster": _to_double_raster,
}


def _active_spark():
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession")
    return s


def _rd_raster(reader, catalog, **kw):
    from rasterframes_spark.sources.raster_reader import read_raster

    return read_raster(_active_spark(), catalog, **kw)


def _rd_geotiff(reader, path, **kw):
    from rasterframes_spark.sources.raster_reader import read_raster

    return read_raster(_active_spark(), [path], **kw)


def _rd_geojson(reader, path, **kw):
    from rasterframes_spark.sources.sinks import read_geojson

    return read_geojson(_active_spark(), path, **kw)


def _rd_geotrellis(reader, path, layer: str | None = None,
                   zoom: int | None = None, **kw):
    """Two storage generations behind the reference's reader name
    (GeoTrellisLayerDataSource SHORT_NAME 'geotrellis'): pass
    ``layer=``/``zoom=`` (or point at a catalog with an ``attributes/``
    dir) to read a REAL GeoTrellis Avro layer (sources/geotrellis.py);
    otherwise the engine's Z2-clustered Parquet layer."""
    import os

    if layer is not None:
        from rasterframes_spark.sources.geotrellis import (
            read_geotrellis_layer)

        if zoom is None:
            raise ValueError("spark.read.geotrellis: layer= needs zoom=")
        return read_geotrellis_layer(_active_spark(), path, layer,
                                     int(zoom), **kw)
    if zoom is not None:
        raise ValueError("spark.read.geotrellis: zoom= needs layer= "
                         "(a Parquet layer path takes neither)")
    if os.path.isdir(os.path.join(path, "attributes")):
        raise ValueError(
            "spark.read.geotrellis: this is a GeoTrellis Avro catalog — "
            "pass layer= and zoom= to pick the layer (list them with "
            "spark.read.geotrellis_catalog(path))")
    from rasterframes_spark.sources.layer import read_tile_layer

    return read_tile_layer(_active_spark(), path, **kw)


def _rd_geotrellis_catalog(reader, path):
    import os

    if os.path.isdir(os.path.join(path, "attributes")):
        from rasterframes_spark.sources.geotrellis import (
            read_geotrellis_catalog)

        return read_geotrellis_catalog(_active_spark(), path)
    from rasterframes_spark.sources.layer import read_layer_catalog

    return read_layer_catalog(_active_spark(), path)


def _rd_stacapi(reader, url, **kw):
    from rasterframes_spark.sources.stac import stac_api_search

    return stac_api_search(_active_spark(), url, **kw)


def _rd_warc(reader, paths, **kw):
    from rasterframes_spark.sources.warc import read_warc

    return read_warc(_active_spark(), paths, **kw)


def _rd_netcdf(reader, paths, var, **kw):
    from rasterframes_spark.sources.netcdf import read_netcdf

    return read_netcdf(_active_spark(), paths, var, **kw)


def _wr_geotiff(writer, path, **kw):
    from rasterframes_spark.sources.sinks import write_geotiff

    return write_geotiff(writer._df, path, **kw)


def _wr_geotrellis(writer, path, **kw):
    from rasterframes_spark.sources.layer import write_tile_layer

    return write_tile_layer(writer._df, path, **kw)


_READER_METHODS = {
    "raster": _rd_raster,
    "geotiff": _rd_geotiff,
    "geojson": _rd_geojson,
    "geotrellis": _rd_geotrellis,
    "geotrellis_catalog": _rd_geotrellis_catalog,
    "stacapi": _rd_stacapi,
    "warc": _rd_warc,
    "netcdf": _rd_netcdf,
}
_WRITER_METHODS = {
    "geotiff": _wr_geotiff,
    "geotrellis": _wr_geotrellis,
}


def install_dataframe_methods() -> None:
    """Attach the fluent surface to pyspark DataFrame plus the reference's
    reader/writer aliases (``spark.read.raster(...)``,
    ``df.write.geotiff(...)`` — pyrasterframes __init__.py:347-356).
    Idempotent; never overwrites a pyspark/user attribute of the same
    name."""
    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    for target, methods in ((DataFrame, _METHODS),
                            (DataFrameReader, _READER_METHODS),
                            (DataFrameWriter, _WRITER_METHODS)):
        for name, fn in methods.items():
            existing = getattr(target, name, None)
            if existing is not None and not getattr(existing, "_rf_installed", False):
                continue  # pre-existing non-rf attribute: don't clobber
            fn._rf_installed = True
            setattr(target, name, fn)
