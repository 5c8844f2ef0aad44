"""read_raster: catalog-driven raster source (SURVEY.md §2.1, §3.1).

Reference lifecycle (``RasterSourceRelation.scala:97-155``): catalog rows
(URIs) → repartition → open source metadata → explode over the chunk grid
(1 scene row → N tile rows) → lazy RasterRefs realized only when an
expression needs cells.

Engine mapping, same shape:
1. catalog DataFrame (or list of URIs) with one column per band path;
2. a metadata pandas-UDF reads ONLY the GeoTIFF header per URI and emits
   the chunk-grid window list (no pixel I/O);
3. ``explode`` over windows (codegen'd Generate);
4. each chunk row carries ``ref = {uri, band, col_off, row_off, width,
   height, buffer}`` + computed extent/crs — a *lazy tile*;
5. ``realize_tiles`` decodes windows inside a pandas UDF (only the strips/
   tiles overlapping each window are decompressed). Metadata-only queries
   (counts, extents, spatial filters) never touch pixels — Spark's column
   pruning drops the realize projection entirely, which is the reference's
   laziness property for free.

File handles: per-executor LRU byte cache keyed by URI (the reference uses
a Scaffeine cache, RFRasterSource.scala:96-99).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from rasterframes_spark.tile import CellType, Tile, TILE_SCHEMA
from rasterframes_spark.functions._kernel import col_or_name, lazy_pandas_udf
from rasterframes_spark.sources import geotiff as GT

__all__ = ["read_raster", "realize_tiles", "RASTER_REF_SCHEMA",
           "with_spatial_index", "raster_from_array"]

RASTER_REF_SCHEMA = (
    "struct<uri:string,band:int,col_off:int,row_off:int,width:int,height:int,"
    "buffer:int>"
)

_CHUNK_T = (
    "array<struct<col_off:int,row_off:int,width:int,height:int,"
    "xmin:double,ymin:double,xmax:double,ymax:double,crs:string>>"
)


def _parse_subdataset(uri: str) -> tuple[str, str | None]:
    """GDAL-style NetCDF subdataset forms -> (real_uri, variable|None).

    Accepted: ``NETCDF:"path":var``, ``NETCDF:path:var`` and the fragment
    form ``path#var`` (only on .nc/.nc4/.cdf/.h5/.hdf5/.hdf paths, so
    http URIs with fragments pass through untouched)."""
    if uri.startswith("NETCDF:"):
        body = uri[7:]
        if body.startswith('"'):
            end = body.index('"', 1)
            path, rest = body[1:end], body[end + 1:]
            return path, (rest.lstrip(":") or None)
        path, _, var = body.rpartition(":")
        if not path:        # NETCDF:path with no variable
            return var, None
        return path, (var or None)
    if "#" in uri:
        path, _, var = uri.rpartition("#")
        if var and path.lower().endswith(
                (".nc", ".nc4", ".cdf", ".h5", ".hdf5", ".hdf")):
            return path, var
    return uri, None


@functools.lru_cache(maxsize=64)
def _range_source(uri: str):
    """Executor-local range source per URI: file seeks or HTTP Range
    requests, block-cached (sources/rangeio.py). The reference's analog is
    its RangeReader-backed RFRasterSource + Scaffeine cache
    (RFRasterSource.scala:96-99)."""
    from rasterframes_spark.sources.rangeio import RangeSource

    return RangeSource(uri)


@functools.lru_cache(maxsize=256)
def _cached_info(uri: str):
    real, var = _parse_subdataset(uri)
    if var is not None or real != uri:
        from rasterframes_spark.sources import netcdf as NC

        return NC.read_info(_range_source(real), var)
    try:
        return GT.read_info(_range_source(uri))
    except ValueError as e:
        from rasterframes_spark.sources import jp2 as J2

        try:
            return J2.read_info(_range_source(uri))
        except (ValueError, NotImplementedError):
            pass
        from rasterframes_spark.sources import vrt as V

        try:
            return V.read_info(_range_source(uri))
        except (ValueError, NotImplementedError):
            pass
        from rasterframes_spark.sources import mrf as MRF

        try:
            return MRF.read_info(_range_source(uri))
        except (ValueError, NotImplementedError):
            pass
        from rasterframes_spark.sources import netcdf as NC

        try:
            return NC.read_info(_range_source(uri))
        except (ValueError, NotImplementedError):
            pass
        from rasterframes_spark.sources import grib2 as GB

        try:
            return GB.read_info(_range_source(uri))
        except (ValueError, NotImplementedError):
            pass
        from rasterframes_spark.sources import gdal_fallback as GF

        if GF.have_rasterio():
            return GF.read_info_rasterio(uri)
        raise ValueError(
            f"{uri}: not readable by the pure-python codecs ({e}). "
            "Pure-python covers the TIFF/GeoTIFF family, JPEG2000 "
            "(5/3 reversible and 9/7 irreversible), VRT, MRF, "
            "NetCDF-3/NetCDF-4, GRIB2 lat/lon (simple, complex, "
            "spatial-differencing, JPEG2000 and PNG packing) and "
            "GRIB edition 1 (see the README format matrix); other "
            "GDAL formats (HDF4, LERC, exotic GRIB representations, "
            "...) need GDAL — installing rasterio enables the "
            "fallback read path automatically."
        ) from e


def read_window_any(uri: str, c0: int, r0: int, w: int, h: int,
                    band: int = 0) -> np.ndarray:
    """Windowed read of any URI through the format dispatch (GeoTIFF/COG,
    JP2 — lossless or lossy, VRT composition, rasterio fallback).  The
    shared entry the realize UDF and the VRT composer both route
    through, so nested VRTs and mixed-format mosaics compose."""
    info = _cached_info(uri)
    via = getattr(info, "via", "tiff")
    if via == "gdal":
        from rasterframes_spark.sources import gdal_fallback as GF

        return GF.read_window_rasterio(uri, c0, r0, w, h, band)
    if via == "nc":
        from rasterframes_spark.sources import netcdf as NC

        real, var = _parse_subdataset(uri)
        return NC.read_window(_range_source(real), info, c0, r0, w, h,
                              band, var=var)
    data = _range_source(uri)
    if via == "jp2":
        from rasterframes_spark.sources import jp2 as J2

        return J2.read_window(data, info, c0, r0, w, h, band)
    if via == "vrt":
        from rasterframes_spark.sources import vrt as V

        return V.read_window(data, info, c0, r0, w, h, band)
    if via == "mrf":
        from rasterframes_spark.sources import mrf as MRF

        return MRF.read_window(data, info, c0, r0, w, h, band)
    if via == "grib":
        from rasterframes_spark.sources import grib2 as GB

        return GB.read_window(data, info, c0, r0, w, h, band)
    return GT.read_window(data, info, c0, r0, w, h, band)


def _celltype_for(info: GT.GeoTiffInfo) -> str:
    base = info.dtype if info.dtype != "uint32" else "float64"
    if info.nodata is None:
        return base + ("raw" if not base.startswith("float") else "")
    ct = CellType.from_numpy(np.dtype(base), info.nodata)
    return ct.name


def iter_chunk_windows(info, tw: int, th: int):
    """Yield (col_off, row_off, width, height, (xmin, ymin, xmax, ymax))
    over a scene's tile-chunk grid — the SINGLE source of the chunk /
    per-chunk-extent math shared by the batch catalog reader below and
    the streaming GeoTIFF source (streaming/__init__.py), so a fix to
    either stays in sync."""
    xmin, ymin, xmax, ymax = info.extent
    pw = (xmax - xmin) / info.width
    ph = (ymax - ymin) / info.height
    for r0 in range(0, info.height, th):
        for c0 in range(0, info.width, tw):
            w = min(tw, info.width - c0)
            h = min(th, info.height - r0)
            yield c0, r0, w, h, (xmin + c0 * pw, ymax - (r0 + h) * ph,
                                 xmin + (c0 + w) * pw, ymax - r0 * ph)


def read_raster(spark: SparkSession, catalog, band_indexes=(0,),
                tile_dimensions=(256, 256), buffer_size: int = 0,
                lazy_tiles: bool = True, spatial_index_partitions: int | None = None,
                catalog_col: str | None = None,
                catalog_cols: list[str] | None = None,
                query_extent: tuple | None = None) -> DataFrame:
    """Catalog (list of URIs | DataFrame with path column(s)) -> one row per
    (scene × chunk), tile columns per band.

    Options mirror RasterSourceDataSource.scala:37-63: band_indexes,
    tile_dimensions, buffer_size, lazy_tiles, spatial_index_partitions.
    ``catalog_cols`` is the reference's ``catalog_col_names``: several URI
    columns per scene row (e.g. red/nir assets) become one tile column per
    catalog column (named after it; ``{col}_b{i}`` with multiple bands),
    chunked on the FIRST column's grid — the aligned-scenes contract the
    reference's multi-column catalogs carry (RasterSourceRelation.scala:59-95).
    """
    tw, th = tile_dimensions

    if isinstance(catalog, (list, tuple)):
        cat = spark.createDataFrame([(u,) for u in catalog], ["path"])
        catalog_col = "path"
    else:
        if isinstance(catalog, str):
            # CSV-string catalog (the reference's RasterSourceDataSource
            # `catalog` option form, RasterSourceDataSource.scala:37-63):
            # header row of column names, one scene per line
            import io

            catalog = pd.read_csv(io.StringIO(catalog), dtype=str,
                                  skipinitialspace=True)
        if isinstance(catalog, pd.DataFrame):
            cat = spark.createDataFrame(catalog)
        else:
            cat = catalog
        catalog_col = catalog_col or (catalog_cols or cat.columns)[0]

    if query_extent is not None:
        # scene-level pruning: when the catalog carries scene bboxes (a
        # `bbox` struct, as stac_asset_catalog emits, or bare
        # xmin/ymin/xmax/ymax columns), drop non-overlapping SCENES here —
        # at catalog scale this skips even the per-scene header read
        qx0, qy0, qx1, qy1 = (float(v) for v in query_extent)
        bb = None
        if "bbox" in cat.columns:
            bb = F.col("bbox")
        elif all(c in cat.columns for c in ("xmin", "ymin", "xmax", "ymax")):
            bb = F.struct(*[F.col(c) for c in ("xmin", "ymin", "xmax", "ymax")])
        if bb is not None:
            cat = cat.where(
                bb["xmin"].isNull()
                | ((bb["xmin"] < qx1) & (bb["xmax"] > qx0)
                   & (bb["ymin"] < qy1) & (bb["ymax"] > qy0)))

    @lazy_pandas_udf(_CHUNK_T)
    def chunk_grid(uris: pd.Series) -> pd.Series:
        out = []
        for uri in uris.values:
            if uri is None:
                out.append(None)
                continue
            info = _cached_info(str(uri))
            chunks = []
            for c0, r0, w, h, (exmin, eymin, exmax, eymax) in \
                    iter_chunk_windows(info, tw, th):
                chunks.append({
                    "col_off": c0, "row_off": r0, "width": w, "height": h,
                    "xmin": exmin, "ymax": eymax,
                    "xmax": exmax, "ymin": eymin,
                    "crs": info.crs,
                })
            out.append(chunks)
        return pd.Series(out, dtype=object)

    uri_c = F.col(catalog_col)
    exploded = (
        cat.withColumn("__chunk", F.explode(chunk_grid(uri_c)))
        .select(
            "*",
            F.struct(
                F.col("__chunk.xmin").alias("xmin"),
                F.col("__chunk.ymin").alias("ymin"),
                F.col("__chunk.xmax").alias("xmax"),
                F.col("__chunk.ymax").alias("ymax"),
            ).alias("extent"),
            F.col("__chunk.crs").alias("crs"),
        )
    )

    src_cols = catalog_cols if catalog_cols else [catalog_col]
    for sc in src_cols:
        for b in band_indexes:
            ref = F.struct(
                F.col(sc).alias("uri"),
                F.lit(int(b)).alias("band"),
                F.col("__chunk.col_off").alias("col_off"),
                F.col("__chunk.row_off").alias("row_off"),
                F.col("__chunk.width").alias("width"),
                F.col("__chunk.height").alias("height"),
                F.lit(int(buffer_size)).alias("buffer"),
            )
            if catalog_cols:
                name = f"{sc}_b{b}" if len(band_indexes) > 1 else sc
            else:
                name = f"tile_b{b}" if len(band_indexes) > 1 else "tile_ref"
            exploded = exploded.withColumn(name, ref)
            if not lazy_tiles:
                exploded = exploded.withColumn(name, realize_tiles(F.col(name)))

    out = exploded.drop("__chunk")
    if query_extent is not None:
        # AOI pruning BEFORE any cell I/O: chunks are still lazy refs, so
        # dropping a chunk row here means its window is never read —
        # only scene headers (a few KB each) were touched. The filter is
        # pure Catalyst over the chunk extent struct (laziness-as-I/O-
        # pruning, the posture of ref/RasterRef.scala:49-64).
        qx0, qy0, qx1, qy1 = (float(v) for v in query_extent)
        e = F.col("extent")
        out = out.where((e["xmin"] < qx1) & (e["xmax"] > qx0)
                        & (e["ymin"] < qy1) & (e["ymax"] > qy0))
    if spatial_index_partitions:
        from rasterframes_spark.geom.functions import rf_xz2_index

        out = out.withColumn("spatial_index", rf_xz2_index(F.col("extent")))
        out = out.repartitionByRange(int(spatial_index_partitions), F.col("spatial_index"))
    return out


def realize_tiles(ref, io_trace: str | None = None) -> Column:
    """Lazy ref -> realized tile struct: windowed read via the pure-python
    GeoTIFF decoder (rf_tile / RasterRefToTile equivalent).

    ``io_trace``: optional path (shared FS) — every actual window-byte
    fetch appends a trace line from the executor (rangeio.RangeSource
    accounting).  The laziness pytest uses this to assert that queries
    which never realize a tile perform ZERO window reads and that AOI
    pruning shrinks the fetch set (the reference's laziness-as-I/O-
    pruning invariant, ref/RasterRef.scala:49-64)."""

    @lazy_pandas_udf(TILE_SCHEMA)
    def udf(r: pd.DataFrame) -> pd.DataFrame:
        from rasterframes_spark.tile import tiles_to_struct_pdf

        out = []
        uris = r["uri"].values
        for i in range(len(r)):
            uri = uris[i]
            if uri is None:
                out.append(None)
                continue
            data = _range_source(str(uri))
            data.trace_file = io_trace
            info = _cached_info(str(uri))
            buf = int(r["buffer"].values[i])
            c0 = int(r["col_off"].values[i]) - buf
            r0 = int(r["row_off"].values[i]) - buf
            w_req = int(r["width"].values[i]) + 2 * buf
            h_req = int(r["height"].values[i]) + 2 * buf
            c0c, r0c = max(c0, 0), max(r0, 0)
            w = min(c0 + w_req, info.width) - c0c
            h = min(r0 + h_req, info.height) - r0c
            arr = read_window_any(str(uri), c0c, r0c, w, h,
                                  int(r["band"].values[i]))
            ct = CellType.parse(_celltype_for(info))
            if buf and ct.nodata is None:
                # raw cell type can't encode a NoData halo: encode_cells
                # would drop the mask and focal ops would average literal
                # zeros along image borders. Promote to float64 (NaN
                # NoData; exact for every int32-or-narrower dtype) so halo
                # cells survive the struct round-trip as NoData. Applied to
                # every buffered chunk, not just edges, so one raster keeps
                # one cell type.
                ct = CellType.parse("float64")
            if arr.dtype != ct.dtype:
                arr = arr.astype(ct.dtype)
            ma = np.ma.masked_array(arr, mask=ct.mask_of(arr))
            if buf and (w != w_req or h != h_req):
                # image-edge chunk: pad the halo with NoData so buffered
                # tiles are uniformly (core + 2*buf) on every side — focal
                # ops can then slice a constant halo (BufferTile contract,
                # ref/RasterRef.scala:49-64)
                full = np.ma.masked_array(
                    np.zeros((h_req, w_req), dtype=ct.dtype),
                    mask=np.ones((h_req, w_req), dtype=bool))
                top, left = r0c - r0, c0c - c0
                full[top:top + h, left:left + w] = ma
                ma = full
            out.append(Tile(ma, ct))
        return tiles_to_struct_pdf(out)

    return udf(col_or_name(ref))


def raster_from_array(spark: SparkSession, array: np.ndarray, extent: tuple,
                      crs: str = "EPSG:4326", tile_dimensions=(256, 256),
                      cell_type: str | None = None) -> DataFrame:
    """In-memory raster -> chunked tile DataFrame (the reference's
    ProjectedRaster.toDF / InMemoryRasterSource, ProjectedRasterMethods.scala:40).
    One row per tile chunk with spatial_key, tile, extent, crs."""
    from rasterframes_spark.tile import PROJ_RASTER_SCHEMA

    tw, th = tile_dimensions
    H, W = array.shape
    xmin, ymin, xmax, ymax = extent
    pw, ph = (xmax - xmin) / W, (ymax - ymin) / H
    ct = CellType.from_numpy(array.dtype) if cell_type is None else CellType.parse(cell_type)
    rows = []
    for r0 in range(0, H, th):
        for c0 in range(0, W, tw):
            sub = array[r0:r0 + th, c0:c0 + tw]
            t = Tile(np.ma.masked_array(sub, mask=ct.mask_of(np.asarray(sub))), ct)
            rows.append({
                "spatial_key": {"col": c0 // tw, "row": r0 // th},
                "tile": t.to_row(),
                "extent": {
                    "xmin": xmin + c0 * pw,
                    "ymax": ymax - r0 * ph,
                    "xmax": xmin + min(c0 + tw, W) * pw,
                    "ymin": ymax - min(r0 + th, H) * ph,
                },
                "crs": crs,
            })
    return spark.createDataFrame(
        rows,
        schema=("spatial_key struct<col:int,row:int>, "
                "tile struct<cell_type:string,cols:int,rows:int,cells:binary>, "
                "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
                "crs string"),
    )


def with_spatial_index(df: DataFrame, extent_col: str = "extent",
                       num_partitions: int | None = None) -> DataFrame:
    """Add `spatial_index` (XZ2) and range-repartition by it — the
    reference's withSpatialIndex + repartitionByRange
    (LayerSpatialColumnMethods.scala:122-129). Range partitioning by an SFC
    key gives spatial locality per partition: spatially-close tiles land
    together, so later extent-filtered scans and raster joins touch few
    partitions."""
    from rasterframes_spark.geom.functions import rf_xz2_index

    out = df.withColumn("spatial_index", rf_xz2_index(F.col(extent_col)))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, F.col("spatial_index"))
