"""Optional rasterio/GDAL escape hatch for raster formats the pure-python
codec cannot parse (JPEG2000, MrF, HDF, VRT, ...).

The reference reads these through its GDAL-backed RasterSource branch
(core/.../ref/RFRasterSource.scala:105-158); this environment ships no
GDAL, so the TIFF family decodes pure-python (sources/geotiff.py) and
everything else routes here IF rasterio is importable — otherwise the
reader raises with the supported-format matrix. Import of rasterio is
deferred to call time so the module is always safe to import.
"""

from __future__ import annotations

import numpy as np

__all__ = ["have_rasterio", "read_info_rasterio", "read_window_rasterio"]


def have_rasterio() -> bool:
    try:
        import rasterio  # noqa: F401
        return True
    except ImportError:
        return False


def _local_path(uri: str) -> str:
    # rasterio/GDAL has its own VFS for http (/vsicurl/) and archives;
    # only strip the file:// scheme and pass everything else through.
    u = str(uri)
    if u.startswith("file://"):
        return u[7:]
    if u.startswith("http://") or u.startswith("https://"):
        return "/vsicurl/" + u
    return u


def read_info_rasterio(uri: str):
    """Dataset metadata via rasterio, shaped as the pure-python reader's
    GeoTiffInfo (via='gdal' marks the window-read path to use)."""
    import rasterio

    from rasterframes_spark.sources.geotiff import GeoTiffInfo

    with rasterio.open(_local_path(uri)) as ds:
        b = ds.bounds
        return GeoTiffInfo(
            width=int(ds.width), height=int(ds.height), bands=int(ds.count),
            dtype=np.dtype(ds.dtypes[0]).name,
            nodata=None if ds.nodata is None else float(ds.nodata),
            crs=str(ds.crs) if ds.crs else "EPSG:4326",
            extent=(float(b.left), float(b.bottom),
                    float(b.right), float(b.top)),
            tile_width=None, tile_height=None, rows_per_strip=None,
            compression=0, chunk_offsets=[], chunk_counts=[],
            byte_order="<", pixel_scale=(), tiepoint=(), predictor=1,
            via="gdal",
        )


def read_window_rasterio(uri: str, col_off: int, row_off: int,
                         width: int, height: int, band: int = 0) -> np.ndarray:
    import rasterio
    from rasterio.windows import Window

    with rasterio.open(_local_path(uri)) as ds:
        return np.asarray(ds.read(
            band + 1, window=Window(col_off, row_off, width, height)))
