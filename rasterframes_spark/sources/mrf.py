"""MRF (Meta Raster Format) reader/writer — pure python.

MRF is the NASA GIBS / GDAL tiled-raster format: a small XML metadata
file (`.mrf`), a flat index file (`.idx`: one big-endian
(offset: uint64, size: uint64) record per tile, row-major; size 0 =
empty tile), and a data file holding independently-compressed tile
payloads (PNG -> `.ppg`, JPEG -> `.pjg`, raw -> `.til`).  The payload
codecs are this repo's own externally-validated PNG/JPEG decoders, so
only the thin container layout is new here.

Scope (asserted): base resolution level (Rsets/overviews ignored —
``read_raster`` chunks the base level), single-band pages or
band-separate pages via the ``c`` dimension of PageSize, PNG / JPEG /
NONE compression, axis-aligned BoundingBox georeferencing.  LERC and
interleaved multi-band pages raise and route to the rasterio hatch.

No GDAL-written MRF fixture exists in this container (tests round-trip
through :func:`write_mrf`); the container layout follows the public
GDAL driver documentation, and the payload bytes inside are covered by
the cross-encoder image fixtures (tests/test_cross_format_images.py).
"""

from __future__ import annotations

import functools
import os
import struct
import xml.etree.ElementTree as ET

import numpy as np

from rasterframes_spark.sources.geotiff import GeoTiffInfo

__all__ = ["read_info", "read_window", "write_mrf"]

_EXT = {"PNG": ".ppg", "JPEG": ".pjg", "NONE": ".til"}
_DTYPES = {"Byte": "uint8", "UInt16": "uint16", "Int16": "int16",
           "UInt32": "uint32", "Int32": "int32",
           "Float32": "float32", "Float64": "float64"}
_DT_BACK = {v: k for k, v in _DTYPES.items()}


def _strict(fn):
    """Corrupt metadata/index bytes surface as the format-dispatch
    contract's ValueError — missing XML elements/attributes otherwise
    escape as AttributeError/TypeError from the element walk (r10
    corruption fuzz)."""
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (AttributeError, TypeError, KeyError, IndexError,
                struct.error) as e:
            raise ValueError(f"MRF: malformed file ({e})") from e
    return wrapped


@functools.lru_cache(maxsize=64)
@_strict
def _parse(xml_bytes: bytes, base: str):
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        raise ValueError(f"MRF: XML parse error: {e}") from e
    if root.tag != "MRF_META":
        raise ValueError("MRF: root element is not MRF_META")
    raster = root.find("Raster")
    if raster is None:
        raise ValueError("MRF: missing Raster element")
    size = raster.find("Size")
    w, h = int(size.get("x")), int(size.get("y"))
    bands = int(size.get("c", 1))
    page = raster.find("PageSize")
    pw = int(page.get("x", 512)) if page is not None else 512
    ph = int(page.get("y", 512)) if page is not None else 512
    pc = int(page.get("c", 1)) if page is not None else 1
    if pc != 1:
        raise ValueError(
            "MRF: band-interleaved pages not supported (use c=1 pages)")
    comp = (raster.findtext("Compression") or "NONE").strip().upper()
    if comp not in _EXT:
        raise ValueError(f"MRF: compression {comp!r} not supported "
                         "(PNG/JPEG/NONE)")
    dt = (raster.findtext("DataType") or "Byte").strip()
    if dt not in _DTYPES:
        raise ValueError(f"MRF: unsupported DataType {dt!r}")
    nd_el = root.find(".//DataValues")
    nodata = None
    if nd_el is not None and nd_el.get("NoData") is not None:
        nodata = float(nd_el.get("NoData"))
    bbox = root.find(".//BoundingBox")
    if bbox is not None:
        extent = (float(bbox.get("minx")), float(bbox.get("miny")),
                  float(bbox.get("maxx")), float(bbox.get("maxy")))
    else:
        extent = (0.0, 0.0, float(w), float(h))
    crs = (root.findtext(".//Projection") or "").strip()
    if crs.upper().startswith("EPSG:"):
        crs = crs.upper()
    data_file = (root.findtext(".//DataFile") or "").strip() \
        or base + _EXT[comp]
    index_file = (root.findtext(".//IndexFile") or "").strip() \
        or base + ".idx"
    d = os.path.dirname(base)
    if data_file and not os.path.isabs(data_file) and "://" not in data_file:
        data_file = os.path.join(d, os.path.basename(data_file))
    if index_file and not os.path.isabs(index_file) \
            and "://" not in index_file:
        index_file = os.path.join(d, os.path.basename(index_file))
    return (w, h, bands, pw, ph, comp, _DTYPES[dt], nodata, extent, crs,
            data_file, index_file)


def _base_of(uri: str) -> str:
    p = uri[7:] if uri.startswith("file://") else uri
    return p[:-4] if p.lower().endswith(".mrf") else p


def read_info(src) -> GeoTiffInfo:
    head = src.read_range(0, 256).lstrip()
    if not (head.startswith(b"<MRF_META")
            or (head.startswith(b"<?xml") and b"<MRF_META" in head)):
        raise ValueError("not an MRF (no MRF_META root)")
    raw = src.read_range(0, src.size())
    (w, h, bands, pw, ph, comp, dtype, nodata, extent, crs,
     _, _) = _parse(raw, _base_of(src.uri))
    return GeoTiffInfo(
        width=w, height=h, bands=bands, dtype=dtype, nodata=nodata,
        crs=crs, extent=extent, tile_width=pw, tile_height=ph,
        rows_per_strip=None, compression=0, chunk_offsets=[],
        chunk_counts=[], byte_order="<",
        pixel_scale=((extent[2] - extent[0]) / w,
                     (extent[3] - extent[1]) / h, 0.0),
        tiepoint=(0.0, 0.0, 0.0, extent[0], extent[3], 0.0),
        via="mrf")


def _decode_page(payload: bytes, comp: str, pw: int, ph: int,
                 dtype: str) -> np.ndarray:
    if comp == "PNG":
        from rasterframes_spark.sources.png import decode_png

        a = decode_png(payload)
        if a.ndim == 3:
            a = a[:, :, 0]
        return a.astype(dtype, copy=False)
    if comp == "JPEG":
        from rasterframes_spark.sources.jpeg import decode_jpeg

        a = decode_jpeg(payload)
        if a.ndim == 3:
            a = a[:, :, 0]
        return a.astype(dtype, copy=False)
    a = np.frombuffer(payload, dtype=np.dtype(dtype).newbyteorder("<"))
    return a.reshape(ph, pw).astype(dtype, copy=False)


@_strict
def read_window(src, info: GeoTiffInfo, c0: int, r0: int, w: int, h: int,
                band: int = 0) -> np.ndarray:
    """Windowed read from the base level: fetch + decode only the pages
    the window touches (index records are 16 bytes each, range-read)."""
    from rasterframes_spark.sources.rangeio import RangeSource

    raw = src.read_range(0, src.size())
    (W, H, bands, pw, ph, comp, dtype, nodata, _, _,
     data_file, index_file) = _parse(raw, _base_of(src.uri))
    if not 0 <= band < bands:
        raise ValueError(f"MRF: band {band} out of range (file has {bands})")
    nx = -(-W // pw)
    ny = -(-H // ph)
    idx_src = RangeSource(index_file)
    dat_src = RangeSource(data_file)
    fill = nodata if nodata is not None else 0
    out = np.full((h, w), fill, dtype=dtype)
    tx0, tx1 = c0 // pw, min((c0 + w - 1) // pw, nx - 1)
    ty0, ty1 = r0 // ph, min((r0 + h - 1) // ph, ny - 1)
    for ty in range(ty0, ty1 + 1):
        for tx in range(tx0, tx1 + 1):
            # band-separate pages: band-major then row-major (GDAL's
            # z/c-outer layout for c=1 PageSize)
            rec = (band * ny * nx + ty * nx + tx) * 16
            off, size = struct.unpack(">QQ", idx_src.read_range(rec, 16))
            if size == 0:
                continue  # empty page = NoData
            page = _decode_page(dat_src.read_range(off, size), comp,
                                pw, ph, dtype)
            px0, py0 = tx * pw, ty * ph
            sx0 = max(c0, px0)
            sy0 = max(r0, py0)
            sx1 = min(c0 + w, px0 + pw, W)
            sy1 = min(r0 + h, py0 + ph, H)
            out[sy0 - r0:sy1 - r0, sx0 - c0:sx1 - c0] = \
                page[sy0 - py0:sy1 - py0, sx0 - px0:sx1 - px0]
    return out


def write_mrf(path: str, arr: np.ndarray, extent=None, crs: str = "",
              page_size: tuple = (512, 512), compression: str = "PNG",
              nodata=None) -> None:
    """(H, W) or (H, W, bands) integer array -> ``path``(.mrf) + sibling
    index/data files.  Pages holding only ``nodata`` write as empty
    index records (the sparse-tile contract that makes MRF cheap for
    mostly-empty global grids)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    H, W, bands = arr.shape
    comp = compression.upper()
    if comp not in _EXT:
        raise ValueError("write_mrf: compression must be PNG/JPEG/NONE")
    dt = _DT_BACK.get(str(arr.dtype))
    if dt is None:
        raise ValueError(f"write_mrf: unsupported dtype {arr.dtype}")
    if comp == "JPEG" and arr.dtype != np.uint8:
        raise ValueError("write_mrf: JPEG pages need uint8 data")
    if comp == "PNG" and arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("write_mrf: PNG pages need uint8/uint16 data")
    pw, ph = page_size
    base = path[:-4] if path.lower().endswith(".mrf") else path
    nx, ny = -(-W // pw), -(-H // ph)
    recs = []
    data = bytearray()
    for b in range(bands):
        for ty in range(ny):
            for tx in range(nx):
                page = np.full((ph, pw), nodata if nodata is not None else 0,
                               dtype=arr.dtype)
                px1 = min((tx + 1) * pw, W)
                py1 = min((ty + 1) * ph, H)
                blk = arr[ty * ph:py1, tx * pw:px1, b]
                if nodata is not None and (blk == nodata).all():
                    recs.append((0, 0))
                    continue
                page[:py1 - ty * ph, :px1 - tx * pw] = blk
                if comp == "PNG":
                    from rasterframes_spark.sources.png import encode_png

                    payload = encode_png(page)
                elif comp == "JPEG":
                    from rasterframes_spark.sources.jpeg import encode_jpeg

                    payload = encode_jpeg(page)
                else:
                    payload = page.astype(
                        np.dtype(arr.dtype).newbyteorder("<")).tobytes()
                recs.append((len(data), len(payload)))
                data += payload
    if extent is None:
        extent = (0.0, 0.0, float(W), float(H))
    xml = (
        '<MRF_META><Raster>'
        f'<Size x="{W}" y="{H}" c="{bands}"/>'
        f'<PageSize x="{pw}" y="{ph}" c="1"/>'
        f'<Compression>{comp}</Compression>'
        f'<DataType>{dt}</DataType>'
        + (f'<DataValues NoData="{nodata}"/>' if nodata is not None else '')
        + '</Raster><GeoTags>'
        f'<BoundingBox minx="{extent[0]}" miny="{extent[1]}" '
        f'maxx="{extent[2]}" maxy="{extent[3]}"/>'
        + (f'<Projection>{crs}</Projection>' if crs else '')
        + '</GeoTags></MRF_META>')
    with open(base + ".mrf", "w") as f:
        f.write(xml)
    with open(base + ".idx", "wb") as f:
        for off, size in recs:
            f.write(struct.pack(">QQ", off, size))
    with open(base + _EXT[comp], "wb") as f:
        f.write(bytes(data))
