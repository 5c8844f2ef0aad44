"""GDAL VRT (virtual raster) reader — pure python (stdlib ElementTree).

A `.vrt` is GDAL's XML glue format: a virtual mosaic whose bands are
composed from rectangles of other rasters (``SimpleSource``), optionally
value-transformed (``ComplexSource``: scale/offset, source-NODATA
masking).  The reference reads VRTs through GDAL
(`core/.../ref/RFRasterSource.scala:105-158`); here the VRT itself is
parsed natively and its sources resolve through the engine's own format
dispatch (GeoTIFF/COG, JP2, NetCDF, nested VRTs — whatever
``read_window_any`` routes), so a VRT over COGs stays lazy: only the
source windows a query's tiles touch are fetched.

Scope (asserted): axis-aligned GeoTransform (no rotation terms),
SimpleSource/ComplexSource with SrcRect/DstRect (any integer or
fractional scale, nearest resampling — GDAL's default for VRT),
ComplexSource ScaleRatio/ScaleOffset/NODATA, relativeToVRT source
paths, per-band NoDataValue.  Unsupported elements (KernelFilteredSource,
rotation) raise ValueError, routing the file to the rasterio hatch.
"""

from __future__ import annotations

import functools
import os
import xml.etree.ElementTree as ET

import numpy as np

from rasterframes_spark.sources.geotiff import GeoTiffInfo

__all__ = ["read_info", "read_window"]

_DTYPES = {
    "Byte": "uint8", "UInt16": "uint16", "Int16": "int16",
    "UInt32": "uint32", "Int32": "int32",
    "Float32": "float32", "Float64": "float64",
}


def _crs_from_srs(text: str | None) -> str:
    if not text:
        return ""
    t = text.strip()
    if t.upper().startswith("EPSG:"):
        return t.upper()
    # WKT: take the LAST AUTHORITY["EPSG","nnnn"] (the whole-CRS one)
    import re

    m = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', t)
    if m:
        return f"EPSG:{m[-1]}"
    m = re.findall(r'ID\[\s*"EPSG"\s*,\s*(\d+)\s*\]', t)  # WKT2
    if m:
        return f"EPSG:{m[-1]}"
    return t


def _rect(el, tag):
    r = el.find(tag)
    if r is None:
        return None
    try:
        return (float(r.get("xOff", 0)), float(r.get("yOff", 0)),
                float(r.get("xSize")), float(r.get("ySize")))
    except TypeError as e:
        raise ValueError(f"VRT: {tag} missing xSize/ySize") from e


class _VrtSource:
    __slots__ = ("path", "band", "src_rect", "dst_rect", "ratio", "offset",
                 "src_nodata")

    def __init__(self, el, base_dir: str):
        fn = el.find("SourceFilename")
        if fn is None or not (fn.text or "").strip():
            raise ValueError("VRT: source without SourceFilename")
        path = fn.text.strip()
        if fn.get("relativeToVRT", "0") == "1" and not path.startswith(
                ("http://", "https://", "/")):
            path = os.path.join(base_dir, path)
        self.path = path
        self.band = int((el.findtext("SourceBand") or "1").strip())
        self.src_rect = _rect(el, "SrcRect")
        self.dst_rect = _rect(el, "DstRect")
        self.ratio = float((el.findtext("ScaleRatio") or "1").strip())
        self.offset = float((el.findtext("ScaleOffset") or "0").strip())
        nd = el.findtext("NODATA")
        self.src_nodata = float(nd.strip()) if nd and nd.strip() else None


@functools.lru_cache(maxsize=64)
def _parse(xml_bytes: bytes, base_dir: str):
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        raise ValueError(f"VRT: XML parse error: {e}") from e
    if root.tag != "VRTDataset":
        raise ValueError("VRT: root element is not VRTDataset")
    try:
        w = int(root.get("rasterXSize"))
        h = int(root.get("rasterYSize"))
    except (TypeError, ValueError) as e:
        # corrupt-input contract: a mutated attribute name makes .get()
        # return None and int(None) is a TypeError, not the dispatcher's
        # "not this format" ValueError (r12 fuzz finding)
        raise ValueError("VRT: missing or bad rasterXSize/rasterYSize") \
            from e
    if not (0 < w <= (1 << 26) and 0 < h <= (1 << 26)):
        raise ValueError("VRT: implausible raster size")
    gt_text = root.findtext("GeoTransform")
    if gt_text:
        gt = [float(v) for v in gt_text.split(",")]
        if len(gt) != 6:
            raise ValueError("VRT: GeoTransform needs 6 values")
        if gt[2] != 0 or gt[4] != 0:
            raise ValueError("VRT: rotated GeoTransform not supported")
        if gt[5] >= 0:
            raise ValueError("VRT: north-down GeoTransform not supported")
        extent = (gt[0], gt[3] + gt[5] * h, gt[0] + gt[1] * w, gt[3])
        pixel_scale = (gt[1], -gt[5], 0.0)
    else:
        extent = (0.0, 0.0, float(w), float(h))
        pixel_scale = (1.0, 1.0, 0.0)
    crs = _crs_from_srs(root.findtext("SRS"))

    bands = {}
    dtype = "float64"
    nodata = None
    for bel in root.findall("VRTRasterBand"):
        bi = int(bel.get("band", len(bands) + 1))
        dt = bel.get("dataType", "Float64")
        if dt not in _DTYPES:
            raise ValueError(f"VRT: unsupported dataType {dt!r}")
        if bi == 1:
            dtype = _DTYPES[dt]
            nd = bel.findtext("NoDataValue")
            nodata = float(nd.strip()) if nd and nd.strip() else None
        srcs = []
        for sel in bel:
            if sel.tag in ("SimpleSource", "ComplexSource"):
                srcs.append(_VrtSource(sel, base_dir))
            elif sel.tag.endswith("Source"):
                raise ValueError(f"VRT: {sel.tag} not supported")
        bands[bi] = (_DTYPES[dt], srcs)
    if not bands:
        raise ValueError("VRT: no VRTRasterBand elements")
    return w, h, crs, extent, pixel_scale, dtype, nodata, bands


def _vrt_bytes(src) -> bytes:
    head = src.read_range(0, 512)
    probe = head.lstrip()[:64]
    if not (probe.startswith(b"<VRTDataset")
            or (probe.startswith(b"<?xml") and b"<VRTDataset" in
                src.read_range(0, 4096))):
        raise ValueError("not a VRT (no VRTDataset root)")
    return src.read_range(0, src.size())


def read_info(src) -> GeoTiffInfo:
    """RangeSource -> GeoTiffInfo (via='vrt'); raises ValueError when the
    bytes are not a VRT document."""
    raw = _vrt_bytes(src)
    base_dir = os.path.dirname(src.uri[7:] if src.uri.startswith("file://")
                               else src.uri)
    w, h, crs, extent, pixel_scale, dtype, nodata, bands = _parse(
        raw, base_dir)
    return GeoTiffInfo(
        width=w, height=h, bands=max(bands), dtype=dtype, nodata=nodata,
        crs=crs, extent=extent, tile_width=None, tile_height=None,
        rows_per_strip=None, compression=0, chunk_offsets=[],
        chunk_counts=[], byte_order="<",
        pixel_scale=pixel_scale,
        tiepoint=(0.0, 0.0, 0.0, extent[0], extent[3], 0.0),
        via="vrt")


def read_window(src, info: GeoTiffInfo, c0: int, r0: int, w: int, h: int,
                band: int = 0) -> np.ndarray:
    """Compose window [c0, c0+w) x [r0, r0+h) of 1-indexed VRT band
    ``band + 1`` from its sources (painter's order; ComplexSource NODATA
    pixels don't paint). Pixels no source covers hold the band NoData
    (or 0 when the band declares none)."""
    from rasterframes_spark.sources.raster_reader import read_window_any

    raw = _vrt_bytes(src)
    base_dir = os.path.dirname(src.uri[7:] if src.uri.startswith("file://")
                               else src.uri)
    _, _, _, _, _, _, nodata, bands = _parse(raw, base_dir)
    if band + 1 not in bands:
        raise ValueError(f"VRT: band {band + 1} not present")
    dtype, srcs = bands[band + 1]
    fill = nodata if nodata is not None else 0
    out = np.full((h, w), fill, dtype=dtype)

    for s in srcs:
        sx0, sy0, sw, sh = s.src_rect or (0.0, 0.0, None, None)
        dx0, dy0, dw, dh = s.dst_rect or (0.0, 0.0, None, None)
        if sw is None or dw is None:
            # default rects = full source at 1:1 onto the same-size dst
            from rasterframes_spark.sources.raster_reader import _cached_info

            si = _cached_info(s.path)
            if sw is None:
                sx0, sy0, sw, sh = 0.0, 0.0, float(si.width), float(si.height)
            if dw is None:
                dx0, dy0, dw, dh = 0.0, 0.0, sw, sh
        # window ∩ dst rect, in dst (vrt) pixel coords
        ix0 = max(c0, int(np.floor(dx0)))
        iy0 = max(r0, int(np.floor(dy0)))
        ix1 = min(c0 + w, int(np.ceil(dx0 + dw)))
        iy1 = min(r0 + h, int(np.ceil(dy0 + dh)))
        if ix0 >= ix1 or iy0 >= iy1:
            continue
        # nearest-neighbor source index per covered dst pixel
        fx, fy = sw / dw, sh / dh
        src_cols = np.clip((( np.arange(ix0, ix1) - dx0 + 0.5) * fx + sx0)
                           .astype(np.int64), 0, None)
        src_rows = np.clip((( np.arange(iy0, iy1) - dy0 + 0.5) * fy + sy0)
                           .astype(np.int64), 0, None)
        # fetch the bounding source window once, then gather
        scol0, scol1 = int(src_cols.min()), int(src_cols.max()) + 1
        srow0, srow1 = int(src_rows.min()), int(src_rows.max()) + 1
        block = read_window_any(s.path, scol0, srow0,
                                scol1 - scol0, srow1 - srow0, s.band - 1)
        vals = block[np.ix_(src_rows - srow0, src_cols - scol0)]
        vals = np.asarray(vals, dtype="float64")
        if s.ratio != 1.0 or s.offset != 0.0:
            painted = vals * s.ratio + s.offset
        else:
            painted = vals
        if np.issubdtype(dtype, np.integer):
            # GDAL semantics: round half away from zero, clamp to the
            # band type's range (astype would truncate and wrap)
            info = np.iinfo(dtype)
            painted = np.clip(np.trunc(painted + np.copysign(0.5, painted)),
                              info.min, info.max)
        tgt = out[iy0 - r0:iy1 - r0, ix0 - c0:ix1 - c0]
        if s.src_nodata is not None:
            mask = vals != s.src_nodata
            tgt[mask] = painted[mask].astype(dtype)
        else:
            tgt[...] = painted.astype(dtype)
    return out
