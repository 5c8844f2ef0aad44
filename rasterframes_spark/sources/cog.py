"""Distributed Cloud-Optimized GeoTIFF (COG) writer.

The reference's GeoTIFF sink collects every tile to the driver and is
documented as "not big data friendly" (GeoTiffDataSource.scala:61-102); its
COG story is delegated to GeoTrellis. Here the export IS big-data friendly:

- executors DEFLATE-compress each tile block in parallel (``mapInPandas``),
  including every pyramid overview level (built with the distributed
  :func:`~rasterframes_spark.operators.pyramid.pyramid_up` operator — one
  shuffle per level);
- the driver collects only a tiny size manifest ``(level, tr, tc, nbytes)``
  to lay out the multi-IFD header, then streams the compressed chunks to
  disk with ``toLocalIterator`` in deterministic (level, row-major) order —
  the full-resolution mosaic never exists in any single process's memory;
- grid positions with no input tile are written as sparse entries
  (offset 0 / bytecount 0 — the GDAL sparse-COG convention), so a
  half-empty 100k x 100k raster costs no data bytes for the empty half.

COG layout contract (what makes it "cloud-optimized"): header + all IFDs
live at the start of the file so one small range-read plans any window;
overview tile data precedes full-resolution data (smallest level first) so
zoomed-out reads touch only the file head; tiles within a level are
row-major. Readable back by this package's own pure-python TIFF reader
(``sources/geotiff.py``) including HTTP range-windowed reads via
``sources/rangeio.py``.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from rasterframes_spark.sources.geotiff import _FMT_FOR_KIND, _TAG_FMT

__all__ = ["write_cog"]

_CHUNK_SCHEMA = "level int, tr int, tc int, nb long, data binary"


def _compress_level(level: int, nodata_fill, out_dtype: str) -> "callable":
    from rasterframes_spark.tile import decode_struct_pdf

    def gen(batches):
        dt = np.dtype(out_dtype)
        for pdf in batches:
            if not len(pdf):
                continue
            tiles = decode_struct_pdf(pdf[["cell_type", "cols", "rows", "cells"]])
            out_tr, out_tc, out_nb, out_data = [], [], [], []
            for tr, tc, t in zip(pdf["tr"], pdf["tc"], tiles):
                if t is None:
                    continue
                fill = nodata_fill
                if fill is None:
                    fill = t.cell_type.nodata if t.cell_type.nodata is not None else 0
                arr = np.ma.filled(t.masked(), fill)
                if arr.dtype != dt:
                    # overview levels of integer rasters come back float
                    # from mean pooling — round back into the declared type
                    if np.issubdtype(dt, np.integer):
                        arr = np.rint(arr)
                    arr = arr.astype(dt)
                blob = zlib.compress(
                    arr.astype(dt.newbyteorder("<")).tobytes(), 6)
                out_tr.append(int(tr))
                out_tc.append(int(tc))
                out_nb.append(len(blob))
                out_data.append(blob)
            if out_tr:
                yield pd.DataFrame({
                    "level": np.full(len(out_tr), level, dtype="int32"),
                    "tr": np.asarray(out_tr, dtype="int32"),
                    "tc": np.asarray(out_tc, dtype="int32"),
                    "nb": np.asarray(out_nb, dtype="int64"),
                    "data": out_data,
                })

    return gen


def _pack_tag(tag, typ, values, inline):
    if typ == 2:
        raw = values if isinstance(values, bytes) else bytes(values)
        count = len(raw)
    else:
        raw = struct.pack("<" + _TAG_FMT[typ] * len(values), *values)
        count = len(values)
    return tag, typ, count, raw


def _build_header(ifd_tag_lists, big):
    """Pack header + IFD chain + overflow area. Returns (bytes, data_base):
    every tag value containing a file offset must already be final, so call
    this twice — once with placeholder offsets to learn ``data_base``, then
    with real offsets (sizes don't change: offset arrays have fixed counts
    and fixed-width types)."""
    if big:
        header = b"II" + struct.pack("<HHHQ", 43, 8, 0, 16)
        entry_hdr, ptr_fmt, inline, cnt_pack, next_pack = "<HHQ", "<Q", 8, "<Q", "<Q"
        entry_sz, cnt_sz, next_sz = 20, 8, 8
    else:
        header = b"II" + struct.pack("<HI", 42, 8)
        entry_hdr, ptr_fmt, inline, cnt_pack, next_pack = "<HHI", "<I", 4, "<H", "<I"
        entry_sz, cnt_sz, next_sz = 12, 2, 4

    packed_ifds = []
    for tags in ifd_tag_lists:
        packed = [_pack_tag(t, ty, v, inline) for t, ty, v in sorted(tags)]
        packed_ifds.append(packed)

    ifd_sizes = [cnt_sz + entry_sz * len(p) + next_sz for p in packed_ifds]
    ifd_offsets = []
    pos = len(header)
    for s in ifd_sizes:
        ifd_offsets.append(pos)
        pos += s
    overflow_base = pos
    overflow = b""
    # assign overflow positions
    out = bytearray(header)
    ov_pos = overflow_base
    bodies = []
    for i, packed in enumerate(packed_ifds):
        body = b""
        for tag, typ, count, raw in packed:
            if len(raw) <= inline:
                body += struct.pack(entry_hdr, tag, typ, count) + raw.ljust(
                    inline, b"\x00")
            else:
                body += struct.pack(entry_hdr, tag, typ, count) + struct.pack(
                    ptr_fmt, ov_pos)
                ov_pos += len(raw)
                overflow += raw
        nxt = ifd_offsets[i + 1] if i + 1 < len(packed_ifds) else 0
        bodies.append(struct.pack(cnt_pack, len(packed)) + body
                      + struct.pack(next_pack, nxt))
    for b in bodies:
        out += b
    out += overflow
    return bytes(out), ov_pos


def write_cog(df: DataFrame, path: str, tile_col: str = "tile",
              key_col: str = "spatial_key", extent_col: str = "extent",
              crs: str = "EPSG:4326", nodata: float | None = None,
              overview_resample: str = "mean", min_overview_tiles: int = 2,
              big: bool | str = "auto") -> dict:
    """Write a layer-shaped DataFrame as one Cloud-Optimized GeoTIFF.

    ``df`` holds uniform-dimension tiles on a grid: ``key_col`` is a
    ``struct<col:int,row:int>`` spatial key (row 0 = northernmost, matching
    the layer/pyramid convention) and ``extent_col`` each tile's extent.
    Missing grid cells become sparse (zero-byte) COG tiles.

    Scale posture: compression runs on executors; the driver never holds
    more than one compressed chunk plus the (level, tr, tc, nbytes)
    manifest — ~16 bytes per tile, i.e. a 1M-tile raster costs the driver
    ~16 MB of manifest, not the 100s-of-GB mosaic. Overviews are built
    with :func:`pyramid_up` (one shuffle per level, 4 tiles per group).

    Returns a summary dict (width/height/levels/sizes). Reference parity:
    GeoTiffDataSource.scala:61-102 is the driver-side merge this replaces;
    COG layout follows the cogeo spec (IFDs first, overviews before full
    resolution, row-major tiles).
    """
    from rasterframes_spark.operators.pyramid import pyramid_up

    meta = df.select(
        F.min(F.col(f"{key_col}.col")).alias("c0"),
        F.max(F.col(f"{key_col}.col")).alias("c1"),
        F.min(F.col(f"{key_col}.row")).alias("r0"),
        F.max(F.col(f"{key_col}.row")).alias("r1"),
        F.min(F.col(f"{extent_col}.xmin")).alias("xmin"),
        F.min(F.col(f"{extent_col}.ymin")).alias("ymin"),
        F.max(F.col(f"{extent_col}.xmax")).alias("xmax"),
        F.max(F.col(f"{extent_col}.ymax")).alias("ymax"),
        F.first(F.col(f"{tile_col}.cols")).alias("tw"),
        F.first(F.col(f"{tile_col}.rows")).alias("th"),
        F.first(F.col(f"{tile_col}.cell_type")).alias("ct"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    if meta["n"] == 0:
        raise ValueError("write_cog: empty DataFrame")
    tw, th = int(meta["tw"]), int(meta["th"])
    from rasterframes_spark.tile import CellType
    ct = CellType.parse(meta["ct"])
    dt = ct.dtype
    if dt.kind not in _FMT_FOR_KIND:
        raise ValueError(f"write_cog: unsupported dtype {dt}")
    fill = nodata if nodata is not None else (
        ct.nodata if ct.nodata is not None else 0)

    # normalize keys to a 0-based grid
    base = df.select(
        F.struct(
            (F.col(f"{key_col}.col") - F.lit(int(meta["c0"]))).cast("int").alias("col"),
            (F.col(f"{key_col}.row") - F.lit(int(meta["r0"]))).cast("int").alias("row"),
        ).alias("spatial_key"),
        F.col(tile_col).alias("tile"),
        F.col(extent_col).alias("extent"),
    )
    gw = int(meta["c1"]) - int(meta["c0"]) + 1   # grid tiles across
    gh = int(meta["r1"]) - int(meta["r0"]) + 1
    W, H = gw * tw, gh * th
    xmin, ymin, xmax, ymax = (float(meta["xmin"]), float(meta["ymin"]),
                              float(meta["xmax"]), float(meta["ymax"]))

    # level plan: halve the grid until it's tiny (every level keeps the
    # same tile size; level k grid is ceil(g / 2^k))
    grids = [(gw, gh)]
    while max(grids[-1]) > min_overview_tiles:
        grids.append((math.ceil(grids[-1][0] / 2), math.ceil(grids[-1][1] / 2)))
    n_levels = len(grids)

    # per-level chunk frames — compression happens on executors
    frames = []
    lvl = base
    for L in range(n_levels):
        cells = lvl.select(
            F.col("spatial_key.row").alias("tr"),
            F.col("spatial_key.col").alias("tc"),
            F.col("tile.cell_type").alias("cell_type"),
            F.col("tile.cols").alias("cols"),
            F.col("tile.rows").alias("rows"),
            F.col("tile.cells").alias("cells"),
        )
        frames.append(cells.mapInPandas(_compress_level(L, fill, dt.str),
                                        schema=_CHUNK_SCHEMA))
        if L + 1 < n_levels:
            lvl = pyramid_up(lvl, "tile", "spatial_key", "extent",
                             method=overview_resample)
    chunks = frames[0]
    for f in frames[1:]:
        chunks = chunks.unionByName(f)
    chunks = chunks.persist()
    try:
        size_rows = chunks.select("level", "tr", "tc", "nb").collect()
        manifest = {(int(r["level"]), int(r["tr"]), int(r["tc"])): int(r["nb"])
                    for r in size_rows}
        if len(manifest) != len(size_rows):
            raise ValueError(
                "write_cog: duplicate spatial keys in input — one tile per "
                "grid cell required (aggregate upstream, e.g. agg_local)")

        # data ordering: smallest overview first, then down to full res;
        # row-major within a level
        data_order = []
        for L in range(n_levels - 1, -1, -1):
            lw, lh = grids[L]
            for tr in range(lh):
                for tc in range(lw):
                    data_order.append((L, tr, tc))
        total_data = sum(manifest.get(k, 0) for k in data_order)
        if big == "auto":
            big = total_data + 64 * 1024 + 40 * len(data_order) > 0xFFFF0000

    # --- build IFDs (two passes: sizes first, then real offsets) -----
        bits = dt.itemsize * 8
        fmt = _FMT_FOR_KIND[dt.kind]
        sx, sy = (xmax - xmin) / W, (ymax - ymin) / H
        epsg = 4326
        c = crs.strip().upper()
        if c.startswith("EPSG:"):
            epsg = int(c.split(":")[1])
        model_type = 2 if epsg == 4326 else 1
        geo_key_id = 2048 if model_type == 2 else 3072
        geokeys = [1, 1, 0, 3, 1024, 0, 1, model_type, 1025, 0, 1, 1,
                   geo_key_id, 0, 1, epsg]
        off_typ = 16 if big else 4

        def level_tags(L, offsets):
            lw, lh = grids[L]
            tags = [
                (256, 3, [lw * tw]), (257, 3, [lh * th]),
                (258, 3, [bits]), (259, 3, [8]), (262, 3, [1]),
                (277, 3, [1]), (284, 3, [1]),
                (322, 3, [tw]), (323, 3, [th]), (339, 3, [fmt]),
                (324, off_typ, offsets[L]),
                (325, off_typ, [manifest.get((L, tr, tc), 0)
                                for tr in range(lh) for tc in range(lw)]),
            ]
            if L == 0:
                tags += [
                    (33550, 12, [sx, sy, 0.0]),
                    (33922, 12, [0.0, 0.0, 0.0, xmin, ymax, 0.0]),
                    (34735, 3, geokeys),
                    (42113, 2, f"{fill} ".encode("ascii") + b"\x00"),
                ]
            else:
                tags.append((254, 4, [1]))  # NewSubfileType: reduced image
            return tags

        zero_offsets = {L: [0] * (grids[L][0] * grids[L][1])
                        for L in range(n_levels)}
        hdr, data_base = _build_header(
            [level_tags(L, zero_offsets) for L in range(n_levels)], big)

        # real chunk offsets in write order; sparse tiles keep offset 0
        offsets = {L: [0] * (grids[L][0] * grids[L][1]) for L in range(n_levels)}
        pos = data_base
        for L, tr, tc in data_order:
            nb = manifest.get((L, tr, tc), 0)
            if nb:
                offsets[L][tr * grids[L][0] + tc] = pos
                pos += nb
        hdr, data_base2 = _build_header(
            [level_tags(L, offsets) for L in range(n_levels)], big)
        assert data_base2 == data_base, "IFD layout changed between passes"

        # --- stream ---------------------------------------------------
        written = 0
        with open(path, "wb") as fh:
            fh.write(hdr)
            for L in range(n_levels - 1, -1, -1):
                it = (chunks.where(F.col("level") == L)
                      .orderBy("tr", "tc").toLocalIterator())
                for r in it:
                    blob = bytes(r["data"])
                    if len(blob) != manifest[(L, int(r["tr"]), int(r["tc"]))]:
                        raise RuntimeError(
                            "write_cog: nondeterministic recompute — chunk "
                            "size changed between manifest and stream")
                    fh.write(blob)
                    written += len(blob)
        return {
            "width": W, "height": H, "tile_size": (tw, th),
            "levels": n_levels,
            "grids": grids,
            "tiles_written": len(manifest),
            "tiles_sparse": len(data_order) - len(manifest),
            "data_bytes": written,
            "file_bytes": data_base + written,
            "bigtiff": bool(big),
        }
    finally:
        chunks.unpersist()
