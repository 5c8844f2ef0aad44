"""Pure-python NetCDF-3 (classic) reader/writer + tile-chunk Spark source.

The reference reads NetCDF/HDF only through its GDAL branch
(`core/src/main/scala/org/locationtech/rasterframes/ref/RFRasterSource.scala:105-158`);
this engine decodes the classic format natively — no libs — which covers
the CDF-1 (32-bit offset) and CDF-2 (64-bit offset) files climate/ocean
products commonly ship. NetCDF-4 (an HDF5 container) is out of scope for
pure python; route those through the optional rasterio/GDAL fallback.

Format reference: the NetCDF classic format spec (CDF magic, big-endian;
header = dim_list / gatt_list / var_list with tags NC_DIMENSION=0x0A,
NC_ATTRIBUTE=0x0C, NC_VARIABLE=0x0B; fixed vars contiguous at `begin`,
record vars interleaved with `recsize` stride).

CF conventions honored: ``scale_factor`` / ``add_offset`` unpacking,
``_FillValue`` -> NoData mask, 1-D coordinate variables -> extent.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["NetcdfInfo", "read_netcdf_info", "read_netcdf_var",
           "write_netcdf", "read_netcdf", "read_info", "read_window"]

_NC_TYPES = {1: ("i1", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4),
             5: (">f4", 4), 6: (">f8", 8)}
_ABSENT = (0, 0)


class NetcdfInfo:
    def __init__(self):
        self.dims: list[tuple[str, int]] = []   # (name, length); 0 = record
        self.attrs: dict = {}
        self.vars: dict = {}    # name -> dict(dimids, type, attrs, begin, vsize)
        self.numrecs = 0
        self.version = 1
        self.recsize = 0
        self.header_end = 0


def _read_name(data, off):
    (n,) = struct.unpack_from(">i", data, off)
    if n < 0 or n > len(data):
        raise ValueError("netcdf: bad name length")
    off += 4
    name = data[off:off + n].decode("utf-8")
    off += (n + 3) & ~3
    return name, off


def _read_values(data, off, nc_type, n):
    dt, sz = _NC_TYPES[nc_type]
    nbytes = sz * n
    if nc_type == 2:
        vals = data[off:off + n].decode("utf-8", errors="replace")
    else:
        vals = np.frombuffer(data, dtype=dt, count=n, offset=off)
        vals = vals.tolist() if n > 1 else vals[0].item()
    off += (nbytes + 3) & ~3
    return vals, off


def _read_attrs(data, off):
    tag, n = struct.unpack_from(">ii", data, off)
    off += 8
    if (tag, n) == _ABSENT:
        return {}, off
    if tag != 0x0C:
        raise ValueError(f"netcdf: bad attribute-list tag {tag:#x}")
    if n < 0 or n > len(data):
        raise ValueError("netcdf: bad attribute count")
    attrs = {}
    for _ in range(n):
        name, off = _read_name(data, off)
        (t,) = struct.unpack_from(">i", data, off)
        (ne,) = struct.unpack_from(">i", data, off + 4)
        off += 8
        vals, off = _read_values(data, off, t, ne)
        attrs[name] = vals
    return attrs, off


def read_netcdf_info(data: bytes) -> NetcdfInfo:
    try:
        return _read_netcdf_info(data)
    except (struct.error, LookupError, UnicodeDecodeError, MemoryError,
            OverflowError) as e:
        # corrupt-row-drop contract: malformed input is ValueError, never
        # a raw struct/index error (same posture as the other codecs)
        raise ValueError(f"netcdf: malformed header ({e})") from e


def _read_netcdf_info(data: bytes) -> NetcdfInfo:
    if len(data) < 8 or data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("netcdf: not a classic CDF-1/CDF-2 file")
    info = NetcdfInfo()
    info.version = data[3]
    (info.numrecs,) = struct.unpack_from(">i", data, 4)
    if info.numrecs == -1:
        info.numrecs = 0  # STREAMING sentinel; recompute below
    off = 8
    tag, n = struct.unpack_from(">ii", data, off)
    off += 8
    if (tag, n) != _ABSENT:
        if tag != 0x0A:
            raise ValueError(f"netcdf: bad dim-list tag {tag:#x}")
        for _ in range(n):
            name, off = _read_name(data, off)
            (ln,) = struct.unpack_from(">i", data, off)
            off += 4
            info.dims.append((name, ln))
    info.attrs, off = _read_attrs(data, off)
    tag, n = struct.unpack_from(">ii", data, off)
    off += 8
    if (tag, n) != _ABSENT:
        if tag != 0x0B:
            raise ValueError(f"netcdf: bad var-list tag {tag:#x}")
        for _ in range(n):
            name, off = _read_name(data, off)
            (nd,) = struct.unpack_from(">i", data, off)
            off += 4
            if not 0 <= nd <= max(len(info.dims), 0):
                raise ValueError(f"netcdf: var {name!r} rank {nd} exceeds "
                                 f"{len(info.dims)} declared dims")
            dimids = list(struct.unpack_from(f">{nd}i", data, off)) if nd else []
            off += 4 * nd
            if any(d < 0 or d >= len(info.dims) for d in dimids):
                raise ValueError(f"netcdf: var {name!r} references "
                                 f"out-of-range dim id")
            vattrs, off = _read_attrs(data, off)
            (t,) = struct.unpack_from(">i", data, off)
            (vsize,) = struct.unpack_from(">i", data, off + 4)
            off += 8
            if t not in _NC_TYPES:
                raise ValueError(f"netcdf: var {name!r} has bad type {t}")
            if info.version == 1:
                (begin,) = struct.unpack_from(">I", data, off)
                off += 4
            else:
                (begin,) = struct.unpack_from(">Q", data, off)
                off += 8
            info.vars[name] = {"dimids": dimids, "type": t, "attrs": vattrs,
                               "begin": begin, "vsize": vsize}
    # record size = sum of record-var vsizes (each already padded to 4)
    rec_vars = [v for v in info.vars.values()
                if v["dimids"] and info.dims[v["dimids"][0]][1] == 0]
    info.recsize = sum(v["vsize"] for v in rec_vars)
    if len(rec_vars) == 1:
        # special case in the spec: a single record var is NOT padded
        v = rec_vars[0]
        dt, sz = _NC_TYPES[v["type"]]
        per_rec = sz
        for d in v["dimids"][1:]:
            per_rec *= info.dims[d][1]
        info.recsize = per_rec
    # where the header ends = where variable data begins.  The lazy
    # metadata path parses the header from a PREFIX read; `off` can run
    # past a truncated buffer only through a trailing string attribute
    # (char values slice short silently), so recording the end lets the
    # progressive reader detect that case and fetch a longer prefix.
    info.header_end = off
    return info


def read_netcdf_var(data: bytes, name: str,
                    info: NetcdfInfo | None = None,
                    unpack: bool = True) -> np.ndarray:
    """Full variable read -> numpy array shaped by its dims (record dim
    first when present). CF ``scale_factor``/``add_offset`` applied and
    ``_FillValue`` masked when ``unpack`` (mask survives scaling)."""
    info = info or read_netcdf_info(data)
    if name not in info.vars:
        raise ValueError(f"netcdf: no variable {name!r}")
    v = info.vars[name]
    dt, sz = _NC_TYPES[v["type"]]
    shape = [info.dims[d][1] for d in v["dimids"]]
    is_rec = bool(shape) and shape[0] == 0
    if is_rec:
        nrec = info.numrecs or _infer_numrecs(data, info)
        fixed = int(np.prod(shape[1:], dtype=np.int64)) if shape[1:] else 1
        # a corrupt header can declare a huge numrecs with recsize 0 —
        # the loop below would then spin on a constant offset forever
        # (every read succeeds); the declared layout must FIT the file
        if nrec and (info.recsize <= 0 or v["begin"]
                     + (nrec - 1) * info.recsize + fixed * sz > len(data)):
            raise ValueError("netcdf: record data past end of file")
        rows = []
        for r in range(nrec):
            o = v["begin"] + r * info.recsize
            rows.append(np.frombuffer(data, dtype=dt, count=fixed, offset=o))
        arr = (np.stack(rows).reshape([nrec] + shape[1:])
               if rows else np.empty([0] + shape[1:], dtype=dt))
    else:
        count = int(np.prod(shape, dtype=np.int64)) if shape else 1
        arr = np.frombuffer(data, dtype=dt, count=count,
                            offset=v["begin"]).reshape(shape)
    if v["type"] == 2:
        return arr
    arr = arr.astype(dt.lstrip(">"))  # native byte order
    return _apply_cf(arr, v) if unpack else arr


def _apply_cf(arr: np.ndarray, v: dict):
    """CF unpacking shared by the full and the ranged/windowed readers
    (one implementation so the lazy path cannot drift): ``_FillValue``
    masks FIRST, then ``scale_factor``/``add_offset`` apply (the mask
    survives scaling)."""
    fill = v["attrs"].get("_FillValue")
    if fill is not None:
        arr = np.ma.masked_equal(arr, fill)
    scale = v["attrs"].get("scale_factor")
    offset = v["attrs"].get("add_offset")
    if scale is not None or offset is not None:
        arr = arr * (scale if scale is not None else 1) + (
            offset if offset is not None else 0)
    return arr


def _infer_numrecs(data: bytes, info: NetcdfInfo) -> int:
    if not info.recsize:
        return 0
    first = min(v["begin"] for v in info.vars.values()
                if v["dimids"] and info.dims[v["dimids"][0]][1] == 0)
    return (len(data) - first) // info.recsize


# ---------------------------------------------------------------------------
# minimal writer (round-trip tests + interop fixtures)


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _w_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">i", len(b)) + _pad(b)


_DT_TO_NC = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}


def _w_attrs(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = [struct.pack(">ii", 0x0C, len(attrs))]
    for k, v in attrs.items():
        out.append(_w_name(k))
        if isinstance(v, str):
            b = v.encode("utf-8")
            out.append(struct.pack(">ii", 2, len(b)) + _pad(b))
        else:
            a = np.atleast_1d(np.asarray(v))
            t = _DT_TO_NC[str(a.dtype)]
            dt, _ = _NC_TYPES[t]
            out.append(struct.pack(">ii", t, len(a))
                       + _pad(a.astype(dt).tobytes()))
    return b"".join(out)


def write_netcdf(variables: dict, dims: dict,
                 global_attrs: dict | None = None,
                 var_attrs: dict | None = None) -> bytes:
    """Encode variables as a CDF-1 file.

    ``dims``: name -> length (ordered); a length of ``None`` (or 0)
    declares the record (unlimited) dimension. ``variables``: name ->
    (dim_names, ndarray); a variable whose first dim is the record dim is
    written record-interleaved per the classic spec (single-record-var
    no-padding rule included)."""
    dim_names = list(dims)
    rec_dim = next((d for d in dim_names if not dims[d]), None)
    var_attrs = var_attrs or {}
    numrecs = 0
    for name, (vdims, arr) in variables.items():
        if vdims and vdims[0] == rec_dim:
            numrecs = max(numrecs, np.asarray(arr).shape[0])
    hdr = [b"CDF\x01", struct.pack(">i", numrecs)]
    hdr.append(struct.pack(">ii", 0x0A, len(dims)))
    for dn in dim_names:
        hdr.append(_w_name(dn) + struct.pack(">i", dims[dn] or 0))
    hdr.append(_w_attrs(global_attrs or {}))
    # layout pass: compute header size with placeholder begins, then fill
    var_entries = []   # (ent, arr, dt, vsize, is_rec)
    for name, (vdims, arr) in variables.items():
        arr = np.asarray(arr)
        is_rec = bool(vdims) and vdims[0] == rec_dim
        t = _DT_TO_NC[str(arr.dtype)]
        dt, sz = _NC_TYPES[t]
        per = arr.size // (arr.shape[0] if is_rec and arr.ndim else 1) \
            if is_rec else arr.size
        vsize = (per * sz + 3) & ~3
        ent = (_w_name(name)
               + struct.pack(">i", len(vdims))
               + b"".join(struct.pack(">i", dim_names.index(d)) for d in vdims)
               + _w_attrs(var_attrs.get(name, {}))
               + struct.pack(">ii", t, vsize))
        var_entries.append((ent, arr, dt, vsize, is_rec))
    hdr.append(struct.pack(">ii", 0x0B, len(var_entries)))
    fixed_hdr_len = len(b"".join(hdr)) + sum(
        len(e[0]) + 4 for e in var_entries)
    begin = fixed_hdr_len
    out = [b"".join(hdr)]
    fixed_data = []
    # fixed vars first (contiguous), then the record section
    rec_entries = [e for e in var_entries if e[4]]
    single_rec = len(rec_entries) == 1
    for ent, arr, dt, vsize, is_rec in var_entries:
        if is_rec:
            continue
        out.append(ent + struct.pack(">I", begin))
        fixed_data.append(_pad(arr.astype(dt).tobytes()))
        begin += vsize
    rec_begin = begin
    recsize = sum(e[3] for e in rec_entries)
    off = rec_begin
    for ent, arr, dt, vsize, is_rec in var_entries:
        if not is_rec:
            continue
        out.append(ent + struct.pack(">I", off))
        off += vsize
    rec_data = []
    for r in range(numrecs):
        for ent, arr, dt, vsize, is_rec in rec_entries:
            # np.asarray: a 1-D record var yields numpy SCALARS at arr[r],
            # and scalar .astype drops the big-endian byte order
            raw = (np.asarray(arr[r]).astype(dt).tobytes()
                   if r < arr.shape[0] else b"\x00" * vsize)
            rec_data.append(raw if single_rec else _pad(raw))
    return (b"".join(out) + b"".join(fixed_data) + b"".join(rec_data))


# ---------------------------------------------------------------------------
# Spark source


def read_netcdf(spark, paths, var: str, tile_dimensions=(256, 256),
                x_dim: str | None = None, y_dim: str | None = None):
    """NetCDF variable -> tile-chunk DataFrame.

    The variable's last two dims are (y, x); leading dims (time, level,
    record) explode into a ``slice_index`` column — a 3-D (time, y, x)
    cube becomes one tiled layer per time step. Extent comes from 1-D
    coordinate variables named after the x/y dims when present (CF
    convention), else the pixel grid. Output: (path, slice_index,
    spatial_key, extent, crs, tile); decode runs distributed, one task
    per file partition (``binaryFile`` scan), chunking where the bytes
    land — same posture as the GeoTIFF streaming source."""
    import pandas as pd

    from rasterframes_spark.tile import CellType, Tile

    tw, th = int(tile_dimensions[0]), int(tile_dimensions[1])
    if isinstance(paths, str):
        paths = [paths]
    src = (spark.read.format("binaryFile")
           .load(list(paths))
           .select("path", "content"))

    out_schema = (
        "path string, slice_index int, "
        "spatial_key struct<col:int,row:int>, "
        "extent struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
        "crs string, "
        "tile struct<cell_type:string,cols:int,rows:int,cells:binary>")

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                xs = ys = None
                if data[:8] == b"\x89HDF\r\n\x1a\n":
                    # NetCDF-4 = HDF5 container (sources/hdf5.py, r7):
                    # coordinate variables resolve by the caller-named
                    # x_dim/y_dim datasets (NetCDF-4 dimension scales
                    # use vlen object references the minimal reader
                    # does not chase)
                    from rasterframes_spark.sources.hdf5 import (
                        read_netcdf4)

                    nc4 = read_netcdf4(data)
                    if var not in nc4["variables"]:
                        raise ValueError(f"netcdf4: no variable {var!r}")
                    arr = nc4["variables"][var][0]
                    if np.issubdtype(arr.dtype, np.floating) \
                            and np.isnan(arr).any():
                        arr = np.ma.masked_invalid(arr)
                    if x_dim and x_dim in nc4["variables"]:
                        xs = np.asarray(nc4["variables"][x_dim][0])
                    if y_dim and y_dim in nc4["variables"]:
                        ys = np.asarray(nc4["variables"][y_dim][0])
                else:
                    info = read_netcdf_info(data)
                    arr = read_netcdf_var(data, var, info)
                    v = info.vars[var]
                    vdims = [info.dims[d][0] for d in v["dimids"]]
                    xn = x_dim or (vdims[-1] if len(vdims) >= 1 else None)
                    yn = y_dim or (vdims[-2] if len(vdims) >= 2 else None)
                    if xn in info.vars:
                        xs = np.asarray(read_netcdf_var(data, xn, info))
                    if yn in info.vars:
                        ys = np.asarray(read_netcdf_var(data, yn, info))
                if arr.ndim < 2:
                    raise ValueError(f"netcdf: {var!r} is not 2-D+")
                ny, nx = arr.shape[-2], arr.shape[-1]
                flat = arr.reshape((-1, ny, nx))
                # CF extent from coordinate vars named after the dims
                xmin, xmax, ymin, ymax = 0.0, float(nx), 0.0, float(ny)
                y_ascending = False
                if xs is not None:
                    half = (abs(float(xs[1] - xs[0])) / 2 if len(xs) > 1
                            else 0.5)
                    xmin, xmax = float(xs.min()) - half, float(xs.max()) + half
                if ys is not None:
                    half = (abs(float(ys[1] - ys[0])) / 2 if len(ys) > 1
                            else 0.5)
                    ymin, ymax = float(ys.min()) - half, float(ys.max()) + half
                    y_ascending = len(ys) > 1 and ys[1] > ys[0]
                pw = (xmax - xmin) / nx
                ph = (ymax - ymin) / ny
                if isinstance(flat, np.ma.MaskedArray):
                    ct = CellType.from_numpy(flat.dtype).name
                else:
                    base = str(flat.dtype)
                    ct = base + ("raw" if not base.startswith("float") else "")
                for si in range(flat.shape[0]):
                    sl = flat[si]
                    if y_ascending:
                        sl = sl[::-1]  # row 0 = top (north-up tiles)
                    for r0 in range(0, ny, th):
                        for c0 in range(0, nx, tw):
                            w = min(tw, nx - c0)
                            h = min(th, ny - r0)
                            rows.append({
                                "path": path, "slice_index": si,
                                "spatial_key": {"col": c0 // tw,
                                                "row": r0 // th},
                                "extent": {
                                    "xmin": xmin + c0 * pw,
                                    "ymax": ymax - r0 * ph,
                                    "xmax": xmin + (c0 + w) * pw,
                                    "ymin": ymax - (r0 + h) * ph,
                                },
                                "crs": "EPSG:4326",
                                "tile": Tile(sl[r0:r0 + h, c0:c0 + w],
                                             ct).to_row(),
                            })
            yield pd.DataFrame(rows, columns=[
                "path", "slice_index", "spatial_key", "extent", "crs",
                "tile"])

    return src.mapInPandas(decode, schema=out_schema)


# ---------------------------------------------------------------------------
# read_raster format-dispatch adapter (GeoTiffInfo surface, via="nc")
#
# Lets catalogs mix NetCDF-3 / NetCDF-4 (HDF5) URIs with GeoTIFF/JP2/VRT/MRF
# — the reference reaches these through GDAL subdataset strings
# (core/src/main/scala/.../ref/RFRasterSource.scala:105-158); here the
# GDAL-style `NETCDF:path:var` / `path#var` forms resolve to the pure-python
# readers.
#
# LAZY metadata contract for CLASSIC NetCDF (VERDICT r10 #3, the format
# where the variable index allows it): the header at the file start
# carries dims, attrs and every variable's `begin` offset, and variable
# data is a plain strided slab — so read_info parses the header + the
# 1-D coordinate variables ONLY (dtype/NoData derived by running the CF
# unpack over an EMPTY array of the declared type — exact, no pixels),
# and read_window range-reads just the requested rows of the requested
# band (one contiguous byte span per window; a tiling pass reads each
# data byte once, AOI pruning prunes actual I/O).
#
# NetCDF-4/HDF5 (r12): both LAZY — the r11 decode-laziness plus
# range-backed I/O: H5File walks superblock/object headers/B-trees/
# heaps through 16 KiB-block range reads and fetches data chunks
# through the caller's big-block source, so read_info over an NetCDF-4
# catalog fetches KBs per file (the r11 record's "one full byte read
# per file" remainder is CLOSED) and a band_indexes=(0,) window
# fetches and decodes one field's intersecting chunks, not the file.
# ---------------------------------------------------------------------------

_GRID_CACHE: dict = {}
_GRID_CACHE_MAX = 8

_X_NAMES = frozenset({"x", "lon", "longitude", "easting", "xc"})
_Y_NAMES = frozenset({"y", "lat", "latitude", "northing", "yc"})


def _default_var_nc3(info: NetcdfInfo) -> str:
    dimnames = {d[0] for d in info.dims}
    for name, v in info.vars.items():
        if len(v["dimids"]) >= 2 and name not in dimnames:
            return name
    raise ValueError("netcdf: no 2-D+ data variable")


def _h5_axis(variables: dict, want: str, n: int, names: frozenset):
    """Resolve a coordinate axis among NetCDF-4 datasets without chasing
    dimension-scale references: CF axis attr, then units, then name, and
    only then a unique length match."""
    by_len = []
    for name, (a, attrs) in variables.items():
        a = np.asarray(a)
        if a.ndim != 1 or len(a) != n:
            continue
        ax = str(attrs.get("axis", b"") or "")
        units = str(attrs.get("units", b"") or "")
        if ax.strip("'b").upper() == want:
            return a
        if (want == "X" and "degrees_east" in units) or \
                (want == "Y" and "degrees_north" in units):
            return a
        if name.split("/")[-1].lower() in names:
            return a
        by_len.append(a)
    return by_len[0] if len(by_len) == 1 else None


def _grid_extent(xs, ys, nx: int, ny: int):
    xmin, xmax, ymin, ymax = 0.0, float(nx), 0.0, float(ny)
    y_ascending = False
    if xs is not None and len(xs):
        half = abs(float(xs[1] - xs[0])) / 2 if len(xs) > 1 else 0.5
        xmin, xmax = float(xs.min()) - half, float(xs.max()) + half
    if ys is not None and len(ys):
        half = abs(float(ys[1] - ys[0])) / 2 if len(ys) > 1 else 0.5
        ymin, ymax = float(ys.min()) - half, float(ys.max()) + half
        y_ascending = len(ys) > 1 and ys[1] > ys[0]
    return (xmin, ymin, xmax, ymax), y_ascending


def _load_grid(src, var: str | None):
    """-> (flat (slices, ny, nx) array north-up, extent, nodata) for a
    NetCDF-3 or NetCDF-4/HDF5 source; cached per (uri, var)."""
    # cache ONLY by uri: a bytes object's id() can be recycled by the
    # allocator and serve another file's grid (code-review r10 #2-1)
    uri = getattr(src, "uri", None)
    key = (uri, var) if uri is not None else None
    if key is not None and key in _GRID_CACHE:
        return _GRID_CACHE[key]
    data = src.read_range(0, src.size()) if hasattr(src, "read_range") \
        else bytes(src)
    xs = ys = None
    if data[:8] == b"\x89HDF\r\n\x1a\n":
        from rasterframes_spark.sources.hdf5 import read_netcdf4

        variables = read_netcdf4(data)["variables"]
        name = var
        if name is None:
            for cand, (a, _at) in variables.items():
                if np.asarray(a).ndim >= 2:
                    name = cand
                    break
        if name is None or name not in variables:
            raise ValueError(f"netcdf4: no variable {name or '(2-D+)'!r}")
        arr = variables[name][0]
        ny, nx = arr.shape[-2], arr.shape[-1]
        others = {k: v for k, v in variables.items() if k != name}
        xs = _h5_axis(others, "X", nx, _X_NAMES)
        ys = _h5_axis(others, "Y", ny, _Y_NAMES)
    elif data[:3] == b"CDF":
        info = read_netcdf_info(data)
        name = var or _default_var_nc3(info)
        arr = read_netcdf_var(data, name, info)
        if arr.ndim < 2:
            raise ValueError(f"netcdf: {name!r} is not 2-D+")
        v = info.vars[name]
        vdims = [info.dims[d][0] for d in v["dimids"]]
        if vdims and vdims[-1] in info.vars:
            xs = np.asarray(read_netcdf_var(data, vdims[-1], info))
        if len(vdims) >= 2 and vdims[-2] in info.vars:
            ys = np.asarray(read_netcdf_var(data, vdims[-2], info))
    else:
        raise ValueError("not a NetCDF-3/NetCDF-4 stream")

    nodata = None
    if isinstance(arr, np.ma.MaskedArray):
        arr = arr.astype("float64").filled(np.nan)
        nodata = float("nan")
    elif np.issubdtype(np.asarray(arr).dtype, np.floating) \
            and np.isnan(arr).any():
        arr = np.asarray(arr, dtype="float64")
        nodata = float("nan")
    arr = np.asarray(arr)
    ny, nx = arr.shape[-2], arr.shape[-1]
    flat = arr.reshape((-1, ny, nx))
    extent, y_ascending = _grid_extent(xs, ys, nx, ny)
    if y_ascending:
        flat = flat[:, ::-1]        # row 0 = top: north-up tiles
    out = (np.ascontiguousarray(flat), extent, nodata)
    if key is not None:
        if len(_GRID_CACHE) >= _GRID_CACHE_MAX:
            _GRID_CACHE.pop(next(iter(_GRID_CACHE)))
        _GRID_CACHE[key] = out
    return out


class _NCBytesSrc:
    """In-memory ``read_range`` wrapper (no uri -> no caching; a bytes
    object's id() can be recycled by the allocator)."""

    __slots__ = ("_d",)
    uri = None

    def __init__(self, data):
        self._d = bytes(data)

    def read_range(self, off: int, n: int) -> bytes:
        return self._d[off:off + n]

    def size(self) -> int:
        return len(self._d)


def _nc_src(src):
    return src if hasattr(src, "read_range") else _NCBytesSrc(src)


def _header_from_src(src) -> NetcdfInfo:
    """Header parse from a progressively-grown prefix read: start at
    8 KiB and widen until the parse succeeds AND its recorded
    ``header_end`` fits inside the prefix (a prefix cut inside a
    trailing string attribute parses silently short — the
    ``header_end`` check catches it)."""
    size = src.size()
    n = min(size, 1 << 13)          # typical headers are well under 8 KiB
    while True:
        data = src.read_range(0, n)
        try:
            info = read_netcdf_info(data)
            if info.header_end <= len(data):
                return info
        except ValueError:
            if n >= size:
                raise
        if n >= size:
            raise ValueError("netcdf: malformed header (runs past end "
                             "of file)")
        n = min(size, n * 4)


def _span(src, off: int, ln: int) -> bytes:
    b = src.read_range(off, ln)
    if len(b) < ln:
        raise ValueError("netcdf: variable data past end of file")
    return b


def _read_var_ranged(src, info: NetcdfInfo, name: str, size: int):
    """Full read of ONE variable via byte-range reads (used for the
    small 1-D coordinate variables on the metadata path)."""
    v = info.vars[name]
    dt, sz = _NC_TYPES[v["type"]]
    shape = [info.dims[d][1] for d in v["dimids"]]
    if shape and shape[0] == 0:
        nrec = info.numrecs or _infer_numrecs_size(size, info)
        fixed = int(np.prod(shape[1:], dtype=np.int64)) if shape[1:] else 1
        # same corrupt-header guards as read_netcdf_var: recsize 0 with
        # a huge declared numrecs would spin on a constant offset (every
        # tiny read succeeds), and the record span must fit the file
        if nrec and (info.recsize <= 0 or v["begin"]
                     + (nrec - 1) * info.recsize + fixed * sz > size):
            raise ValueError("netcdf: record data past end of file")
        if nrec > (1 << 24):        # a >16M-entry coordinate axis is
            raise ValueError(       # corruption, not data (the ranged
                "netcdf: implausible record count")   # reader loops it)
        rows = [np.frombuffer(_span(src, v["begin"] + r * info.recsize,
                                    fixed * sz), dtype=dt)
                for r in range(nrec)]
        arr = (np.stack(rows).reshape([nrec] + shape[1:])
               if rows else np.empty([0] + shape[1:], dtype=dt))
    else:
        count = int(np.prod(shape, dtype=np.int64)) if shape else 1
        arr = np.frombuffer(_span(src, v["begin"], count * sz),
                            dtype=dt).reshape(shape)
    if v["type"] == 2:
        return arr
    return _apply_cf(arr.astype(dt.lstrip(">")), v)


def _infer_numrecs_size(size: int, info: NetcdfInfo) -> int:
    if not info.recsize:
        return 0
    first = min(v["begin"] for v in info.vars.values()
                if v["dimids"] and info.dims[v["dimids"][0]][1] == 0)
    return max((size - first) // info.recsize, 0)


def _sim_result_dtype(v: dict):
    """(numpy dtype str, nodata) the CF unpack produces for a variable
    — derived by running THE SAME ``_apply_cf`` + ``_load_grid``
    post-processing over an empty array of the declared type, so the
    metadata path cannot drift from the decode path.  Float results
    declare NaN NoData (NaN cells are native float NoData; for float
    cell types `NaN-NoData` and `no NoData` parse to the same cell
    type, so the declaration is celltype-exact without reading
    pixels)."""
    dt, _sz = _NC_TYPES[v["type"]]
    a = _apply_cf(np.zeros(0, dtype=dt).astype(dt.lstrip(">")), v)
    if isinstance(a, np.ma.MaskedArray):
        return "float64", float("nan")
    if np.issubdtype(a.dtype, np.floating):
        return str(a.dtype), float("nan")
    return str(a.dtype), None


_CDF_META_CACHE: dict = {}
_CDF_META_MAX = 256

# NetCDF-4/HDF5 (r12): the container is now range-walked end to end —
# H5File reads superblock/object headers/B-trees/heaps through a
# 16 KiB-block metadata view and data chunks through the caller's
# big-block source, so read_info over an NetCDF-4 catalog fetches KBs
# per file (like GRIB/NetCDF-3) and read_window fetches only its
# intersecting chunks' bytes.  One cache entry PER URI holds the
# parsed container plus a per-variable meta dict (ADVICE r11 #2: the
# old (uri, var) keying re-read and re-parsed the container once per
# variable and kept full file bytes resident per entry), LRU-evicted
# (VERDICT r11 #5: FIFO thrashed on alternating catalogs).
from collections import OrderedDict as _OrderedDict

_H5_CACHE: _OrderedDict = _OrderedDict()    # uri -> {"variables", "meta"}
_H5_CACHE_MAX = 4


def _h5_entry(src) -> dict:
    """Per-uri parsed-container cache entry: {"variables": {name:
    _Dataset}, "meta": {var: adapter-meta}}.  All variables of one
    file share one parse and one (block-cached, lazy) source."""
    from rasterframes_spark.sources.hdf5 import read_netcdf4_meta

    uri = getattr(src, "uri", None)
    if uri is not None and uri in _H5_CACHE:
        _H5_CACHE.move_to_end(uri)
        return _H5_CACHE[uri]
    entry = {"variables": read_netcdf4_meta(src)["variables"], "meta": {}}
    if uri is not None:
        while len(_H5_CACHE) >= _H5_CACHE_MAX:
            _H5_CACHE.popitem(last=False)
        _H5_CACHE[uri] = entry
    return entry


def _h5_meta(src, var: str | None) -> dict:
    import numpy as _np

    from rasterframes_spark.sources.hdf5 import apply_cf_nc4

    entry = _h5_entry(src)
    if var in entry["meta"]:
        return entry["meta"][var]
    variables = entry["variables"]
    name = var
    if name is None:
        for cand, d in variables.items():
            if len(d.shape) >= 2:
                name = cand
                break
    if name is None or name not in variables:
        raise ValueError(f"netcdf4: no variable {name or '(2-D+)'!r}")
    ds = variables[name]
    if len(ds.shape) < 2:
        raise ValueError(f"netcdf: {name!r} is not 2-D+")
    if ds.dtype is None or ds.dtype.kind not in "iuf":
        raise ValueError(f"netcdf4: {name!r} is not numeric")
    ny, nx = ds.shape[-2], ds.shape[-1]
    lead = tuple(ds.shape[:-2])
    nb = int(np.prod(lead, dtype=np.int64)) if lead else 1
    if ny * nx > (1 << 28) or not 0 <= nb <= (1 << 20):
        raise ValueError("netcdf4: implausible grid size")
    # coordinate axes: 1-D datasets of matching length (small) decode
    # fully; everything else stays undecoded
    others = {k: (d.read(), dict(d.attrs))
              for k, d in variables.items()
              if k != name and len(d.shape) == 1
              and d.shape[0] in (nx, ny) and d.dtype is not None
              and d.dtype.kind in "iuf"}
    xs = _h5_axis(others, "X", nx, _X_NAMES)
    ys = _h5_axis(others, "Y", ny, _Y_NAMES)
    extent, y_ascending = _grid_extent(xs, ys, nx, ny)
    # result dtype/NoData by running the SAME CF unpack over an empty
    # array (exact; float results declare NaN NoData — NaN cells are
    # native float NoData, celltype-identical either way)
    sim = apply_cf_nc4(_np.zeros(0, dtype=ds.dtype), dict(ds.attrs))
    nodata = float("nan") if np.issubdtype(sim.dtype, np.floating) \
        else None
    meta = {"ds": ds, "name": name, "ny": ny, "nx": nx, "nb": nb,
            "lead": lead, "extent": extent, "y_ascending": y_ascending,
            "dtype": str(sim.dtype), "nodata": nodata}
    entry["meta"][var] = meta
    return meta


def _read_h5_window(src, var: str | None, c0: int, r0: int,
                    w: int, h: int, band: int) -> np.ndarray:
    """Windowed NetCDF-4 read: the band index decomposes into the
    variable's leading dims, the row range flips through the y axis,
    and ``_Dataset.read_window`` decodes only the chunks (or the
    contiguous byte span) the window touches — a one-band window never
    pays for the other bands' chunks."""
    from rasterframes_spark.sources.hdf5 import apply_cf_nc4

    m = _h5_meta(src, var)
    ds, ny, nx = m["ds"], m["ny"], m["nx"]
    if not 0 <= band < m["nb"]:
        raise IndexError(f"netcdf4: band {band} out of range")
    if not (0 <= r0 and 0 <= c0 and w > 0 and h > 0
            and r0 + h <= ny and c0 + w <= nx):
        # same public-surface contract as the classic branch: raise on
        # out-of-range windows instead of silently serving a clamped
        # (smaller) array from _Dataset.read_window
        raise IndexError(f"netcdf4: window ({c0},{r0},{w},{h}) out of "
                         f"range for {nx}x{ny}")
    sel = []
    idx = band
    for d in range(len(m["lead"])):
        inner = int(np.prod(m["lead"][d + 1:], dtype=np.int64)) \
            if d + 1 < len(m["lead"]) else 1
        i, idx = divmod(idx, inner) if inner > 1 else (idx, 0)
        sel.append((i, i + 1))
    if m["y_ascending"]:
        sel.append((ny - (r0 + h), ny - r0))
    else:
        sel.append((r0, r0 + h))
    sel.append((c0, c0 + w))
    win = ds.read_window(tuple(sel))
    win = win.reshape(win.shape[-2], win.shape[-1])
    a = apply_cf_nc4(win, dict(ds.attrs))
    if m["y_ascending"]:
        a = a[::-1]
    return a


def _cdf_meta(src, var: str | None) -> dict:
    """Per-(uri, var) metadata of a classic-format variable: shape,
    band layout/strides, extent, y orientation, result dtype/NoData —
    everything read_info/read_window need, from header + coordinate
    reads only."""
    uri = getattr(src, "uri", None)
    key = (uri, var)
    if uri is not None and key in _CDF_META_CACHE:
        return _CDF_META_CACHE[key]
    size = src.size()
    info = _header_from_src(src)
    name = var or _default_var_nc3(info)
    if name not in info.vars:
        raise ValueError(f"netcdf: no variable {name!r}")
    v = info.vars[name]
    dt, sz = _NC_TYPES[v["type"]]
    if v["type"] == 2:
        raise ValueError(f"netcdf: {name!r} is not numeric")
    shape = [info.dims[d][1] for d in v["dimids"]]
    is_rec = bool(shape) and shape[0] == 0
    nrec = (info.numrecs or _infer_numrecs_size(size, info)) if is_rec \
        else None
    if is_rec:
        shape = [nrec] + shape[1:]
    if len(shape) < 2:
        raise ValueError(f"netcdf: {name!r} is not 2-D+")
    ny, nx = shape[-2], shape[-1]
    lead = shape[:-2]
    nb = int(np.prod(lead, dtype=np.int64)) if lead else 1
    if ny * nx > (1 << 28) or not 0 <= nb <= (1 << 20):
        raise ValueError("netcdf: implausible grid size")
    # the declared layout must FIT the file (the eager reader failed on
    # the short buffer; the lazy one must refuse equally early, not
    # hand absurd dims to a chunk-grid loop)
    inner = (int(np.prod(lead[1:], dtype=np.int64)) if len(lead) > 1
             else 1) if is_rec else None
    # rec_is_y: a 2-D record variable t(unlimited, x) — the record dim
    # IS the y axis, so each ROW is one record strided by recsize (the
    # general is_rec layout has whole per-record (inner, ny, nx) slabs
    # instead; ADVICE r11 #1 — the shared fit check double-counted the
    # record span here and read_window ignored the per-record stride)
    rec_is_y = is_rec and not lead
    if rec_is_y:
        if nrec and v["begin"] + (nrec - 1) * info.recsize \
                + nx * sz > size:
            raise ValueError("netcdf: variable data past end of file")
        if nrec > 1 and info.recsize < nx * sz:
            # >1 record implies every record var's slot holds at least
            # its own row — a smaller recsize is a corrupt header that
            # would alias overlapping bytes as rows
            raise ValueError("netcdf: record size smaller than row")
    elif is_rec:
        if nrec and v["begin"] + (nrec - 1) * info.recsize \
                + inner * ny * nx * sz > size:
            raise ValueError("netcdf: variable data past end of file")
    elif v["begin"] + nb * ny * nx * sz > size:
        raise ValueError("netcdf: variable data past end of file")
    vdims = [info.dims[d][0] for d in v["dimids"]]
    xs = ys = None
    if vdims and vdims[-1] in info.vars:
        xs = np.asarray(_read_var_ranged(src, info, vdims[-1], size))
    if len(vdims) >= 2 and vdims[-2] in info.vars:
        ys = np.asarray(_read_var_ranged(src, info, vdims[-2], size))
    extent, y_ascending = _grid_extent(xs, ys, nx, ny)
    res_dtype, nodata = _sim_result_dtype(v)
    meta = {"name": name, "v": v, "dt": dt, "sz": sz,
            "ny": ny, "nx": nx, "nb": nb, "is_rec": is_rec,
            "rec_is_y": rec_is_y, "inner": inner, "recsize": info.recsize,
            "extent": extent, "y_ascending": y_ascending,
            "dtype": res_dtype, "nodata": nodata}
    if uri is not None:
        if len(_CDF_META_CACHE) >= _CDF_META_MAX:
            _CDF_META_CACHE.pop(next(iter(_CDF_META_CACHE)))
        _CDF_META_CACHE[key] = meta
    return meta


def read_info(src, var: str | None = None):
    """Format-dispatch adapter: NetCDF/HDF5 metadata as a GeoTiffInfo
    (via='nc'); leading non-spatial dims flatten into bands.  Both
    branches are metadata-only: classic files parse header +
    coordinate variables, HDF5 containers walk object headers +
    coordinate axes — no data variable decodes on this path."""
    from rasterframes_spark.sources.geotiff import GeoTiffInfo

    src = _nc_src(src)
    head = src.read_range(0, 8)
    if head[:3] == b"CDF" and len(head) > 3 and head[3] in (1, 2):
        m = _cdf_meta(src, var)
    elif head[:8] == b"\x89HDF\r\n\x1a\n":
        m = _h5_meta(src, var)
    else:
        raise ValueError("not a NetCDF-3/NetCDF-4 stream")
    nb, ny, nx = m["nb"], m["ny"], m["nx"]
    extent, dtype, nodata = m["extent"], m["dtype"], m["nodata"]
    pw = (extent[2] - extent[0]) / nx
    ph = (extent[3] - extent[1]) / ny
    return GeoTiffInfo(
        width=nx, height=ny, bands=nb, dtype=dtype,
        nodata=nodata, crs="EPSG:4326", extent=tuple(extent),
        tile_width=None, tile_height=None, rows_per_strip=None,
        compression=0, chunk_offsets=[], chunk_counts=[], byte_order="<",
        pixel_scale=(pw, ph, 0.0),
        tiepoint=(0.0, 0.0, 0.0, extent[0], extent[3], 0.0),
        via="nc")


def read_window(src, info, c0: int, r0: int, w: int, h: int,
                band: int = 0, var: str | None = None) -> np.ndarray:
    src = _nc_src(src)
    head = src.read_range(0, 8)
    if not (head[:3] == b"CDF" and len(head) > 3 and head[3] in (1, 2)):
        return _read_h5_window(src, var, c0, r0, w, h, band)
    m = _cdf_meta(src, var)
    ny, nx, sz = m["ny"], m["nx"], m["sz"]
    if not 0 <= band < m["nb"]:
        raise IndexError(f"netcdf: band {band} out of range")
    if not (0 <= r0 and 0 <= c0 and w > 0 and h > 0
            and r0 + h <= ny and c0 + w <= nx):
        # public adapter surface: an out-of-range window must raise, not
        # slice garbage from mis-signed stored-row offsets (ADVICE r11)
        raise IndexError(f"netcdf: window ({c0},{r0},{w},{h}) out of "
                         f"range for {nx}x{ny}")
    v = m["v"]
    # north-up rows [r0, r0+h) -> stored rows [s0, s1)
    if m["y_ascending"]:
        s0, s1 = ny - (r0 + h), ny - r0
    else:
        s0, s1 = r0, r0 + h
    if m["rec_is_y"]:
        # the record dim IS y: stored row r lives at begin + r*recsize
        # (other record variables' records interleave between rows).
        # One covering span read, rows sliced at the recsize stride —
        # one fetch beats h tiny ranged reads on remote sources, and
        # the interleave overhead is bounded by recsize*(h-1).
        rs = m["recsize"]
        span = _span(src, v["begin"] + s0 * rs,
                     (s1 - s0 - 1) * rs + nx * sz)
        arr = np.stack([np.frombuffer(span, dtype=m["dt"], count=nx,
                                      offset=r * rs)
                        for r in range(s1 - s0)])
    else:
        if m["is_rec"]:
            rec, ii = divmod(band, m["inner"])
            base = v["begin"] + rec * m["recsize"] + ii * ny * nx * sz
        else:
            base = v["begin"] + band * ny * nx * sz
        raw = _span(src, base + s0 * nx * sz, (s1 - s0) * nx * sz)
        arr = np.frombuffer(raw, dtype=m["dt"]).reshape(s1 - s0, nx)
    a = _apply_cf(arr.astype(m["dt"].lstrip(">")), v)
    if isinstance(a, np.ma.MaskedArray):
        a = a.astype("float64").filled(np.nan)
    if m["y_ascending"]:
        a = a[::-1]
    return a[:, c0:c0 + w]
