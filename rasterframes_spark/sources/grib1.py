"""Pure-python GRIB edition 1 (WMO FM 92-VIII GRIB) reader/writer.

The reference reads GRIB only through its GDAL branch
(`core/src/main/scala/org/locationtech/rasterframes/ref/RFRasterSource.scala:105-158`);
r10 takes the legacy edition native too, so the format-dispatch "grib"
family covers both editions without rasterio.  Fields come back in the
same ``{"grid", "values", ...}`` shape as :mod:`grib2`, so the shared
raster adapter (``grib2.read_info``/``read_window``) serves both.

Format reference (public WMO spec, GRIB Edition 1 = FM 92-VIII):

- Indicator section (8 bytes): ``GRIB`` magic, total message length in
  octets 5-7 (uint24), edition (= 1) in octet 8.  Editions 0/-1 have
  no length there and are rejected.
- PDS (product definition): octet 8 flags GDS (0x80) / BMS (0x40)
  presence; octet 9 is the parameter indicator; octets 27-28 the
  decimal scale factor D (sign-and-magnitude, like every signed GRIB
  quantity).
- GDS, data representation type 0 (regular lat/lon): Ni/Nj uint16,
  first/last lat/lon as sign-and-magnitude MILLIdegrees (uint24), Di/
  Dj uint16 millidegrees (0xFFFF = "not given", rejected), scanning
  mode octet 28 with the same 0x80 (-i) / 0x40 (+j) / 0x20
  (column-major, rejected) semantics as edition 2.
- BMS: octet 4 = number of unused trailing bits, octets 5-6 = 0 for
  an explicit bit-map (predefined ones rejected), bit-map MSB-first.
- BDS: octet 4 high nibble flags — spherical harmonics (bit 1) and
  second-order packing (bit 2) are rejected, integer-original (bit 3)
  and additional-flags (bit 4) accepted — low nibble = unused bits at
  the end; octets 5-6 = binary scale E (sign-and-magnitude); octets
  7-10 = reference value R as an IBM System/360 HEX float (sign bit,
  7-bit excess-64 base-16 exponent, 24-bit fraction:
  ``(-1)^s * 0.f * 16^(e-64)`` — NOT IEEE); octet 11 = bits per
  packed value; values MSB-first with no padding, like edition 2.
- ``Y = (R + X * 2**E) / 10**D`` — same packing equation as GRIB2.
- End section: ``7777``.

Longitude normalization matches :func:`grib2._grid_extent` (grids
entirely west of the antimeridian shift by -360).
"""

from __future__ import annotations

import struct

import numpy as np

# the sign-and-magnitude codec (regulation 92.1.5) and MSB-first bit
# packing are shared across editions — one implementation in grib2,
# as are the byte-source plumbing and the payload-decode counter the
# laziness tests read
from rasterframes_spark.sources.grib2 import (DECODE_STATS, _as_src,
                                              _BytesSrc, _pack_bits,
                                              _pack_sm, _read_span, _sm,
                                              _u, _unpack_bits)

__all__ = ["parse_grib1", "scan_grib1", "write_grib1", "ibm_float",
           "ibm_float_bytes"]

_MILLI = 1e-3


def ibm_float(b: bytes) -> float:
    """IBM System/360 single-precision hexadecimal float -> python
    float: sign(1) | excess-64 base-16 exponent(7) | fraction(24);
    value = (-1)^s * (fraction / 2^24) * 16^(exponent-64)."""
    if len(b) != 4:
        raise ValueError("grib1: IBM float needs 4 bytes")
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = (b[0] & 0x7F) - 64
    mant = int.from_bytes(b[1:4], "big")
    return sign * mant * (16.0 ** exp) / float(1 << 24)


def ibm_float_bytes(v: float) -> bytes:
    """Nearest-representable IBM hex-float encoding (round-trips
    exactly through :func:`ibm_float` — tests pin that property)."""
    v = float(v)
    if v == 0.0 or not np.isfinite(v):
        if not np.isfinite(v):
            raise ValueError("grib1: reference value must be finite")
        return b"\x00\x00\x00\x00"
    s = 0x80 if v < 0 else 0
    a = abs(v)
    exp = 0
    while a >= 1.0:
        a /= 16.0
        exp += 1
    while a < 1.0 / 16.0:
        a *= 16.0
        exp -= 1
    mant = round(a * (1 << 24))
    if mant >= (1 << 24):           # rounding carried past 0.FFFFFF
        mant >>= 4
        exp += 1
    if exp < -64:                   # below ~5.4e-79: flush to zero (the
        return b"\x00\x00\x00\x00"  # quantization step dwarfs it anyway)
    if exp > 63:
        raise ValueError(f"grib1: value {v} outside IBM float range")
    return bytes([s | (exp + 64)]) + mant.to_bytes(3, "big")


def _parse_gds(gds: bytes) -> dict:
    if gds[5] != 0:
        raise NotImplementedError(
            f"grib1: data representation type {gds[5]} (only 0 regular "
            "lat/lon is native; use the rasterio fallback)")
    ni, nj = _u(gds, 6, 2), _u(gds, 8, 2)
    if ni == 0xFFFF or nj == 0xFFFF:
        raise NotImplementedError("grib1: quasi-regular grids")
    if ni * nj > (1 << 28):         # 2 GB float64: corruption, not data
        raise ValueError(f"grib1: implausible grid size {ni * nj}")
    di, dj = _u(gds, 23, 2), _u(gds, 25, 2)
    if di == 0xFFFF or dj == 0xFFFF:
        raise NotImplementedError(
            "grib1: direction increments not given")
    scan = gds[27]
    if scan & 0x20:
        raise NotImplementedError("grib1: column-major scanning (0x20)")
    # longitudes stay EXACTLY as stored (no % 360): edition-1 files
    # carry either [0, 360) or signed longitudes, and the shared
    # _grid_extent logic (sorted endpoints + both->=180 -360 shift)
    # handles both ONLY if a straddling grid keeps lo2 > 360 rather
    # than folding it below lo1 (code-review r10 finding #1)
    return {"ni": ni, "nj": nj,
            "la1": _sm(gds, 10, 3) * _MILLI,
            "lo1": _sm(gds, 13, 3) * _MILLI,
            "la2": _sm(gds, 17, 3) * _MILLI,
            "lo2": _sm(gds, 20, 3) * _MILLI,
            "di": di * _MILLI, "dj": dj * _MILLI, "scan": scan,
            "npts": ni * nj}


def scan_grib1(src) -> list[dict]:
    """Metadata-only walk of a (possibly multi-message) GRIB1 stream —
    the edition-1 counterpart of :func:`grib2.scan_grib2`: PDS/GDS/BDS
    headers parse fully, the bit-map and packed values are RECORDED as
    byte ranges and never read, so ``read_info`` over a catalog costs
    section headers, not pixel decodes (VERDICT r10 #3).

    One meta dict per field; ``simple`` carries ``{R, E, D, nbits}``
    when the field is plain fixed-width packing with every grid point
    packed (row-windowed decode eligibility).  Structural validation
    matches the eager parser: truncation, a missing ``7777``,
    spherical-harmonic or second-order BDS flags, predefined bit-maps
    all raise."""
    src = _as_src(src)
    n = src.size()
    metas: list[dict] = []
    off = 0
    while off < n:
        head = src.read_range(off, 8)
        if n - off < 8 or head[:4] != b"GRIB":
            raise ValueError("grib1: missing GRIB indicator")
        edition = head[7]
        if edition != 1:
            raise ValueError(f"grib1: edition {edition} (only 1)")
        total = _u(head, 4, 3)
        if total < 8 + 28 + 4 or off + total > n:
            raise ValueError("grib1: message length past end of stream")
        end = off + total
        p = off + 8
        # ---- PDS
        plen = _u(src.read_range(p, 3), 0, 3)
        if plen < 28 or p + plen > end:
            raise ValueError("grib1: bad PDS length")
        pds = src.read_range(p, plen)
        has_gds, has_bms = bool(pds[7] & 0x80), bool(pds[7] & 0x40)
        param = pds[8]
        dscale = _sm(pds, 26, 2)
        p += plen
        # ---- GDS (predefined grids without one are rejected)
        if not has_gds:
            raise NotImplementedError(
                "grib1: predefined grid (no GDS; catalogued grid ids "
                "need the rasterio fallback)")
        glen = _u(src.read_range(p, 3), 0, 3)
        if glen < 32 or p + glen > end:
            raise ValueError("grib1: bad GDS length")
        grid = _parse_gds(src.read_range(p, glen))
        p += glen
        # ---- BMS (range recorded, bits read only at decode)
        bitmap = None
        if has_bms:
            bh = src.read_range(p, 6)
            blen = _u(bh, 0, 3)
            if blen < 6 or p + blen > end:
                raise ValueError("grib1: bad BMS length")
            if _u(bh, 4, 2) != 0:
                raise NotImplementedError(
                    f"grib1: predefined bit-map {_u(bh, 4, 2)}")
            bitmap = (p + 6, blen - 6)
            p += blen
        # ---- BDS header (the packed values stay a recorded range)
        bh = src.read_range(p, 11)
        dlen = _u(bh, 0, 3)
        if dlen < 11 or p + dlen > end:
            raise ValueError("grib1: bad BDS length")
        flags = bh[3]
        if flags & 0x80:
            raise NotImplementedError("grib1: spherical harmonics")
        if flags & 0x40:
            raise NotImplementedError(
                "grib1: second-order packing (use the rasterio "
                "fallback)")
        unused = flags & 0x0F
        e = _sm(bh, 4, 2)
        r = ibm_float(bh[6:10])
        nbits = bh[10]
        if nbits > 32:              # spec ceiling; guards int64 shifts
            raise ValueError(f"grib1: {nbits} bits per value (max 32)")
        if abs(e) > 100 or abs(dscale) > 100:
            raise ValueError(       # corrupt scale factors overflow
                "grib1: implausible binary/decimal scale factor")
        navail = (8 * (dlen - 11) - unused) // nbits if nbits else 0
        payload = (p + 11, dlen - 11)
        p += dlen
        if src.read_range(p, 4) != b"7777":
            raise ValueError("grib1: message not terminated by 7777")
        simple = None
        if nbits > 0 and bitmap is None and navail >= grid["npts"]:
            simple = {"R": r, "E": e, "D": dscale, "nbits": nbits}
        metas.append({"edition": 1, "grid": grid, "bitmap": bitmap,
                      "payload": payload, "navail": navail,
                      "R": r, "E": e, "D": dscale, "nbits": nbits,
                      "discipline": 255, "param_category": 255,
                      "param_number": param, "simple": simple})
        off = end
    if not metas:
        raise ValueError("grib1: no data fields in stream")
    return metas


def decode_grib1_field(src, meta) -> dict:
    """One scanned field -> the eager-parse dict (reads exactly that
    field's bit-map + packed-value bytes; same Y equation as
    edition 2)."""
    src = _as_src(src)
    grid = meta["grid"]
    ni, nj = grid["ni"], grid["nj"]
    npts = ni * nj
    if meta["bitmap"] is not None:
        mask = np.unpackbits(np.frombuffer(
            _read_span(src, meta["bitmap"]), dtype=np.uint8))[:npts]
        if mask.size < npts:
            raise ValueError("grib1: bit-map shorter than the grid")
        npacked = int(mask.sum())
    else:
        mask = None
        npacked = npts
    DECODE_STATS["fields"] += 1
    if meta["nbits"] == 0:
        y = np.full(npacked, meta["R"] / (10.0 ** meta["D"]))
    else:
        if meta["navail"] < npacked:
            raise ValueError("grib1: data section shorter than "
                             "nbits*npts")
        x = _unpack_bits(_read_span(src, meta["payload"]),
                         meta["nbits"], npacked)
        y = (meta["R"] + x.astype("float64") * (2.0 ** meta["E"])) \
            / (10.0 ** meta["D"])
    if mask is not None:
        full = np.full(npts, np.nan)
        full[mask.astype(bool)] = y
        y = full
    a = y.reshape(nj, ni)
    if grid["scan"] & 0x80:
        a = a[:, ::-1]
    if grid["scan"] & 0x40:
        a = a[::-1]
    return {"grid": grid, "values": np.ascontiguousarray(a),
            "discipline": 255, "param_category": 255,
            "param_number": meta["param_number"]}


def parse_grib1(data: bytes) -> list[dict]:
    """Every field in a (possibly multi-message) GRIB1 byte stream ->
    the same dicts :func:`grib2.parse_grib2` yields (``param_number``
    carries the PDS parameter indicator; GRIB1 has no discipline or
    category, recorded as 255).  Strict parse like the edition-2
    reader: truncation, a missing ``7777``, spherical-harmonic or
    second-order BDS flags, predefined bit-maps all raise.  (Composed
    from :func:`scan_grib1` + :func:`decode_grib1_field` so the shared
    raster adapter can keep metadata reads payload-free.)"""
    src = _BytesSrc(data)
    return [decode_grib1_field(src, m) for m in scan_grib1(src)]


def _u24(n: int, what: str) -> bytes:
    """3-byte length field.  Edition 1 cannot represent sections or
    messages over 2^24-1 octets (~8.3M points at 16 bits) — silently
    dropping the high byte would write a corrupt file whose own parser
    fails with 'message not terminated by 7777' (ADVICE r10 #1), so
    overflow refuses loudly instead."""
    if n > 0xFFFFFF:
        raise ValueError(
            f"grib1: {what} is {n} bytes — over the 2^24-1 octet "
            "ceiling GRIB edition 1 length fields can record; split "
            "the grid across messages or use write_grib2")
    return struct.pack(">I", n)[1:]


def write_grib1(fields, extent, nbits: int = 16, dscale: int = 0,
                params=None) -> bytes:
    """Encode 2-D float arrays (north-up, shared lat/lon grid) as one
    GRIB1 message per field.  NaN cells emit a bit-map.  The reference
    value is quantized to an IBM hex float FIRST (then X computed
    against the quantized R), so integer fields with range < 2**nbits
    round-trip exactly — the same discipline as the edition-2 writer's
    float32 R.  Millidegree grid: extent edges must land on 1e-3
    degrees."""
    if params is None:
        params = [2] * len(fields)
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    out = bytearray()
    for a, param in zip(fields, params):
        a = np.asarray(a, dtype="float64")
        if a.ndim != 2:
            raise ValueError("grib1: each field must be 2-D")
        nj, ni = a.shape
        di, dj = (xmax - xmin) / ni, (ymax - ymin) / nj
        la1, la2 = ymax - dj / 2, ymin + dj / 2
        lo1, lo2 = xmin + di / 2, xmax - di / 2
        if lo1 < 0:
            lo1, lo2 = lo1 + 360.0, lo2 + 360.0
        for v in (la1, la2, lo1, lo2, di, dj):
            if abs(round(v / _MILLI) - v / _MILLI) > 1e-6:
                raise ValueError(
                    "grib1: grid does not land on millidegrees")

        mask = np.isfinite(a.ravel())
        vals = a.ravel()[mask] * (10.0 ** dscale)
        if vals.size == 0:
            rb, e, x = b"\x00" * 4, 0, np.zeros(0, dtype=np.int64)
        else:
            r = float(vals.min())
            rng = float(vals.max()) - r
            e = 0
            if rng > 0 and nbits > 0:
                while rng / (2.0 ** e) > (1 << nbits) - 1:
                    e += 1
            rb = ibm_float_bytes(r)
            r = ibm_float(rb)       # quantize FIRST, pack against it
            x = np.round((vals - r) / (2.0 ** e)).astype(np.int64)
            x = np.clip(x, 0, (1 << nbits) - 1)

        pds = b"\x00\x00\x1c" + bytes([
            3,                      # octet 4  table version
            7,                      # octet 5  centre
            0,                      # octet 6  generating process
            255,                    # octet 7  grid id (in GDS)
            0xC0 if not mask.all() else 0x80,   # octet 8 GDS/BMS flags
            param,                  # octet 9  parameter indicator
            1, 0, 0,                # octets 10-12 level type + level
            26, 1, 1, 0, 0,         # octets 13-17 yy mm dd hh min
            1, 0, 0, 10,            # octets 18-21 unit P1 P2 range
            0, 0, 0,                # octets 22-24 avg count + missing
            21, 0]) \
            + _pack_sm(dscale, 2)   # octets 25-26 century subcentre;
        assert len(pds) == 28       # octets 27-28 decimal scale D
        gds = bytes([0, 0, 32, 0, 255, 0]) \
            + struct.pack(">HH", ni, nj) \
            + _pack_sm(round(la1 / _MILLI), 3) \
            + _pack_sm(round(lo1 / _MILLI), 3) \
            + bytes([0x80]) \
            + _pack_sm(round(la2 / _MILLI), 3) \
            + _pack_sm(round(lo2 / _MILLI), 3) \
            + struct.pack(">HH", round(di / _MILLI), round(dj / _MILLI)) \
            + bytes([0]) + b"\x00" * 4
        assert len(gds) == 32       # and gds[0:3] says 32
        bms = b""
        if not mask.all():
            bm = np.packbits(mask.astype(np.uint8)).tobytes()
            unused_bm = 8 * len(bm) - int(mask.size)
            body = bytes([unused_bm]) + b"\x00\x00" + bm
            bms = _u24(len(body) + 3, "bit-map section") + body
        packed = _pack_bits(x, nbits if vals.size else 0)
        unused = 8 * len(packed) - int(vals.size) * nbits \
            if vals.size and nbits else 0
        bds_body = bytes([unused & 0x0F]) + _pack_sm(e, 2) + rb \
            + bytes([nbits if vals.size else 0]) + packed
        if (len(bds_body) + 3) % 2:             # BDS length must be even
            bds_body += b"\x00"
            bds_body = bytes([bds_body[0] + 8]) + bds_body[1:]
        bds = _u24(len(bds_body) + 3, "data section") + bds_body
        body = pds + gds + bms + bds + b"7777"
        out += b"GRIB" + _u24(len(body) + 8, "message") \
            + bytes([1]) + body
    return bytes(out)
