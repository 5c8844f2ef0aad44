"""Pure-python GRIB2 (WMO FM 92 Edition 2) reader/writer + raster
dispatch adapter.

The reference reads GRIB only through its GDAL branch
(`core/src/main/scala/org/locationtech/rasterframes/ref/RFRasterSource.scala:105-158`);
this engine decodes the common meteorological subset natively — no
libs — which closes the last `gdal_fallback`-only raster family the
r9 verdict asked a decision on (next #6): regular lat/lon grids
(grid definition template 3.0) with the data representations real
archives actually use — simple packing (5.0), complex packing (5.2),
complex packing with spatial differencing (5.3, the NCEP GFS/NAM
default), JPEG2000 packing (5.40, decoded by the repo's own ISO
15444-1 codec in ``sources/jp2.py``) and PNG packing (5.41, the
repo's own ``sources/png.py``) — optional bit-map, multi-field and
multi-message files.  GRIB1 and the exotic representations (IEEE
5.4, CCSDS 5.42, run-length 5.200) stay on the documented rasterio
hatch and raise a precise error here.

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
- Templates 5.2/5.3 (+ data templates 7.2/7.3): X is delivered in NG
  groups — three octet-aligned sequences give each group's reference
  value, bit width and length, then the groups' values follow at
  their own widths in one unpadded bitstream.  Missing-value
  management 1/2 reserves the all-ones (and all-ones-minus-one) code
  per group; a zero-width group is entirely missing when its
  reference is all-ones.  5.3 prefixes the data section with the
  first ``order`` original values and the overall difference minimum
  (sign-and-magnitude, ``extra_octets`` wide) and transmits the
  order-th differences minus that minimum; reconstruction follows the
  g2lib comunpack order (overwrite, add minimum, integrate).
- Templates 5.40/5.41: X is a JPEG2000 codestream / PNG image of the
  scaled integers (bit-mapped fields pack the present points as a
  1 x npacked image, the NCEP convention; 24-bit PNG spreads value
  bytes over RGB channels).
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

__all__ = ["parse_grib2", "scan_grib2", "write_grib2", "read_info",
           "read_window"]

# Observability hook for the laziness contract (tests/test_lazy_io.py
# style): counts of full-field payload decodes and row-windowed partial
# decodes.  A metadata-only pass (read_info / scan) must leave BOTH at
# zero — sections 0-6 parse, section 7 payloads are only ever recorded
# as byte ranges (VERDICT r10 #3).
DECODE_STATS = {"fields": 0, "row_windows": 0}


class _BytesSrc:
    """In-memory byte source speaking the ``read_range`` protocol.

    No ``uri`` identity: results computed through it are never cached
    (a bytes object's id() can be recycled by the allocator — the
    hazard code-review r10 #2-1 pinned)."""

    __slots__ = ("_d",)
    uri = None

    def __init__(self, data):
        self._d = bytes(data)

    def read_range(self, off: int, n: int) -> bytes:
        return self._d[off:off + n]

    def size(self) -> int:
        return len(self._d)


def _as_src(src):
    return src if hasattr(src, "read_range") else _BytesSrc(src)


def _read_span(src, span) -> bytes:
    off, ln = span
    b = src.read_range(off, ln)
    if len(b) < ln:
        raise ValueError("grib: truncated section body")
    return b


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
    if len(sec) < 14:
        raise ValueError("grib2: grid definition section too short")
    tmpl = _u(sec, 12, 2)
    if tmpl != 0:
        raise NotImplementedError(
            f"grib2: grid definition template 3.{tmpl} (only 3.0 "
            "regular lat/lon is native; use the rasterio fallback)")
    if _u(sec, 10, 1):
        raise NotImplementedError(
            "grib2: quasi-regular grids (optional point list) unsupported")
    if len(sec) < 72:               # template 3.0 is 72 octets; int.
        raise ValueError(           # from_bytes on short slices would
            "grib2: template 3.0 section truncated")    # yield silent 0s
    ni, nj = _u(sec, 30, 4), _u(sec, 34, 4)
    basic, subdiv = _u(sec, 38, 4), _u(sec, 42, 4)
    unit = _MICRO
    if basic not in (0, 1) or (basic == 1 and subdiv not in (0, 10 ** 6)):
        raise NotImplementedError("grib2: non-microdegree basic angle")
    npts = _u(sec, 6, 4)
    if ni * nj != npts:             # the section's own total must agree
        raise ValueError(           # with Ni*Nj (corruption tell; also
            f"grib2: Ni*Nj = {ni * nj} != declared point count "
            f"{npts}")              # stops giant-alloc DoS on mutated
    if npts > (1 << 28):            # dims). 2^28 pts = 2 GB float64 —
        raise ValueError(           # far above any real product grid
            f"grib2: implausible grid size {npts}")
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


def scan_grib2(src) -> list[dict]:
    """Metadata-only walk of a (possibly multi-message) GRIB2 stream:
    sections 0-6 parse fully, section 7 payloads are RECORDED as byte
    ranges and never read — the whole point of the split (VERDICT r10
    #3): ``read_info`` over a catalog of operational files (a GFS cycle
    is ~500 fields) costs section headers, not a 500-field decode.

    One meta dict per field: ``{"edition": 2, "grid", "drs",
    "bitmap": (off, len) | None, "payload": (off, len), "discipline",
    "param_category", "param_number", "simple"}`` — ``simple`` holds
    the ``{R, E, D, nbits}`` descriptor when the field is plain 5.0
    fixed-width packing covering every grid point (the row-windowed
    decode eligibility), else None.  Structural validation matches the
    eager parser: truncation, a missing ``7777``, a wrong edition, or
    an unsupported template raises."""
    src = _as_src(src)
    n = src.size()
    metas: list[dict] = []
    off = 0
    while off < n:
        head = src.read_range(off, 16)
        if n - off < 16 or head[:4] != b"GRIB":
            raise ValueError("grib2: missing GRIB indicator")
        discipline = head[6]
        edition = head[7]
        if edition != 2:
            raise ValueError(f"grib2: edition {edition} (only 2)")
        total = _u(head, 8, 8)
        if off + total > n:
            raise ValueError("grib2: message length past end of stream")
        end = off + total
        p = off + 16
        grid = None
        pdt: tuple[int, int] = (255, 255)
        drs = None
        bitmap = None
        while p < end:
            head5 = src.read_range(p, min(5, end - p))
            if head5[:4] == b"7777":
                p += 4
                break
            if end - p < 5:
                raise ValueError("grib2: truncated section header")
            slen = _u(head5, 0, 4)
            snum = head5[4]
            if slen < 5 or p + slen > end:
                raise ValueError(f"grib2: bad section {snum} length {slen}")
            if snum == 3:
                grid = _parse_grid_template(src.read_range(p, slen))
            elif snum == 4:
                sec = src.read_range(p, min(slen, 11))
                tmpl = _u(sec, 7, 2)
                # templates 4.0-4.15 (analysis/forecast, ensemble,
                # derived, statistical/accumulated — NCEP uses 4.8 for
                # APCP-class fields) all share 4.0's leading layout:
                # parameter category at octet 10, number at octet 11
                # (each extends the previous template's octet sequence)
                pdt = (sec[9], sec[10]) if tmpl <= 15 and slen >= 11 \
                    else (255, 255)
            elif snum == 5:
                drs = _parse_drs(src.read_range(p, slen))
            elif snum == 6:
                if slen < 6:
                    raise ValueError("grib2: bit-map section too short")
                ind = src.read_range(p + 5, 1)[0]
                if ind == 0:
                    bitmap = (p + 6, slen - 6)
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
                simple = None
                if drs["tmpl"] == 0 and drs["nbits"] > 0 \
                        and drs["npacked"] == grid["ni"] * grid["nj"]:
                    simple = {"R": drs["R"], "E": drs["E"],
                              "D": drs["D"], "nbits": drs["nbits"]}
                metas.append({
                    "edition": 2, "grid": grid, "drs": drs,
                    "bitmap": bitmap, "payload": (p + 5, slen - 5),
                    "discipline": discipline,
                    "param_category": pdt[0], "param_number": pdt[1],
                    "simple": simple})
            p += slen
        else:
            raise ValueError("grib2: message not terminated by 7777")
        off = end
    if not metas:
        raise ValueError("grib2: no data fields in stream")
    return metas


def decode_grib2_field(src, meta) -> dict:
    """One scanned field -> the eager-parse dict (reads exactly that
    field's bit-map + payload bytes)."""
    src = _as_src(src)
    bitmap = _read_span(src, meta["bitmap"]) if meta["bitmap"] else None
    payload = _read_span(src, meta["payload"])
    DECODE_STATS["fields"] += 1
    return _decode_field(meta["grid"], meta["drs"], bitmap, payload,
                         meta["discipline"],
                         (meta["param_category"], meta["param_number"]))


def parse_grib2(data: bytes) -> list[dict]:
    """Every field in a (possibly multi-message) GRIB2 byte stream ->
    ``{"grid", "values" (nj, ni) float64 north-up, "discipline",
    "param_category", "param_number"}``.  Missing bit-map points are
    NaN.  Strict parse: truncation, a missing ``7777`` terminator, a
    wrong edition, or an unsupported template raises.  (Composed from
    :func:`scan_grib2` + :func:`decode_grib2_field`; the raster
    adapter below uses the pieces separately so metadata reads never
    unpack payloads.)"""
    src = _BytesSrc(data)
    return [decode_grib2_field(src, m) for m in scan_grib2(src)]


def _parse_drs(sec: bytes) -> dict:
    """Section 5 body -> DRS dict.  Native templates: 5.0 simple
    packing, 5.2 complex packing, 5.3 complex packing + spatial
    differencing, 5.40 JPEG2000 (decoded by the repo's own
    ``sources/jp2.py`` codec), 5.41 PNG (``sources/png.py``)."""
    tmpl = _u(sec, 9, 2)
    if tmpl not in (0, 2, 3, 40, 41):
        raise NotImplementedError(
            f"grib2: data representation template 5.{tmpl} "
            "(native: 5.0/5.2/5.3/5.40/5.41; use the rasterio "
            "fallback)")
    if len(sec) < 20:
        raise ValueError("grib2: DRS section too short")
    drs = {"tmpl": tmpl, "npacked": _u(sec, 5, 4),
           "R": struct.unpack(">f", sec[11:15])[0],
           "E": _sm(sec, 15, 2), "D": _sm(sec, 17, 2),
           "nbits": sec[19]}
    if drs["nbits"] > 32:           # spec ceiling; also guards the
        raise ValueError(           # int64 shift in _unpack_bits
            f"grib2: {drs['nbits']} bits per value (max 32)")
    if abs(drs["E"]) > 100 or abs(drs["D"]) > 100:
        raise ValueError(           # corrupt scale factors overflow
            "grib2: implausible binary/decimal scale factor")
    if tmpl in (2, 3):
        if len(sec) < (49 if tmpl == 3 else 47):
            raise ValueError(f"grib2: template 5.{tmpl} DRS too short")
        drs.update(mgmt=sec[22], ng=_u(sec, 31, 4),
                   wref=sec[35], wbits=sec[36],
                   lref=_u(sec, 37, 4), linc=sec[41],
                   last_len=_u(sec, 42, 4), lbits=sec[46])
        if drs["wbits"] > 32 or drs["lbits"] > 32:
            raise ValueError(       # numpy int64 shifts overflow
                "grib2: group width/length descriptor over 32 bits")
        if drs["mgmt"] not in (0, 1, 2):
            raise ValueError(f"grib2: missing-value management "
                             f"{drs['mgmt']} (spec: 0, 1 or 2)")
        if tmpl == 3:
            drs.update(order=sec[47], extra_octets=sec[48])
            if drs["order"] not in (1, 2):
                raise ValueError(
                    f"grib2: spatial differencing order {drs['order']} "
                    "(spec: 1 or 2)")
            if not 1 <= drs["extra_octets"] <= 4:
                raise ValueError("grib2: extra-descriptor octet count "
                                 f"{drs['extra_octets']} (expect 1..4)")
            if drs["mgmt"] != 0:
                raise NotImplementedError(
                    "grib2: spatial differencing with embedded missing "
                    "values (5.3 mgmt>0) — use a bit-map or the "
                    "rasterio fallback")
    return drs


_COMPLEX_CHUNK = 1 << 18            # values per variable-width unpack slab


def _unpack_complex(drs, payload: bytes):
    """Template 7.2/7.3 data section -> (X int64 array of ``npacked``
    values, missing bool mask or None).

    Layout (WMO templates 7.2/7.3): [7.3 only: ``order`` initial field
    values then the overall difference minimum, each ``extra_octets``
    sign-and-magnitude] then three octet-aligned sequences — NG group
    reference values (``nbits`` wide), NG group widths (``wbits``, plus
    ``wref``), NG scaled group lengths (``lbits``; true length =
    ``lref + scaled * linc``, last group overridden by ``last_len``) —
    then each group's values packed at its own width.  With missing
    management 1/2, the all-ones (and all-ones-minus-one) code in a
    group marks a missing point; a zero-width group is entirely missing
    when its REFERENCE is all-ones in ``nbits``."""
    ng, nbits, npacked = drs["ng"], drs["nbits"], drs["npacked"]
    if ng > npacked + 1:            # a group holds >= 0 points; more
        raise ValueError(           # groups than points is corruption
            f"grib2: {ng} groups for {npacked} packed points")
    off = 0
    if drs["tmpl"] == 3:
        order, n8 = drs["order"], drs["extra_octets"]
        need = (order + 1) * n8
        if len(payload) < need:
            raise ValueError("grib2: data section shorter than spatial-"
                             "differencing descriptors")
        ivals = [_sm(payload, i * n8, n8) for i in range(order)]
        gmin = _sm(payload, order * n8, n8)
        off = need

    def seq(width: int, count: int) -> np.ndarray:
        nonlocal off
        nbytes = (count * width + 7) // 8
        if len(payload) < off + nbytes:
            raise ValueError("grib2: data section shorter than group "
                             "descriptor sequences")
        out = _unpack_bits(payload[off:off + nbytes], width, count)
        off += nbytes
        return out

    refs = seq(nbits, ng)
    widths = drs["wref"] + seq(drs["wbits"], ng)
    if widths.size and int(widths.max()) > 32:
        raise ValueError(
            f"grib2: group width {int(widths.max())} bits (max 32)")
    lengths = (drs["lref"] + seq(drs["lbits"], ng)
               * drs["linc"]).astype(np.int64)
    if ng:
        lengths[-1] = drs["last_len"]
    if int(lengths.sum()) != npacked:
        raise ValueError(
            f"grib2: group lengths sum {int(lengths.sum())} != packed "
            f"point count {npacked}")
    wpv = np.repeat(widths, lengths)          # width per value
    rpv = np.repeat(refs, lengths)            # group reference per value
    bits = np.unpackbits(np.frombuffer(payload[off:], dtype=np.uint8))
    ends = np.cumsum(wpv)
    if ends.size and int(ends[-1]) > bits.size:
        raise ValueError("grib2: data section shorter than the declared "
                         "group widths require")
    starts = ends - wpv
    packed = np.zeros(npacked, dtype=np.int64)
    bits64 = bits.astype(np.int64)
    for c0 in range(0, npacked, _COMPLEX_CHUNK):  # bound the (n, W) slab
        c1 = min(c0 + _COMPLEX_CHUNK, npacked)
        w = wpv[c0:c1]
        wmax = int(w.max()) if w.size else 0
        if wmax == 0:
            continue
        j = np.arange(wmax, dtype=np.int64)
        valid = j[None, :] < w[:, None]
        idx = np.where(valid, starts[c0:c1, None] + j[None, :], 0)
        b = bits64[idx] * valid
        shift = np.maximum(w[:, None] - 1 - j[None, :], 0)
        packed[c0:c1] = np.sum(b << shift, axis=1)
    missing = None
    if drs["mgmt"] in (1, 2):
        missing = ((wpv > 0) & (packed == (1 << wpv) - 1)) \
            | ((wpv == 0) & (rpv == (1 << nbits) - 1))
        if drs["mgmt"] == 2:
            missing |= ((wpv > 1) & (packed == (1 << wpv) - 2)) \
                | ((wpv == 0) & (rpv == (1 << nbits) - 2))
    x = rpv + packed
    if drs["tmpl"] == 3:
        # g2lib comunpack order: overwrite the first `order` values
        # with the transmitted originals, add gmin to the rest, then
        # integrate (vectorized: first differences are a cumsum).
        if npacked < order + 1:
            raise ValueError("grib2: fewer points than the spatial-"
                             "differencing order needs")
        d = x.copy()
        d[order:] += gmin
        if order == 1:
            d[0] = ivals[0]
            x = np.cumsum(d)
        else:
            h = d.copy()                      # h[i] = g[i] - g[i-1]
            h[1] = ivals[1] - ivals[0]
            h[1:] = np.cumsum(h[1:])
            x = np.empty_like(d)
            x[0] = ivals[0]
            x[1:] = ivals[0] + np.cumsum(h[1:])
    return x, missing


def _decode_packed_image(drs, payload: bytes) -> np.ndarray:
    """Template 7.40/7.41 -> X values: the payload is a JPEG2000
    codestream / PNG image of the scaled integers (NCEP packs
    bit-mapped fields as a 1 x npacked image; full fields as nj x ni —
    either raveled form feeds the same Y formula + bit-map expansion).
    24/32-bit PNG uses RGB/RGBA channels as big-endian value bytes."""
    if drs["tmpl"] == 40:
        from rasterframes_spark.sources.jp2 import decode_jp2
        # dims gate BEFORE the full decode: a corrupt codestream
        # declaring giant/garbage geometry must fail fast, not spend
        # minutes decoding phantom code-blocks.  GRIB packs a RAW
        # codestream, so Xsiz/Ysiz/XOsiz/YOsiz sit at fixed offsets
        # right after SOC+SIZ (T.800 A.5.1) — no second full marker
        # walk (code-review r10 #2-6)
        if len(payload) < 24 or payload[:4] != b"\xFF\x4F\xFF\x51":
            raise ValueError(
                "grib2: template 5.40 payload is not a JPEG2000 "
                "codestream")
        w = _u(payload, 8, 4) - _u(payload, 16, 4)
        h = _u(payload, 12, 4) - _u(payload, 20, 4)
        if w * h != drs["npacked"]:
            raise ValueError(
                f"grib2: packed image has {w}x{h} points, DRS "
                f"declares {drs['npacked']}")
        img = np.asarray(decode_jp2(payload), dtype=np.int64)
    else:
        from rasterframes_spark.sources.png import decode_png
        if len(payload) < 24 or payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("grib2: template 5.41 payload is not PNG")
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        if w * h != drs["npacked"]:
            raise ValueError(
                f"grib2: packed image has {w}x{h} points, DRS "
                f"declares {drs['npacked']}")
        img = np.asarray(decode_png(payload)).astype(np.int64)
        if img.ndim == 3:                     # channels = value bytes
            nch = img.shape[2]
            img = sum(img[:, :, c] << (8 * (nch - 1 - c))
                      for c in range(nch))
    x = img.ravel()
    if x.size != drs["npacked"]:
        raise ValueError(
            f"grib2: packed image has {x.size} points, DRS declares "
            f"{drs['npacked']}")
    return x


def _decode_field(grid, drs, bitmap, payload, discipline, pdt) -> dict:
    ni, nj = grid["ni"], grid["nj"]
    npts = ni * nj
    if drs["npacked"] > npts:       # packed points can never exceed
        raise ValueError(           # the grid (alloc-bomb guard)
            f"grib2: {drs['npacked']} packed points on a {npts}-point "
            "grid")
    missing = None
    if drs["tmpl"] in (2, 3):
        x, missing = _unpack_complex(drs, payload)
    elif drs["tmpl"] in (40, 41):
        x = np.zeros(drs["npacked"], dtype=np.int64) if drs["nbits"] == 0 \
            else _decode_packed_image(drs, payload)
    else:
        x = _unpack_bits(payload, drs["nbits"], drs["npacked"])
    y = (drs["R"] + x.astype("float64") * (2.0 ** drs["E"])) \
        / (10.0 ** drs["D"])
    if missing is not None:
        y[missing] = np.nan
    if bitmap is not None:
        mask = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8))[:npts]
        if mask.size < npts:
            raise ValueError("grib2: bit-map shorter than the grid")
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


def _nbits_for(maxval: int) -> int:
    return max(int(maxval).bit_length(), 1) if maxval > 0 else 0


def _pack_complex(x: np.ndarray, order: int, group_len: int):
    """Scaled non-negative ints -> (template 5.2/5.3 DRS tail bytes,
    template 7.2/7.3 data section bytes).  ``order`` 0 = plain complex
    packing; 1/2 = spatial differencing first (the transmitted values
    become the order-th differences minus their minimum, with the
    initial originals + that minimum leading the data section).  The
    decoder round-trip is the oracle; grouping is fixed-length
    ``group_len`` with per-group min reference and tight widths."""
    x = np.asarray(x, dtype=np.int64)
    head = b""
    if order:
        if x.size < order + 1:
            raise ValueError("grib2: spatial differencing needs more "
                             "points than its order")
        ivals = [int(v) for v in x[:order]]
        d = np.diff(x, n=order).astype(np.int64)
        gmin = int(d.min()) if d.size else 0
        v = np.concatenate([np.zeros(order, dtype=np.int64), d - gmin])
        n8 = 1
        while any(abs(q) >= (1 << (8 * n8 - 1)) for q in ivals + [gmin]):
            n8 += 1
        head = b"".join(_pack_sm(q, n8) for q in ivals + [gmin])
    else:
        v, n8 = x, 0
    ng = max((v.size + group_len - 1) // group_len, 1)
    refs = np.zeros(ng, dtype=np.int64)
    widths = np.zeros(ng, dtype=np.int64)
    lengths = np.zeros(ng, dtype=np.int64)
    payload = bytearray()
    groups_bits = []
    for gi in range(ng):
        grp = v[gi * group_len:(gi + 1) * group_len]
        lengths[gi] = grp.size
        refs[gi] = int(grp.min()) if grp.size else 0
        rel = grp - refs[gi]
        widths[gi] = _nbits_for(int(rel.max()) if rel.size else 0)
        groups_bits.append((rel, int(widths[gi])))
    nbits = _nbits_for(int(refs.max()) if ng else 0)
    wbits = _nbits_for(int(widths.max()) if ng else 0)
    lbits = _nbits_for(int(lengths.max()) if ng else 0)
    payload += head
    payload += _pack_bits(refs, nbits)
    payload += _pack_bits(widths, wbits)
    payload += _pack_bits(lengths, lbits)
    # group values share one unpadded bitstream
    allbits = np.concatenate([
        ((g[:, None] >> np.arange(w - 1, -1, -1, dtype=np.int64)[None, :])
         & 1).astype(np.uint8).ravel()
        for g, w in groups_bits if w > 0] or
        [np.zeros(0, dtype=np.uint8)])
    payload += np.packbits(allbits).tobytes()
    drs_tail = bytes([0, 1, 0]) + b"\x00" * 8 \
        + struct.pack(">I", ng) + bytes([0, wbits]) \
        + struct.pack(">I", 0) + bytes([1]) \
        + struct.pack(">I", int(lengths[-1])) + bytes([lbits])
    # ^ octets 21-47: orig-type int, general splitting, mgmt 0, missing
    #   substitutes 0, NG, wref 0, wbits, lref 0, linc 1, last, lbits
    if order:
        drs_tail += bytes([order, n8])
    return nbits, drs_tail, bytes(payload)


def write_grib2(fields, extent, nbits: int = 16, dscale: int = 0,
                discipline: int = 0, params=None,
                packing: str = "simple", group_len: int = 64) -> bytes:
    """Encode 2-D float arrays (north-up, shared lat/lon grid) as one
    GRIB2 message per field: template 3.0 grid + 4.0 product + a data
    representation chosen by ``packing`` — ``simple`` (5.0),
    ``complex`` (5.2), ``complex_diff`` (5.3, second-order spatial
    differencing), ``jpeg2000`` (5.40, the repo's own ISO 15444-1
    encoder), or ``png`` (5.41, the repo's own PNG encoder; depth
    8/16/24 by scaled range).  NaN cells emit a bit-map (packed-image
    modes then pack the present points as a 1 x npacked image, the
    NCEP convention).  ``extent`` is the cell-EDGE (xmin, ymin, xmax,
    ymax); cell centers land at the half-pixel like every other sink
    here.  Quantization error is bounded by ``2**(E-1) / 10**dscale``
    with E chosen so the scaled range fits ``nbits``; integer-valued
    fields with range < 2**nbits and ``dscale=0`` round-trip exactly
    (E = 0)."""
    if packing not in ("simple", "complex", "complex_diff",
                       "jpeg2000", "png"):
        raise ValueError(f"grib2: unknown packing {packing!r}")
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
        red = struct.pack(">f", r) + _pack_sm(e, 2) + _pack_sm(dscale, 2)
        if packing == "simple":
            s5 = sec(5, struct.pack(">IH", int(vals.size), 0)
                     + red + bytes([nbits, 0]))
            s7 = sec(7, _pack_bits(x, nbits if vals.size else 0))
        elif packing in ("complex", "complex_diff"):
            # degenerate fields (all-NaN / fewer finite points than the
            # differencing order needs) fall back to plain 5.2 — every
            # other packing encodes them via the bitmap path, and a
            # mixed-field write must not fail on its emptiest member
            # (ADVICE r10 #3)
            order = 2 if packing == "complex_diff" and x.size > 2 else 0
            gb, tail, data = _pack_complex(x, order, group_len)
            s5 = sec(5, struct.pack(">IH", int(vals.size),
                                    3 if order else 2)
                     + red + bytes([gb]) + tail)
            s7 = sec(7, data)
        else:                       # packed-image modes (5.40 / 5.41)
            depth = _nbits_for(int(x.max()) if x.size else 0)
            shape = (nj, ni) if mask.all() else (1, int(vals.size))
            img = x.reshape(shape)
            if packing == "jpeg2000":
                from rasterframes_spark.sources.jp2 import encode_jp2
                data = b"" if depth == 0 else encode_jp2(
                    img, depth=depth, signed=False,
                    levels=min(5, max(int(min(shape)).bit_length() - 3,
                                      0)))
                s5 = sec(5, struct.pack(">IH", int(vals.size), 40)
                         + red + bytes([depth, 0, 0, 255]))
            else:
                if depth > 24:
                    raise ValueError("grib2: png packing supports "
                                     "scaled depths up to 24 bits")
                from rasterframes_spark.sources.png import encode_png
                if depth == 0:
                    data = b""
                elif depth <= 8:
                    data = encode_png(img.astype(np.uint8))
                elif depth <= 16:
                    data = encode_png(img.astype(np.uint16))
                else:               # 24-bit: value bytes as RGB
                    rgb = np.stack([(img >> 16) & 0xFF,
                                    (img >> 8) & 0xFF,
                                    img & 0xFF], axis=-1)
                    data = encode_png(rgb.astype(np.uint8))
                s5 = sec(5, struct.pack(">IH", int(vals.size), 41)
                         + red + bytes([depth, 0]))
            s7 = sec(7, data)
        if mask.all():
            s6 = sec(6, b"\xff")
        else:
            s6 = sec(6, b"\x00" + np.packbits(
                mask.astype(np.uint8)).tobytes())
        body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
        out += b"GRIB" + b"\x00\x00" + bytes([discipline, 2]) \
            + struct.pack(">Q", 16 + len(body)) + body
    return bytes(out)


# ---------------------------------------------------------------------------
# raster_reader dispatch adapter (mirrors netcdf.read_info/read_window)
#
# LAZY metadata contract (VERDICT r10 #3): read_info walks sections 0-6
# only — dims/extent come from the grid template, NoData presence from
# bit-map/missing-management metadata — and NEVER unpacks a payload.
# read_window decodes exactly the requested band on demand (cached,
# bounded), and plain 5.0 fixed-width fields decode ROW-WINDOWED: the
# requested rows' bits sit at computable offsets, so a tiling pass over
# an operational file reads each payload byte once and an AOI window
# reads only its rows.  `read_raster`'s chunk-grid pass and AOI pruning
# therefore touch section headers (a few KB), not pixels — the same
# laziness-as-I/O-pruning posture the GeoTIFF path pins in
# tests/test_lazy_io.py.
# ---------------------------------------------------------------------------

from collections import OrderedDict

_SCAN_CACHE: OrderedDict = OrderedDict()    # uri -> (metas, extent)
_SCAN_CACHE_MAX = 64
_BAND_CACHE: OrderedDict = OrderedDict()    # (uri, band) -> 2-D float64
_BAND_CACHE_MAX = 64
_BAND_CACHE_BYTES = 256 << 20   # cap decoded-band residency per worker


def _meta_src(src):
    """Small-block view of a block-cached source for METADATA walks:
    headers are a few hundred bytes per message, so a 256 KiB-block
    RangeSource charges ~1,000x the bytes actually needed per header
    cluster (measured: 63 MB of a 126 MB 60-file catalog at the
    default block size vs ~1 MB of true header bytes).  Shared with
    the HDF5 reader since r12 — `rangeio.meta_view` is the one
    implementation (payload reads stay on the caller's big-block
    source, where large blocks help)."""
    from rasterframes_spark.sources.rangeio import meta_view

    return meta_view(src)


def _scan(src):
    """(metas, extent) for either edition; cached per uri (metadata
    only — a few hundred bytes per field)."""
    src = _as_src(src)
    # cache ONLY by uri: a bytes object's id() can be recycled by the
    # allocator and serve another file's grid (the jp2 reader documents
    # the same hazard; code-review r10 #2-1)
    key = getattr(src, "uri", None)
    if key is not None and key in _SCAN_CACHE:
        _SCAN_CACHE.move_to_end(key)
        return _SCAN_CACHE[key]
    walk = _meta_src(src)
    head = walk.read_range(0, 8)
    if len(head) >= 8 and head[7] == 1:       # legacy edition routes to
        from rasterframes_spark.sources.grib1 import scan_grib1
        metas = scan_grib1(walk)              # the r10 GRIB1 reader
    else:
        metas = scan_grib2(walk)
    g0 = metas[0]["grid"]
    for m in metas[1:]:
        g = m["grid"]
        if (g["ni"], g["nj"], g["la1"], g["lo1"], g["di"], g["dj"]) != \
                (g0["ni"], g0["nj"], g0["la1"], g0["lo1"],
                 g0["di"], g0["dj"]):
            raise ValueError(
                "grib2: fields on differing grids in one file; read "
                "them per-message")
    out = (metas, _grid_extent(g0))
    if key is not None:
        if len(_SCAN_CACHE) >= _SCAN_CACHE_MAX:
            _SCAN_CACHE.popitem(last=False)
        _SCAN_CACHE[key] = out
    return out


def _decode_band(src, meta) -> np.ndarray:
    if meta["edition"] == 1:
        from rasterframes_spark.sources.grib1 import decode_grib1_field
        return decode_grib1_field(src, meta)["values"]
    return decode_grib2_field(src, meta)["values"]


def _unpack_bits_at(payload: bytes, nbits: int, count: int,
                    bit0: int) -> np.ndarray:
    """Like :func:`_unpack_bits` but starting ``bit0`` bits into the
    buffer (row-windowed decode lands mid-byte for odd widths)."""
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    need = bit0 + count * nbits
    if bits.size < need:
        raise ValueError("grib: data section shorter than nbits*npts")
    weights = (1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return bits[bit0:need].reshape(count, nbits).astype(np.int64) @ weights


def _read_rows_simple(src, meta, r0: int, h: int) -> np.ndarray:
    """North-up rows [r0, r0+h) of a plain fixed-width field (GRIB2
    template 5.0 / GRIB1 simple packing, no bit-map, all points
    packed): values are ``nbits``-wide at computable bit offsets, so
    only the covering byte range is read and unpacked."""
    grid, sp = meta["grid"], meta["simple"]
    ni, nj = grid["ni"], grid["nj"]
    nbits = sp["nbits"]
    scan = grid["scan"]
    if scan & 0x40:                 # stored rows run south -> north
        s0, s1 = nj - (r0 + h), nj - r0
    else:
        s0, s1 = r0, r0 + h
    off, ln = meta["payload"]
    bit_a, bit_b = s0 * ni * nbits, s1 * ni * nbits
    byte0, byte1 = bit_a // 8, (bit_b + 7) // 8
    if byte1 > ln:
        raise ValueError("grib: data section shorter than nbits*npts")
    payload = src.read_range(off + byte0, byte1 - byte0)
    if len(payload) < byte1 - byte0:
        raise ValueError("grib: truncated data section")
    DECODE_STATS["row_windows"] += 1
    x = _unpack_bits_at(payload, nbits, (s1 - s0) * ni, bit_a - byte0 * 8)
    y = (sp["R"] + x.astype("float64") * (2.0 ** sp["E"])) \
        / (10.0 ** sp["D"])
    a = y.reshape(s1 - s0, ni)
    if scan & 0x80:                 # -i: west <- east
        a = a[:, ::-1]
    if scan & 0x40:
        a = a[::-1]
    return a


def read_info(src):
    """Format-dispatch adapter: GRIB metadata (either edition) as a
    GeoTiffInfo (via='grib'); each field is one band.  Metadata-only:
    NoData is declared from the file's OWN metadata — a bit-map
    section or missing-value management — without decoding pixels (the
    GDAL convention; for float64 bands `NaN-NoData` and `no NoData`
    are the same cell type, so the declaration is celltype-exact)."""
    from rasterframes_spark.sources.geotiff import GeoTiffInfo

    src = _as_src(src)
    head = src.read_range(0, 8)
    if head[:4] != b"GRIB":
        raise ValueError("not a GRIB stream")
    if len(head) >= 8 and head[7] not in (1, 2):
        raise ValueError(f"grib edition {head[7]} unsupported "
                         "(native: 1 and 2)")
    metas, extent = _scan(src)
    g = metas[0]["grid"]
    nx, ny, nb = g["ni"], g["nj"], len(metas)
    nodata = float("nan") if any(
        m["bitmap"] is not None
        or (m.get("drs") or {}).get("mgmt", 0) in (1, 2)
        for m in metas) else None
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
    src = _as_src(src)
    metas, _extent = _scan(src)
    if not 0 <= band < len(metas):
        raise IndexError(f"grib: band {band} out of range")
    meta = metas[band]
    ni, nj = meta["grid"]["ni"], meta["grid"]["nj"]
    if not (0 <= r0 and 0 <= c0 and w > 0 and h > 0
            and r0 + h <= nj and c0 + w <= ni):
        # public adapter surface (ADVICE r11): the row-window fast path
        # computes stored-row bit offsets from r0/h — out of range with
        # scan flag 0x40 it would go NEGATIVE and slice garbage, where
        # the eager path merely clamps.  Validate before either path.
        raise IndexError(f"grib: window ({c0},{r0},{w},{h}) out of "
                         f"range for {ni}x{nj}")
    key = (getattr(src, "uri", None), band)
    cached = _BAND_CACHE.get(key) if key[0] is not None else None
    if cached is not None:
        _BAND_CACHE.move_to_end(key)
        return cached[r0:r0 + h, c0:c0 + w]
    if meta["simple"] is not None and meta["bitmap"] is None \
            and h < meta["grid"]["nj"]:
        # strict row subset of a fixed-width field: decode just those
        # rows — a tiling pass touches each payload byte once in total,
        # with no full-band array ever materialized
        return _read_rows_simple(src, meta, r0, h)[:, c0:c0 + w]
    arr = _decode_band(src, meta)
    if key[0] is not None and arr.nbytes <= _BAND_CACHE_BYTES:
        while len(_BAND_CACHE) >= _BAND_CACHE_MAX or (
                _BAND_CACHE and sum(a.nbytes for a in _BAND_CACHE.values())
                + arr.nbytes > _BAND_CACHE_BYTES):
            _BAND_CACHE.popitem(last=False)
        _BAND_CACHE[key] = arr
    return arr[r0:r0 + h, c0:c0 + w]
