"""Hand-assembled NetCDF classic (CDF-1/CDF-2) spec fixtures.

The `nc` gate family and the NetCDF pytest matrix verify the reader
against this repo's OWN ``write_netcdf`` — a closed loop (same caveat
class VERDICT r8 recorded for MP4/WebM before their hand-built
fixtures).  These files are assembled field by field from the published
NetCDF classic format spec (the same discipline as
tests/test_video_container_fixtures.py), using spec corners the own
writer never emits:

- ``numrecs = -1`` (the STREAMING sentinel: record count must be
  inferred from the file length and the record stride),
- TWO record variables (each record slab padded to 4 inside the
  interleaved record block),
- the single-record-variable special case (slabs NOT padded — stride is
  the raw vsize, here 6 bytes),
- CDF-2 (magic ``CDF\\x02``) with 64-bit ``begin`` offsets,
- CF ``scale_factor`` / ``add_offset`` / ``_FillValue`` attributes on a
  packed short variable.

Every expected value is derivable from the bytes by the spec's field
math; the reader under test is ``sources/netcdf.py``.
"""
from __future__ import annotations

import struct

import numpy as np

from rasterframes_spark.sources.netcdf import (read_netcdf_info,
                                               read_netcdf_var)


def _i4(v):
    return struct.pack(">i", v)


def _i8(v):
    return struct.pack(">q", v)


def _i2(v):
    return struct.pack(">h", v)


def _f8(v):
    return struct.pack(">d", v)


def _name(s: str) -> bytes:
    """name = nelems(i4) + bytes + zero-pad to a 4-byte boundary."""
    b = s.encode()
    return _i4(len(b)) + b + b"\x00" * (-len(b) % 4)


def _var(nm, dimids, atts, nc_type, vsize, begin, wide=False) -> bytes:
    """var entry: name, ndims, dimid list, vatt_list (ABSENT = 0 0),
    nc_type, vsize, begin (i4 in CDF-1, i8 in CDF-2)."""
    return (_name(nm) + _i4(len(dimids)) + b"".join(_i4(d) for d in dimids)
            + (_i4(0x0C) + _i4(len(atts)) + b"".join(atts)
               if atts else _i4(0) + _i4(0))
            + _i4(nc_type) + _i4(vsize)
            + (_i8(begin) if wide else _i4(begin)))


_ABSENT = _i4(0) + _i4(0)


def test_cdf1_fixed_dims_cf_attributes():
    """CDF-1, dims lat(3) x lon(4); double coordinate variables; a
    packed NC_SHORT data variable carrying scale_factor=0.5 (double),
    add_offset=100.0 (double) and _FillValue=-32768 (short, value
    padded to 4 in the attribute block).  unpacked = raw * 0.5 + 100,
    fill cells masked."""
    dims = _i4(0x0A) + _i4(2) + _name("lat") + _i4(3) + _name("lon") + _i4(4)
    v_atts = [
        _name("scale_factor") + _i4(6) + _i4(1) + _f8(0.5),
        _name("add_offset") + _i4(6) + _i4(1) + _f8(100.0),
        _name("_FillValue") + _i4(3) + _i4(1) + _i2(-32768) + b"\x00\x00",
    ]
    lat = [10.0, 20.0, 30.0]
    lon = [-120.0, -110.0, -100.0, -90.0]
    raw = [[1, 2, 3, -32768], [5, 6, 7, 8], [9, 10, 11, 12]]

    def build(b_lat):
        # vsizes: lat 3*8=24, lon 4*8=32, v 12 shorts = 24 (all already
        # multiples of 4); data laid out back to back
        vl = (_i4(0x0B) + _i4(3)
              + _var("lat", [0], [], 6, 24, b_lat)
              + _var("lon", [1], [], 6, 32, b_lat + 24)
              + _var("v", [0, 1], v_atts, 3, 24, b_lat + 56))
        return b"CDF\x01" + _i4(0) + dims + _ABSENT + vl

    hdr = build(0)
    hdr = build(len(hdr))
    data = (hdr + b"".join(_f8(v) for v in lat)
            + b"".join(_f8(v) for v in lon)
            + b"".join(_i2(x) for r in raw for x in r))
    info = read_netcdf_info(data)
    assert info.dims == [("lat", 3), ("lon", 4)]
    np.testing.assert_array_equal(read_netcdf_var(data, "lat"), lat)
    arr = read_netcdf_var(data, "v")
    exp = np.array(raw, dtype="float64") * 0.5 + 100.0
    mask = np.array(raw) == -32768
    assert arr.mask.tolist() == mask.tolist()
    np.testing.assert_array_equal(np.asarray(arr)[~mask], exp[~mask])
    # packed values untouched when unpack=False
    rawback = read_netcdf_var(data, "v", unpack=False)
    np.testing.assert_array_equal(np.asarray(rawback), raw)


_REC_DIMS = (_i4(0x0A) + _i4(2)
             + _name("time") + _i4(0)      # length 0 = the record dim
             + _name("x") + _i4(3))


def test_streaming_numrecs_two_record_vars():
    """numrecs = -1 is the spec's STREAMING sentinel: the reader must
    infer the record count from file length / record stride.  With two
    record variables each per-record slab pads to 4: a short[time,x]
    slab is 6 -> 8 bytes, b short[time] is 2 -> 4; recsize 12; the four
    records interleave a-slab then b-slab."""
    def build(ba):
        return (b"CDF\x01" + _i4(-1) + _REC_DIMS + _ABSENT
                + _i4(0x0B) + _i4(2)
                + _var("a", [0, 1], [], 3, 8, ba)
                + _var("b", [0], [], 3, 4, ba + 8))

    hdr = build(0)
    hdr = build(len(hdr))
    recs = b"".join(
        b"".join(_i2(10 * r + i) for i in range(3)) + b"\x00\x00"
        + _i2(100 + r) + b"\x00\x00"
        for r in range(4))
    data = hdr + recs
    assert read_netcdf_var(data, "a").tolist() == [
        [0, 1, 2], [10, 11, 12], [20, 21, 22], [30, 31, 32]]
    assert read_netcdf_var(data, "b").tolist() == [100, 101, 102, 103]


def test_single_record_var_unpadded_stride():
    """The spec's one special case: when there is exactly ONE record
    variable its slabs are NOT padded — the record stride is the raw
    vsize (6 bytes for short[time, x(3)]), which a padded-stride reader
    would mis-walk after the first record."""
    def build(ba):
        return (b"CDF\x01" + _i4(5) + _REC_DIMS + _ABSENT
                + _i4(0x0B) + _i4(1) + _var("a", [0, 1], [], 3, 6, ba))

    hdr = build(0)
    hdr = build(len(hdr))
    data = hdr + b"".join(
        b"".join(_i2(7 * r + i) for i in range(3)) for r in range(5))
    assert read_netcdf_var(data, "a").tolist() == [
        [7 * r + i for i in range(3)] for r in range(5)]


def test_cdf2_wide_offsets():
    """CDF-2 (magic CDF\\x02): identical grammar except ``begin`` is a
    64-bit signed int."""
    dims = _i4(0x0A) + _i4(1) + _name("x") + _i4(3)

    def build(ba):
        return (b"CDF\x02" + _i4(0) + dims + _ABSENT
                + _i4(0x0B) + _i4(1)
                + _var("v", [0], [], 4, 12, ba, wide=True))

    hdr = build(0)
    hdr = build(len(hdr))
    data = hdr + b"".join(_i4(v) for v in (11, 22, 33))
    assert read_netcdf_var(data, "v").tolist() == [11, 22, 33]
