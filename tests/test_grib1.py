"""GRIB edition 1 source: hand-assembled spec fixtures + round-trips.

Same discipline as tests/test_grib2.py: the positive fixture is built
section-by-section from the public WMO FM 92-VIII tables with the
expected values derived by hand — in particular the reference value
R = 100.0 is the hand-computed IBM System/360 hex float
0x42 0x64 0x00 0x00 (exponent 66 = 16^2, fraction 0.390625 =
6,553,600 / 2^24; 0.390625 * 256 = 100), independent of the
production ``ibm_float_bytes`` encoder.  Negative controls pin the
strict-parse posture and the documented hatches (spherical harmonics,
second-order packing, predefined grids/bit-maps).
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from rasterframes_spark.sources import grib1 as G1
from rasterframes_spark.sources import grib2 as G2


def sm3(v: int) -> bytes:
    """3-byte sign-and-magnitude, composed by hand."""
    return ((0x800000 | -v) if v < 0 else v).to_bytes(3, "big")


def PDS(flags=0x80, param=11, dscale=1) -> bytes:
    return b"\x00\x00\x1c" + bytes([
        3, 7, 0, 255, flags, param, 1, 0, 0,
        26, 1, 1, 0, 0, 1, 0, 0, 10, 0, 0, 0, 21, 0]) \
        + ((0x8000 | -dscale) if dscale < 0 else dscale).to_bytes(2, "big")


def GDS(ni=3, nj=2, la1=60_000, lo1=10_000, la2=50_000, lo2=30_000,
        di=10_000, dj=10_000, scan=0x00, rep=0) -> bytes:
    return b"\x00\x00\x20" + bytes([0, 255, rep]) \
        + struct.pack(">HH", ni, nj) \
        + sm3(la1) + sm3(lo1) + bytes([0x80]) \
        + sm3(la2) + sm3(lo2) \
        + struct.pack(">HH", di, dj) + bytes([scan]) + b"\x00" * 4


def BDS(flags=0x00, e=1, r=b"\x42\x64\x00\x00", nbits=4,
        data=bytes([0x12, 0x34, 0x50]), pad_even=True) -> bytes:
    body = bytes([flags]) + ((0x8000 | -e) if e < 0 else e).to_bytes(
        2, "big") + r + bytes([nbits]) + data
    if pad_even and (len(body) + 3) % 2:
        body = bytes([body[0] + 8]) + body[1:] + b"\x00"
    return struct.pack(">I", len(body) + 3)[1:] + body


def MSG(*sections, edition=1) -> bytes:
    body = b"".join(sections) + b"7777"
    return b"GRIB" + struct.pack(">I", len(body) + 8)[1:] \
        + bytes([edition]) + body


# X = [1,2,3,4,5,0] at 4 bits (hand-packed 0x12 0x34 0x50, shared with
# the GRIB2 baseline fixture); R=100 (IBM 0x42640000), E=1, D=1
#   -> Y = (100 + 2X)/10
Y_EXPECT = [[10.2, 10.4, 10.6], [10.8, 11.0, 10.0]]


def test_ibm_float_hand_values():
    """Spec anchors worked out on paper: 100.0, 1.0, -0.5, 16.0."""
    assert G1.ibm_float(b"\x42\x64\x00\x00") == 100.0
    assert G1.ibm_float(b"\x41\x10\x00\x00") == 1.0      # 0.0625*16
    assert G1.ibm_float(b"\xc0\x80\x00\x00") == -0.5
    assert G1.ibm_float(b"\x42\x10\x00\x00") == 16.0
    assert G1.ibm_float(b"\x00\x00\x00\x00") == 0.0
    # encoder round-trips, incl. values with no exact IBM form
    for v in (100.0, -3.14159, 1e-6, 65535.0, 2.0 ** -24, -0.001):
        got = G1.ibm_float(G1.ibm_float_bytes(v))
        assert abs(got - v) <= abs(v) * 2.0 ** -20


def test_hand_assembled_grib1_message():
    msg = MSG(PDS(), GDS(), BDS())
    (f,) = G1.parse_grib1(msg)
    np.testing.assert_allclose(f["values"], Y_EXPECT, rtol=1e-12)
    assert f["param_number"] == 11
    # same grid-extent convention as edition 2 (cell-edge, centers
    # 50..60N / 10..30E at 10-degree cells)
    assert G2._grid_extent(f["grid"]) == (5.0, 45.0, 35.0, 65.0)


def test_hand_assembled_grib1_bitmap_and_scan():
    # bit-map: drop points 2 and 4 (0-based) -> X=[1,2,4,0] packed by
    # hand at 4 bits: 0001 0010 0100 0000 = 0x12 0x40
    bm_bits = np.array([1, 1, 0, 1, 0, 1], dtype=np.uint8)
    # 6 map bits in 2 bitmap octets (even section length 8) -> 10
    # unused trailing bits
    bms = b"\x00\x00\x08" + bytes([10]) + b"\x00\x00" \
        + np.packbits(bm_bits).tobytes() + b"\x00"
    msg = MSG(PDS(flags=0xC0), GDS(), bms,
              BDS(data=bytes([0x12, 0x40])))
    (f,) = G1.parse_grib1(msg)
    exp = np.array([[10.2, 10.4, np.nan], [10.8, np.nan, 10.0]])
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(exp))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(exp), rtol=1e-12)
    # scan 0x40 (+j: south first): same bytes now fill south-up, so
    # the decoded north-up array is the row-flip of the baseline
    msg = MSG(PDS(), GDS(la1=50_000, la2=60_000, scan=0x40), BDS())
    (f,) = G1.parse_grib1(msg)
    np.testing.assert_allclose(f["values"], Y_EXPECT[::-1], rtol=1e-12)


def test_grib1_negative_controls():
    good = MSG(PDS(), GDS(), BDS())
    G1.parse_grib1(good)
    with pytest.raises(ValueError, match="edition"):
        G1.parse_grib1(MSG(PDS(), GDS(), BDS(), edition=0))
    with pytest.raises(ValueError, match="past end"):
        G1.parse_grib1(good[:-6])
    with pytest.raises(ValueError, match="7777"):
        G1.parse_grib1(good[:-4] + b"\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="spherical"):
        G1.parse_grib1(MSG(PDS(), GDS(), BDS(flags=0x80)))
    with pytest.raises(NotImplementedError, match="second-order"):
        G1.parse_grib1(MSG(PDS(), GDS(), BDS(flags=0x40)))
    with pytest.raises(NotImplementedError, match="predefined grid"):
        G1.parse_grib1(MSG(PDS(flags=0x00), GDS(), BDS()))
    with pytest.raises(NotImplementedError, match="representation type"):
        G1.parse_grib1(MSG(PDS(), GDS(rep=1), BDS()))
    with pytest.raises(NotImplementedError, match="increments not given"):
        G1.parse_grib1(MSG(PDS(), GDS(di=0xFFFF), BDS()))
    with pytest.raises(NotImplementedError, match="bit-map"):
        bms = b"\x00\x00\x06" + bytes([0]) + b"\x00\x01"
        G1.parse_grib1(MSG(PDS(flags=0xC0), GDS(), bms, BDS()))
    with pytest.raises(ValueError, match="shorter than"):
        G1.parse_grib1(MSG(PDS(), GDS(),
                           BDS(data=bytes([0x12]), pad_even=False)))


def test_grib1_writer_roundtrip():
    rng = np.random.default_rng(9)
    ext = (-110.0, 30.0, -94.0, 46.0)
    a = rng.integers(-500, 4000, size=(16, 16)).astype("float64")
    a[3, 4] = np.nan
    (f,) = G1.parse_grib1(G1.write_grib1([a], ext))
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(a))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(a), rtol=0, atol=0)
    # float quantization bound 2**(E-1)/10**dscale
    g = rng.normal(20.0, 5.0, size=(16, 16))
    (f,) = G1.parse_grib1(G1.write_grib1([g], ext, nbits=14, dscale=2))
    assert float(np.abs(f["values"] - g).max()) <= 0.005
    # multi-field file -> bands; constant field
    c = np.full((16, 16), 42.0)
    fs = G1.parse_grib1(G1.write_grib1([c, a], ext))
    assert len(fs) == 2
    np.testing.assert_array_equal(fs[0]["values"], c)
    # non-millidegree grid refused (edition 1 stores millidegrees)
    with pytest.raises(ValueError, match="millidegrees"):
        G1.write_grib1([a], (-110.0, 30.0, -93.0, 43.0))


def test_grib1_dispatch_through_shared_adapter(tmp_path):
    """Edition 1 files flow through the same grib2 read_info/
    read_window adapter (and therefore read_raster) as edition 2."""
    rng = np.random.default_rng(4)
    a = rng.integers(0, 900, size=(12, 18)).astype("float64")
    a[0, 0] = np.nan
    p = tmp_path / "legacy.grib"
    p.write_bytes(G1.write_grib1([a], (-120.0, 10.0, -48.0, 58.0)))

    class Src:
        uri = str(p)

        def read_range(self, off, n):
            return p.read_bytes()[off:off + n]

        def size(self):
            return len(p.read_bytes())

    info = G2.read_info(Src())
    assert (info.width, info.height, info.bands) == (18, 12, 1)
    assert info.extent == (-120.0, 10.0, -48.0, 58.0)
    win = G2.read_window(Src(), info, 2, 1, 4, 3)
    np.testing.assert_array_equal(np.nan_to_num(win),
                                  np.nan_to_num(a[1:4, 2:6]))


# ---------------------------------------------------------------------------
# hypothesis: randomized round-trips (both editions share the strategy)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _fields(draw):
    nj = draw(st.integers(2, 12))
    ni = draw(st.integers(2, 12))
    kind = draw(st.sampled_from(["int", "float", "const"]))
    rng = np.random.default_rng(draw(st.integers(0, 2 ** 31)))
    if kind == "int":
        lo = draw(st.integers(-5000, 0))
        hi = draw(st.integers(1, 60000))
        a = rng.integers(lo, lo + hi, size=(nj, ni)).astype("float64")
    elif kind == "float":
        a = rng.normal(draw(st.floats(-1e3, 1e3)), 10.0, size=(nj, ni))
    else:
        a = np.full((nj, ni), draw(st.floats(-1e4, 1e4)))
    if draw(st.booleans()):
        k = draw(st.integers(1, nj * ni - 1))
        flat = a.ravel()
        flat[rng.choice(nj * ni, size=k, replace=False)] = np.nan
        a = flat.reshape(nj, ni)
    return a


@settings(max_examples=40, deadline=None)
@given(a=_fields(),
       packing=st.sampled_from(["simple", "complex", "complex_diff",
                                "jpeg2000", "png"]),
       group_len=st.sampled_from([3, 64, 500]))
def test_grib2_roundtrip_property(a, packing, group_len):
    """Any field, any packing: NaN mask preserved exactly; integer
    fields bit-exact; float fields within the quantization bound."""
    if packing == "complex_diff" and np.isfinite(a).sum() < 3:
        return                      # differencing needs order+1 points
    nj, ni = a.shape
    ext = (0.0, 0.0, float(ni), float(nj))
    b = G2.write_grib2([a], ext, nbits=16, packing=packing,
                       group_len=group_len)
    (f,) = G2.parse_grib2(b)
    v = f["values"]
    np.testing.assert_array_equal(np.isnan(v), np.isnan(a))
    fin = np.isfinite(a)
    if fin.any():
        vals = a[fin]
        if np.all(vals == np.round(vals)) and \
                (vals.max() - vals.min()) < (1 << 16) and \
                np.abs(vals).max() < 2 ** 22:
            np.testing.assert_allclose(v[fin], vals, rtol=0, atol=0)
        else:
            rngv = float(vals.max() - vals.min())
            e = 0
            while rngv > 0 and rngv / (2.0 ** e) > (1 << 16) - 1:
                e += 1
            # bound: simple-packing quantization + float32 R storage
            tol = 2.0 ** (e - 1) + abs(vals.min()) * 2.0 ** -22 + 1e-9
            assert float(np.abs(v[fin] - vals).max()) <= tol


@settings(max_examples=40, deadline=None)
@given(a=_fields())
def test_grib1_roundtrip_property(a):
    nj, ni = a.shape
    ext = (0.0, 0.0, float(ni), float(nj))
    (f,) = G1.parse_grib1(G1.write_grib1([a], ext))
    v = f["values"]
    np.testing.assert_array_equal(np.isnan(v), np.isnan(a))
    fin = np.isfinite(a)
    if fin.any():
        vals = a[fin]
        if np.all(vals == np.round(vals)) and \
                (vals.max() - vals.min()) < (1 << 16) and \
                np.abs(vals).max() < 2 ** 22:
            np.testing.assert_allclose(v[fin], vals, rtol=0, atol=0)
        else:
            rngv = float(vals.max() - vals.min())
            e = 0
            while rngv > 0 and rngv / (2.0 ** e) > (1 << 16) - 1:
                e += 1
            tol = 2.0 ** (e - 1) + abs(vals.min()) * 2.0 ** -20 + 1e-9
            assert float(np.abs(v[fin] - vals).max()) <= tol


def test_prime_meridian_straddle_extent():
    """code-review r10 #1: a grid straddling 0 degrees (stored 350.5E
    .. 389.5E by the writer) must reconstruct its signed extent; the
    old parser folded lo2 % 360 below lo1 and the sorted-endpoint
    extent spanned 20..360."""
    a = np.arange(40, dtype="f8").reshape(5, 8)
    (f,) = G1.parse_grib1(G1.write_grib1([a], (-10.0, 40.0, 30.0, 58.0)))
    ext = G2._grid_extent(f["grid"])
    assert abs(ext[0] - -10.0) < 1e-9 and abs(ext[2] - 30.0) < 1e-9
    np.testing.assert_array_equal(f["values"], a)
    # a file storing native SIGNED longitudes parses unshifted
    msg = MSG(PDS(), GDS(lo1=-20_000, lo2=0, di=10_000), BDS())
    (f,) = G1.parse_grib1(msg)
    assert G2._grid_extent(f["grid"])[0] == -25.0


def test_write_grib1_refuses_uint24_overflow():
    """ADVICE r10 #1: a message over 2^24-1 octets used to silently
    drop the high byte of the 3-byte length fields — an 18 MB file
    whose own parser fails with 'not terminated by 7777'.  The writer
    must refuse instead (GRIB1 simply cannot represent it)."""
    big = np.zeros((3000, 3000), dtype="float64")
    big[0, 0] = 1.0                 # non-constant: full 16-bit payload
    with pytest.raises(ValueError, match=r"2\^24-1 octet ceiling"):
        G1.write_grib1([big], (0.0, 0.0, 30.0, 30.0), nbits=16)
