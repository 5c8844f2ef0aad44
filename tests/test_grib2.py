"""GRIB2 source: spec-math fixtures + writer round-trip + dispatch.

Discipline matches the r8/r9 container fixtures (MP4/WebM/NetCDF/MRF/
HDF5/WARC): the positive fixtures are HAND-ASSEMBLED from the public
WMO FM 92 GRIB Edition 2 spec with the expected values derived by hand
from the packing equation Y = (R + X*2^E) / 10^D — they share no
structure with the production writer (sections are built by a local
helper, signed fields are composed with explicit sign-bit arithmetic,
the packed payload is a literal byte string worked out on paper).
Negative controls pin the strict-parse posture: truncation, missing
7777, wrong edition, unsupported templates, bit-map count mismatch.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from rasterframes_spark.sources import grib2 as GB


def S(num: int, body: bytes) -> bytes:
    """Section framing: length(4) | number(1) | body."""
    return struct.pack(">IB", 5 + len(body), num) + body


def SEC1() -> bytes:
    # octets 6-21: centre/subcentre/tables/time — content irrelevant
    return S(1, struct.pack(">HHBBBHBBBBBBB",
                            7, 0, 2, 1, 1, 2026, 3, 4, 12, 0, 0, 0, 1))


def SEC3(ni, nj, la1, lo1, la2, lo2, di, dj, scan) -> bytes:
    """Template 3.0, all angles in whole microdegrees. Negative
    latitudes are encoded sign-and-magnitude BY HAND here (MSB |
    magnitude) — independent of the production _pack_sm."""
    def sm4(v):
        return ((0x80000000 | -v) if v < 0 else v).to_bytes(4, "big")

    body = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 0)     # octets 6-14
    body += bytes([6]) + b"\x00" * 5 + b"\xff" * 10       # 15-30 earth
    body += struct.pack(">II", ni, nj)                    # 31-38
    body += struct.pack(">II", 0, 0)                      # 39-46
    body += sm4(la1) + struct.pack(">I", lo1)             # 47-54
    body += bytes([0x30])                                 # 55
    body += sm4(la2) + struct.pack(">I", lo2)             # 56-63
    body += struct.pack(">II", di, dj)                    # 64-71
    body += bytes([scan])                                 # 72
    return S(3, body)


def SEC4(cat=0, num=0) -> bytes:
    body = struct.pack(">HH", 0, 0) + bytes(
        [cat, num, 0, 0, 0, 0, 0, 0, 1]) + struct.pack(">I", 0) \
        + bytes([1, 0]) + struct.pack(">I", 0) \
        + bytes([255, 255]) + b"\xff\xff\xff\xff"
    return S(4, body)


def SEC5(npacked, r, e, d, nbits) -> bytes:
    def sm2(v):
        return ((0x8000 | -v) if v < 0 else v).to_bytes(2, "big")

    return S(5, struct.pack(">IH", npacked, 0) + struct.pack(">f", r)
             + sm2(e) + sm2(d) + bytes([nbits, 0]))


def MSG(*sections, discipline=0, edition=2) -> bytes:
    body = b"".join(sections) + b"7777"
    return (b"GRIB\x00\x00" + bytes([discipline, edition])
            + struct.pack(">Q", 16 + len(body)) + body)


# the shared 3x2 payload: X = [1,2,3,4,5,0] at nbits=4, packed MSB-first
# by hand -> 0001 0010 | 0011 0100 | 0101 0000
PACKED = bytes([0x12, 0x34, 0x50])
# R=100.0, E=1, D=1 -> Y = (100 + 2X)/10
Y_ROW0 = [10.2, 10.4, 10.6]
Y_ROW1 = [10.8, 11.0, 10.0]


def test_hand_assembled_simple_packing():
    """Baseline: north-first scan (0x00), no bit-map. Y worked out by
    hand from the packing equation."""
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(2, 5), SEC5(6, 100.0, 1, 1, 4), S(6, b"\xff"),
              S(7, PACKED))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(f["values"], [Y_ROW0, Y_ROW1], rtol=1e-12)
    assert (f["param_category"], f["param_number"]) == (2, 5)
    # cell-edge extent: centers 10..30 E / 50..60 N, 10-degree cells
    assert GB._grid_extent(f["grid"]) == (5.0, 45.0, 35.0, 65.0)


def test_hand_assembled_negative_coords_and_scale():
    """Sign-and-magnitude pins: La1 = -10.5 deg and E = -1 (0x8001).
    Y = (100 + X/2)/10."""
    msg = MSG(SEC1(),
              SEC3(3, 2, -10_500_000, 200_000_000, -20_500_000,
                   220_000_000, 10_000_000, 10_000_000, 0x00),
              SEC4(), SEC5(6, 100.0, -1, 1, 4), S(6, b"\xff"),
              S(7, PACKED))
    (f,) = GB.parse_grib2(msg)
    exp = (100.0 + np.array([[1, 2, 3], [4, 5, 0]]) * 0.5) / 10.0
    np.testing.assert_allclose(f["values"], exp, rtol=1e-12)
    # grid entirely west of the antimeridian (200E..220E) shifts -360:
    # centers -160..-140, rows -10.5 down to -20.5
    assert GB._grid_extent(f["grid"]) == (-165.0, -25.5, -135.0, -5.5)


def test_hand_assembled_scan_flags():
    """0x40 (+j: rows south->north) flips vertically; 0x80 (-i) flips
    horizontally. Same packed bytes, different geometry."""
    up = MSG(SEC1(),
             SEC3(3, 2, 50_000_000, 10_000_000, 60_000_000, 30_000_000,
                  10_000_000, 10_000_000, 0x40),
             SEC4(), SEC5(6, 100.0, 1, 1, 4), S(6, b"\xff"), S(7, PACKED))
    (f,) = GB.parse_grib2(up)
    np.testing.assert_allclose(f["values"], [Y_ROW1, Y_ROW0], rtol=1e-12)
    rl = MSG(SEC1(),
             SEC3(3, 2, 60_000_000, 30_000_000, 50_000_000, 10_000_000,
                  10_000_000, 10_000_000, 0x80),
             SEC4(), SEC5(6, 100.0, 1, 1, 4), S(6, b"\xff"), S(7, PACKED))
    (f,) = GB.parse_grib2(rl)
    np.testing.assert_allclose(
        f["values"], [Y_ROW0[::-1], Y_ROW1[::-1]], rtol=1e-12)


def test_hand_assembled_bitmap_and_constant():
    """Bit-map 101101 (byte 0xB4): 4 packed values scatter to positions
    0,2,3,5; positions 1 and 4 are NaN. Constant field: nbits=0 ->
    every point R/10^D."""
    bm = MSG(SEC1(),
             SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                  10_000_000, 10_000_000, 0x00),
             SEC4(), SEC5(4, 100.0, 1, 1, 4), S(6, b"\x00\xb4"),
             S(7, bytes([0x12, 0x34])))
    (f,) = GB.parse_grib2(bm)
    v = f["values"].ravel()
    np.testing.assert_allclose(v[[0, 2, 3, 5]],
                               [10.2, 10.4, 10.6, 10.8], rtol=1e-12)
    assert np.isnan(v[[1, 4]]).all()
    const = MSG(SEC1(),
                SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                     10_000_000, 10_000_000, 0x00),
                SEC4(), SEC5(6, 100.0, 0, 1, 0), S(6, b"\xff"), S(7, b""))
    (f,) = GB.parse_grib2(const)
    np.testing.assert_allclose(f["values"], np.full((2, 3), 10.0))


def test_hand_assembled_non_byte_aligned_bits():
    """nbits=6, 6 values -> 36 bits, 4.5 bytes padded to 5: X =
    [10, 20, 30, 40, 50, 63] packed by hand:
    001010 010100 011110 101000 110010 111111 + 4 pad bits."""
    bits = "001010010100011110101000110010111111" + "0000"
    payload = bytes(int(bits[i:i + 8], 2) for i in range(0, 40, 8))
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(), SEC5(6, 0.0, 0, 0, 6), S(6, b"\xff"), S(7, payload))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(
        f["values"], [[10.0, 20.0, 30.0], [40.0, 50.0, 63.0]])


def test_negative_controls_strict_parse():
    good = MSG(SEC1(),
               SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                    10_000_000, 10_000_000, 0x00),
               SEC4(), SEC5(6, 100.0, 1, 1, 4), S(6, b"\xff"), S(7, PACKED))
    GB.parse_grib2(good)
    # edition 1
    with pytest.raises(ValueError, match="edition"):
        GB.parse_grib2(good[:7] + b"\x01" + good[8:])
    # truncated: total length says more than the stream has
    with pytest.raises(ValueError, match="past end"):
        GB.parse_grib2(good[:-10])
    # missing terminator: replace 7777 with section-like garbage
    with pytest.raises(ValueError):
        GB.parse_grib2(good[:-4] + b"\x00\x00\x00\x00")
    # unsupported grid template 3.1
    bad3 = bytearray(good)
    o3 = 16 + len(SEC1())
    bad3[o3 + 13] = 1               # template low byte at octet 14
    with pytest.raises(NotImplementedError, match="3.1"):
        GB.parse_grib2(bytes(bad3))
    # unsupported DRS template 5.2 (complex packing)
    bad5 = bytearray(good)
    o5 = 16 + len(SEC1()) + len(
        SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
             10_000_000, 10_000_000, 0x00)) + len(SEC4())
    assert bad5[o5 + 4] == 5
    bad5[o5 + 10] = 2               # template low byte at octet 11
    with pytest.raises(NotImplementedError, match="5.2"):
        GB.parse_grib2(bytes(bad5))
    # column-major scanning rejected
    with pytest.raises(NotImplementedError, match="0x20"):
        GB.parse_grib2(MSG(
            SEC1(), SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000,
                         30_000_000, 10_000_000, 10_000_000, 0x20),
            SEC4(), SEC5(6, 100.0, 1, 1, 4), S(6, b"\xff"), S(7, PACKED)))
    # bit-map bits set != packed count
    with pytest.raises(ValueError, match="bit-map"):
        GB.parse_grib2(MSG(
            SEC1(), SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000,
                         30_000_000, 10_000_000, 10_000_000, 0x00),
            SEC4(), SEC5(3, 100.0, 1, 1, 4), S(6, b"\x00\xb4"),
            S(7, bytes([0x12, 0x34]))))


def test_writer_roundtrip_exact_and_lossy():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 60000, (17, 23)).astype("f8")
    b = rng.integers(-500, 500, (17, 23)).astype("f8")
    b[0, 0] = np.nan
    data = GB.write_grib2([a, b], extent=(-10.0, 35.0, 13.0, 52.0),
                          params=[(0, 0), (2, 2)])
    fa, fb = GB.parse_grib2(data)
    np.testing.assert_array_equal(fa["values"], a)
    assert np.isnan(fb["values"][0, 0])
    m = np.isfinite(b)
    np.testing.assert_array_equal(fb["values"][m], b[m])
    assert GB._grid_extent(fa["grid"]) == pytest.approx(
        (-10.0, 35.0, 13.0, 52.0), abs=1e-9)
    # lossy: quantization bounded by 2^(E-1)/10^D
    f = rng.uniform(95000.0, 105000.0, (31, 19))
    enc = GB.write_grib2([f], extent=(0, 0, 19, 31), nbits=14, dscale=1)
    dec = GB.parse_grib2(enc)[0]["values"]
    rngv = (f.max() - f.min()) * 10
    e = 0
    while rngv / 2 ** e > (1 << 14) - 1:
        e += 1
    assert np.abs(dec - f).max() <= (2.0 ** (e - 1)) / 10 + 1e-6


def test_read_raster_dispatch_end_to_end(spark, tmp_path):
    """write_grib2 -> read_raster format dispatch: chunked tiles,
    extent math, NaN nodata, multi-band (= multi-message)."""
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark.sources import read_raster, realize_tiles

    ny, nx = 48, 72
    ii, jj = np.mgrid[0:ny, 0:nx]
    g0 = ((ii * 31 + jj * 7) % 97).astype("f8")
    g1 = ((ii + jj) % 13).astype("f8")
    path = str(tmp_path / "t.grib2")
    with open(path, "wb") as fh:
        fh.write(GB.write_grib2([g0, g1], extent=(-120.0, 10.0, -48.0, 58.0)))

    df = read_raster(spark, [path], tile_dimensions=(32, 32),
                     band_indexes=[0, 1])
    rows = (df.select(rf.rf_tile_sum(realize_tiles("tile_b0")).alias("s0"),
                      rf.rf_tile_sum(realize_tiles("tile_b1")).alias("s1"),
                      "extent").collect())
    assert len(rows) == 2 * 3                     # 2x3 chunk grid
    assert sum(r.s0 for r in rows) == pytest.approx(float(g0.sum()))
    assert sum(r.s1 for r in rows) == pytest.approx(float(g1.sum()))
    assert min(r.extent.xmin for r in rows) == pytest.approx(-120.0)
    assert max(r.extent.ymax for r in rows) == pytest.approx(58.0)

    # differing grids in one file are refused (read per message
    # instead); module-level because the dispatch chain treats any
    # reader ValueError as "not this format, try the next"
    mixed = GB.write_grib2([g0], extent=(-120.0, 10.0, -48.0, 58.0)) \
        + GB.write_grib2([g1[:24]], extent=(0.0, 0.0, 72.0, 24.0))
    with pytest.raises(ValueError, match="differing grids"):
        GB.read_info(mixed)
