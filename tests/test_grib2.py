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
    # unsupported DRS template 5.4 (IEEE floating point; 5.2 went
    # native in r10 so the control moved to a still-unsupported code)
    bad5 = bytearray(good)
    o5 = 16 + len(SEC1()) + len(
        SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
             10_000_000, 10_000_000, 0x00)) + len(SEC4())
    assert bad5[o5 + 4] == 5
    bad5[o5 + 10] = 4               # template low byte at octet 11
    with pytest.raises(NotImplementedError, match="5.4"):
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


# ---------------------------------------------------------------------------
# r10: complex packing (5.2), spatial differencing (5.3), packed-image
# templates (5.40 JPEG2000 / 5.41 PNG).  Same discipline as above: the
# 5.2/5.3 fixtures are hand-assembled — group reference/width/length
# sequences and the per-group value bitstream are literal bytes worked
# out on paper from WMO templates 7.2/7.3, and the spatial-differencing
# reconstruction (g2lib comunpack order: overwrite the first `order`
# values with the transmitted originals, add the minimum to the rest,
# integrate) is hand-walked in the comments.  The 5.41 PNG wrapper is
# hand-built from the PNG spec with stdlib zlib only; 5.40 wraps a
# codestream from the repo's own externally-validated (Kakadu fixture)
# JP2 encoder — there the GRIB layer under test is the DRS parse + Y
# formula, not the codec.
# ---------------------------------------------------------------------------


def SEC5_complex(npacked, r, e, d, nbits, mgmt, ng, wref, wbits,
                 lref, linc, last_len, lbits, order=None, n8=None):
    """Template 5.2 (or 5.3 when order/n8 given), octets laid out by
    hand per the WMO template table."""
    def sm2(v):
        return ((0x8000 | -v) if v < 0 else v).to_bytes(2, "big")

    body = struct.pack(">IH", npacked, 3 if order is not None else 2)
    body += struct.pack(">f", r) + sm2(e) + sm2(d)
    body += bytes([nbits, 0, 1, mgmt])         # 20 nbits, 21 type,
    body += b"\x00" * 8                        # 22 split, 23 mgmt,
    body += struct.pack(">I", ng)              # 24-31 substitutes
    body += bytes([wref, wbits])
    body += struct.pack(">I", lref) + bytes([linc])
    body += struct.pack(">I", last_len) + bytes([lbits])
    if order is not None:
        body += bytes([order, n8])
    return S(5, body)


def test_hand_assembled_complex_packing_with_missing():
    """Template 5.2, mgmt=1.  NG=2 groups over 6 points:
    group 1 ref=2 width=2 len=4, rel=[0,1,3,2] -> X=[2,3,MISSING,4]
    (all-ones in a 2-bit group = primary missing); group 2 ref=5
    width=0 len=2 -> both = 5.  Hand-packed sequences at nbits=4,
    wbits=3, lbits=3:
      refs  [2,5]  -> 0010 0101               = 0x25
      widths[2,0]  -> 010 000 + pad           = 0x40
      lens  [4,2]  -> 100 010 + pad           = 0x88
      values 00 01 11 10                      = 0x1E
    R=0, E=0, D=0 -> Y = X."""
    payload = bytes([0x25, 0x40, 0x88, 0x1E])
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_complex(6, 0.0, 0, 0, 4, 1, 2, 0, 3, 0, 1, 2, 3),
              S(6, b"\xff"), S(7, payload))
    (f,) = GB.parse_grib2(msg)
    exp = np.array([[2.0, 3.0, np.nan], [4.0, 5.0, 5.0]])
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(exp))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(exp), rtol=0, atol=0)


def test_hand_assembled_complex_zero_width_all_missing_group():
    """mgmt=1, width-0 group whose REFERENCE is all-ones in nbits=4
    (15) -> the whole group is missing (template 7.2 note 2)."""
    # refs [2,15] -> 0x2F; widths [2,0] -> 0x40; lens [4,2] -> 0x88;
    # group-1 rel [0,1,2,2] -> 00 01 10 10 = 0x1A
    payload = bytes([0x2F, 0x40, 0x88, 0x1A])
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_complex(6, 0.0, 0, 0, 4, 1, 2, 0, 3, 0, 1, 2, 3),
              S(6, b"\xff"), S(7, payload))
    (f,) = GB.parse_grib2(msg)
    exp = np.array([[2.0, 3.0, 4.0], [4.0, np.nan, np.nan]])
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(exp))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(exp))


def test_hand_assembled_spatial_differencing_second_order():
    """Template 5.3, order 2, extra_octets=1.  Originals X =
    [10,12,15,19,24,30]: second differences [1,1,1,1], minimum 1, so
    every transmitted value is 0 — one group, ref 0, width 0.
    Descriptors by hand: ival1=10 (0x0A), ival2=12 (0x0C), gmin=1
    (0x01).  refs [0] at nbits=1 -> 0x00; widths [0] at wbits=1 ->
    0x00; lens [6] at lbits=3 -> 110+pad = 0xC0.  D=1 -> Y = X/10."""
    payload = bytes([0x0A, 0x0C, 0x01, 0x00, 0x00, 0xC0])
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_complex(6, 0.0, 0, 1, 1, 0, 1, 0, 1, 0, 1, 6, 3,
                           order=2, n8=1),
              S(6, b"\xff"), S(7, payload))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(
        f["values"], [[1.0, 1.2, 1.5], [1.9, 2.4, 3.0]], rtol=1e-12)


def test_hand_assembled_spatial_differencing_first_order_negative_min():
    """Order 1 with a NEGATIVE difference minimum (sign-and-magnitude
    0x81 = -1).  X = [7,9,8,13,13,20]; first differences [2,-1,5,0,7];
    gmin=-1 -> transmitted [0, 3,0,6,1,8] (position 0 packs as 0 and is
    overwritten by ival1=7 on decode).  One group ref=0 width=4:
    values 0000 0011 0000 0110 0001 1000 -> 0x03 0x06 0x18; widths [4]
    at wbits=3 -> 0x80; lens [6] at lbits=3 -> 0xC0."""
    payload = bytes([0x07, 0x81, 0x00, 0x80, 0xC0, 0x03, 0x06, 0x18])
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_complex(6, 0.0, 0, 0, 1, 0, 1, 0, 3, 0, 1, 6, 3,
                           order=1, n8=1),
              S(6, b"\xff"), S(7, payload))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(
        f["values"], [[7.0, 9.0, 8.0], [13.0, 13.0, 20.0]], rtol=0)


def SEC5_image(npacked, r, e, d, nbits, tmpl) -> bytes:
    def sm2(v):
        return ((0x8000 | -v) if v < 0 else v).to_bytes(2, "big")

    body = struct.pack(">IH", npacked, tmpl) + struct.pack(">f", r) \
        + sm2(e) + sm2(d) + bytes([nbits, 0])
    if tmpl == 40:
        body += bytes([0, 255])     # lossless, target ratio missing
    return S(5, body)


def _hand_png_gray8(rows) -> bytes:
    """Minimal 8-bit grayscale PNG assembled from the spec with stdlib
    zlib/crc32 only — independent of sources/png.py's encoder."""
    import binascii
    import zlib

    h, w = len(rows), len(rows[0])

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data \
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_hand_assembled_png_packing():
    """Template 5.41 over a hand-built PNG of X=[1,2,3,4,5,0]; the same
    R=100/E=1/D=1 equation as the simple-packing baseline fixture."""
    png = _hand_png_gray8([[1, 2, 3], [4, 5, 0]])
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_image(6, 100.0, 1, 1, 8, 41),
              S(6, b"\xff"), S(7, png))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(f["values"], [Y_ROW0, Y_ROW1], rtol=1e-12)


def test_jpeg2000_packing_via_own_codec():
    """Template 5.40: the payload is a raw codestream from the repo's
    JP2 encoder (externally validated against Kakadu elsewhere); the
    GRIB layer under test is the DRS parse + Y formula + the NCEP
    1 x npacked bit-mapped shape."""
    from rasterframes_spark.sources.jp2 import encode_jp2

    x = np.array([[1, 2, 3], [4, 5, 0]], dtype=np.int32)
    cs = encode_jp2(x, depth=4, signed=False, levels=0)
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_image(6, 100.0, 1, 1, 4, 40),
              S(6, b"\xff"), S(7, cs))
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_allclose(f["values"], [Y_ROW0, Y_ROW1], rtol=1e-12)
    # bit-mapped: packed points as a 1 x npacked image (NCEP shape)
    cs1 = encode_jp2(np.array([[1, 2, 3, 5]], dtype=np.int32),
                     depth=4, signed=False, levels=0)
    bmp = np.packbits([1, 1, 0, 1, 0, 1]).tobytes()
    msg = MSG(SEC1(),
              SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                   10_000_000, 10_000_000, 0x00),
              SEC4(),
              SEC5_image(4, 0.0, 0, 0, 4, 40),
              S(6, b"\x00" + bmp), S(7, cs1))
    (f,) = GB.parse_grib2(msg)
    exp = np.array([[1.0, 2.0, np.nan], [3.0, np.nan, 5.0]])
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(exp))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(exp))


def test_complex_negative_controls():
    sec3 = SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                10_000_000, 10_000_000, 0x00)
    ok_payload = bytes([0x25, 0x40, 0x88, 0x1E])

    def msg(sec5, payload=ok_payload):
        return MSG(SEC1(), sec3, SEC4(), sec5, S(6, b"\xff"),
                   S(7, payload))

    # group lengths don't sum to npacked (last_len lies)
    with pytest.raises(ValueError, match="group lengths sum"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 1, 2, 0, 3,
                                        0, 1, 3, 3)))
    # value bitstream shorter than the declared widths require
    with pytest.raises(ValueError, match="group widths require"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 1, 2, 0, 3,
                                        0, 1, 2, 3),
                           payload=bytes([0x25, 0xFF, 0x88])))
    # missing-value management out of spec range
    with pytest.raises(ValueError, match="missing-value management"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 3, 2, 0, 3,
                                        0, 1, 2, 3)))
    # spatial differencing + embedded missing: documented hatch
    with pytest.raises(NotImplementedError, match="spatial differencing"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 1, 2, 0, 3,
                                        0, 1, 2, 3, order=2, n8=1)))
    # extra-descriptor octet count outside 1..4
    with pytest.raises(ValueError, match="extra-descriptor"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 0, 2, 0, 3,
                                        0, 1, 2, 3, order=2, n8=0)))
    # differencing order outside 1..2
    with pytest.raises(ValueError, match="differencing order"):
        GB.parse_grib2(msg(SEC5_complex(6, 0.0, 0, 0, 4, 0, 2, 0, 3,
                                        0, 1, 2, 3, order=3, n8=1)))
    # unsupported representation template still routes to the hatch
    with pytest.raises(NotImplementedError, match=r"template 5\.1"):
        bad = struct.pack(">IH", 6, 1) + struct.pack(">f", 0.0) \
            + b"\x00\x00\x00\x00" + bytes([4, 0])
        GB.parse_grib2(MSG(SEC1(), sec3, SEC4(), S(5, bad),
                           S(6, b"\xff"), S(7, ok_payload)))
    # packed image whose pixel count contradicts the DRS
    png = _hand_png_gray8([[1, 2, 3]])
    with pytest.raises(ValueError, match="DRS declares"):
        GB.parse_grib2(MSG(SEC1(), sec3, SEC4(),
                           SEC5_image(6, 0.0, 0, 0, 8, 41),
                           S(6, b"\xff"), S(7, png)))


@pytest.mark.parametrize("packing", ["complex", "complex_diff",
                                     "jpeg2000", "png"])
def test_writer_roundtrip_new_packings(packing):
    """Every non-simple packing mode round-trips bit-exactly for
    integer fields (incl. NaN bit-maps and negatives) and within the
    quantization bound for floats — cross-checked against the simple
    packing of the same field."""
    rng = np.random.default_rng(11)
    ext = (-110.0, 30.0, -93.0, 43.0)
    a = rng.integers(-500, 4000, size=(13, 17)).astype("float64")
    a[3, 4] = np.nan
    a[0, 0] = np.nan
    b = GB.write_grib2([a], ext, nbits=16, packing=packing)
    (f,) = GB.parse_grib2(b)
    np.testing.assert_array_equal(np.isnan(f["values"]), np.isnan(a))
    np.testing.assert_allclose(np.nan_to_num(f["values"]),
                               np.nan_to_num(a), rtol=0, atol=0)
    # identical to the simple-packing decode of the same field
    (fs,) = GB.parse_grib2(GB.write_grib2([a], ext, nbits=16))
    np.testing.assert_array_equal(
        np.nan_to_num(f["values"]), np.nan_to_num(fs["values"]))
    # float field: quantization bound 2**(E-1)/10**dscale
    g = rng.normal(20.0, 5.0, size=(16, 16))
    b = GB.write_grib2([g], ext, nbits=14, dscale=2, packing=packing)
    (f,) = GB.parse_grib2(b)
    assert float(np.abs(f["values"] - g).max()) <= 0.005
    # 24-bit scaled range exercises the RGB-byte PNG path
    big = rng.integers(0, 1 << 22, size=(9, 11)).astype("float64")
    b = GB.write_grib2([big], ext, nbits=24, packing=packing)
    (f,) = GB.parse_grib2(b)
    np.testing.assert_array_equal(f["values"], big)


def test_writer_complex_grouping_edge_cases():
    ext = (0.0, 0.0, 8.0, 6.0)
    # constant field -> zero-width groups
    c = np.full((6, 8), 42.0)
    for packing in ("complex", "complex_diff"):
        (f,) = GB.parse_grib2(GB.write_grib2([c], ext, nbits=12,
                                             packing=packing))
        np.testing.assert_array_equal(f["values"], c)
    # group_len larger than the field and group_len=1
    a = np.arange(48, dtype="float64").reshape(6, 8)
    for gl in (1, 7, 500):
        (f,) = GB.parse_grib2(GB.write_grib2([a], ext, nbits=8,
                                             packing="complex",
                                             group_len=gl))
        np.testing.assert_array_equal(f["values"], a)


def test_truncated_sections_raise_not_zero_fill():
    """code-review r10 #3/#4: short section 3/6 bodies must raise a
    ValueError (which the format dispatch treats as 'not this
    format'), never parse int.from_bytes on empty slices into silent
    zero grids or crash with IndexError."""
    sec3 = SEC3(3, 2, 60_000_000, 10_000_000, 50_000_000, 30_000_000,
                10_000_000, 10_000_000, 0x00)
    good = MSG(SEC1(), sec3, SEC4(), SEC5(6, 100.0, 1, 1, 4),
               S(6, b"\xff"), S(7, PACKED))
    GB.parse_grib2(good)
    # truncate section 3 to 50 bytes (after Nj): must raise, not
    # yield di=dj=0
    trunc3 = sec3[:5 + 45]
    trunc3 = struct.pack(">IB", len(trunc3), 3) + trunc3[5:]
    with pytest.raises(ValueError, match="truncated"):
        GB.parse_grib2(MSG(SEC1(), trunc3, SEC4(), SEC5(6, 100.0, 1, 1, 4),
                           S(6, b"\xff"), S(7, PACKED)))
    # header-only bit-map section (slen=5): ValueError, not IndexError
    with pytest.raises(ValueError, match="bit-map section too short"):
        GB.parse_grib2(MSG(SEC1(), sec3, SEC4(), SEC5(6, 100.0, 1, 1, 4),
                           S(6, b""), S(7, PACKED)))
    # complex-packing width/length descriptors over 32 bits: reject
    # (int64 shift weights silently overflow past 63)
    with pytest.raises(ValueError, match="over 32 bits"):
        GB.parse_grib2(MSG(SEC1(), sec3, SEC4(),
                           SEC5_complex(6, 0.0, 0, 0, 4, 0, 2, 0, 99,
                                        0, 1, 2, 3),
                           S(6, b"\xff"), S(7, bytes(8))))


def test_mutation_fuzz_never_wrong_exception():
    """Corrupted inputs surface as ValueError / NotImplementedError
    (the format-dispatch contract: 'not this format, try the next'),
    never IndexError / struct.error / OverflowError / hangs — the
    exception class a truncated section 3/6 used to leak (code-review
    r10 #3/#4).  Byte flips + truncations over every packing and both
    editions."""
    from rasterframes_spark.sources import grib1 as G1

    rng = np.random.default_rng(99)
    a = rng.integers(0, 900, size=(6, 9)).astype("float64")
    a[2, 3] = np.nan
    ext = (-108.0, 30.0, -99.0, 36.0)
    streams = [GB.write_grib2([a], ext, packing=p)
               for p in ("simple", "complex", "complex_diff",
                         "jpeg2000", "png")]
    streams.append(G1.write_grib1([a], ext))
    for si, good in enumerate(streams):
        parse = G1.parse_grib1 if si == len(streams) - 1 \
            else GB.parse_grib2
        for trial in range(400):
            b = bytearray(good)
            for _ in range(rng.integers(1, 4)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                parse(bytes(b))
            except (ValueError, NotImplementedError):
                pass                # the contract
            except MemoryError:
                pass                # absurd declared sizes; bounded
        for cut in rng.integers(1, len(good), size=60):
            try:
                parse(good[:int(cut)])
            except (ValueError, NotImplementedError):
                pass


def test_write_complex_diff_degenerate_fields():
    """ADVICE r10 #3: complex_diff used to raise for fields with fewer
    finite points than the differencing order needs (including all-NaN
    fields) while every other packing encoded them via the bitmap
    path.  Degenerate fields now fall back to order-0 complex packing
    and round-trip like the rest."""
    all_nan = np.full((6, 8), np.nan)
    two_pts = np.full((6, 8), np.nan)
    two_pts[0, 0], two_pts[3, 4] = 7.0, 11.0
    ext = (0.0, 0.0, 8.0, 6.0)
    for a in (all_nan, two_pts):
        (f,) = GB.parse_grib2(GB.write_grib2([a], ext,
                                             packing="complex_diff"))
        np.testing.assert_array_equal(f["values"], a)
    # non-degenerate fields still use true 5.3 spatial differencing
    dense = np.arange(48, dtype="f8").reshape(6, 8)
    msg = GB.write_grib2([dense], ext, packing="complex_diff")
    metas = GB.scan_grib2(GB._BytesSrc(msg))
    assert metas[0]["drs"]["tmpl"] == 3
    (f,) = GB.parse_grib2(msg)
    np.testing.assert_array_equal(f["values"], dense)


def test_pdt_parameter_octets_shared_by_templates_0_to_15():
    """Product definition templates 4.0-4.15 all lead with parameter
    category (octet 10) / number (octet 11) — each extends the
    previous template's octets — so a 4.8 statistical/accumulated
    field (the NCEP APCP shape) must surface its parameter ids, while
    an out-of-family template (4.20 radar) stays (255, 255)."""
    base = GB.write_grib2([np.arange(6, dtype="f8").reshape(2, 3)],
                          (0.0, 0.0, 3.0, 2.0), params=[(1, 8)])
    def with_pdt(tmpl):
        buf = bytearray(base)
        p = 16
        while True:
            slen = int.from_bytes(buf[p:p+4], "big")
            if buf[p+4] == 4:
                buf[p+7:p+9] = tmpl.to_bytes(2, "big")
                return bytes(buf)
            p += slen
    for tmpl in (1, 8, 15):
        (f,) = GB.parse_grib2(with_pdt(tmpl))
        assert (f["param_category"], f["param_number"]) == (1, 8), tmpl
    (f,) = GB.parse_grib2(with_pdt(20))
    assert (f["param_category"], f["param_number"]) == (255, 255)


def test_window_out_of_range_raises(tmp_path):
    """ADVICE r11 #3: the row-window fast path computes stored-row bit
    offsets from (r0, h) — out of range with scan flag 0x40 they would
    go NEGATIVE and slice garbage.  The public read_window surface must
    raise on any out-of-range window or band, for every scan flag and
    on both the fast and the eager decode path."""
    from rasterframes_spark.sources.rangeio import RangeSource

    a = np.arange(16 * 10, dtype="f8").reshape(16, 10)
    # scan 0x40 (south->north rows) is the sign-flip case
    data = GB.write_grib2([a], extent=(0.0, 0.0, 10.0, 16.0))
    p = tmp_path / "w.grib2"
    p.write_bytes(data)
    src = RangeSource(str(p))
    info = GB.read_info(src)
    ok = GB.read_window(src, info, 1, 2, 4, 5)
    assert ok.shape == (5, 4)
    for c0, r0, w, h in ((0, 14, 4, 4), (8, 0, 4, 4), (-1, 0, 2, 2),
                         (0, -2, 2, 2), (0, 0, 0, 3), (3, 3, 3, 0),
                         (0, 0, 10, 17)):
        with pytest.raises(IndexError):
            GB.read_window(src, info, c0, r0, w, h)
    with pytest.raises(IndexError):
        GB.read_window(src, info, 0, 0, 2, 2, band=1)
    with pytest.raises(IndexError):
        GB.read_window(src, info, 0, 0, 2, 2, band=-1)
