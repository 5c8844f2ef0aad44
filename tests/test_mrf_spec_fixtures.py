"""Hand-assembled MRF (Meta Raster Format) spec fixture.

The MRF pytest matrix verifies the reader against this repo's own
``write_mrf`` — a closed loop (the caveat class VERDICT r8 recorded).
This fixture is assembled by hand from the published MRF layout (XML
metadata + flat ``.idx`` of big-endian (offset, size) u64 pairs in
band-major page order + raw data file) using shapes the own writer
never produces:

- TWO bands (write_mrf emits c=1 only), band-separate pages,
- an EMPTY page (idx size 0 -> the NoData fill, no data read),
- data pages stored OUT OF ORDER in the data file (band 1's pages
  first — only the index indirection can place them),
- custom DataFile / IndexFile names instead of the derived defaults,
- edge pages stored at FULL page size with the reader cropping to the
  raster bounds.

Every expected cell value is derivable from the bytes by the layout
math in the comments.
"""
from __future__ import annotations

import os
import struct
import tempfile

from rasterframes_spark.sources import mrf as M
from rasterframes_spark.sources.rangeio import RangeSource

W, H, PW, PH, BANDS = 5, 3, 3, 2, 2      # 2x2 page grid per band
NODATA = -9


def _page(v0: int) -> bytes:
    """One full 3x2 Int16-LE page: v0, v0+1, ... row-major."""
    return b"".join(struct.pack("<h", v0 + i) for i in range(PW * PH))


def _build(tmp: str) -> str:
    # pages present, in the order they sit in the DATA file (band 1's
    # four pages first, then band 0's — deliberately not index order);
    # band 0 page 1 (top-right) is ABSENT -> empty index record
    vals = {("b0", 0): 100, ("b0", 2): 300, ("b0", 3): 400,
            ("b1", 0): 1000, ("b1", 1): 1100, ("b1", 2): 1200,
            ("b1", 3): 1300}
    order = [("b1", 0), ("b1", 1), ("b1", 2), ("b1", 3),
             ("b0", 0), ("b0", 2), ("b0", 3)]
    data = b""
    offs = {}
    for key in order:
        offs[key] = (len(data), PW * PH * 2)
        data += _page(vals[key])
    # index: one (offset u64, size u64) big-endian pair per page,
    # band-major then row-major: b0 p0..p3, b1 p0..p3
    idx = b"".join(struct.pack(">QQ", *offs.get((b, p), (0, 0)))
                   for b in ("b0", "b1") for p in range(4))
    with open(os.path.join(tmp, "payload.bin"), "wb") as f:
        f.write(data)
    with open(os.path.join(tmp, "tiles.idx"), "wb") as f:
        f.write(idx)
    xml = (f'<MRF_META><Raster>'
           f'<Size x="{W}" y="{H}" c="{BANDS}"/>'
           f'<PageSize x="{PW}" y="{PH}" c="1"/>'
           f'<Compression>NONE</Compression>'
           f'<DataType>Int16</DataType>'
           f'<DataValues NoData="{NODATA}"/>'
           f'<DataFile>payload.bin</DataFile>'
           f'<IndexFile>tiles.idx</IndexFile>'
           f'</Raster><GeoTags>'
           f'<BoundingBox minx="0" miny="0" maxx="5" maxy="3"/>'
           f'<Projection>epsg:32617</Projection>'
           f'</GeoTags></MRF_META>')
    path = os.path.join(tmp, "fix.mrf")
    with open(path, "w") as f:
        f.write(xml)
    return path


def test_hand_assembled_mrf_decodes():
    tmp = tempfile.mkdtemp(prefix="mrf_fix_")
    src = RangeSource(_build(tmp))
    info = M.read_info(src)
    assert (info.width, info.height) == (W, H)
    a0 = M.read_window(src, info, 0, 0, W, H, band=0)
    a1 = M.read_window(src, info, 0, 0, W, H, band=1)
    # band 0: page (row0, col0) = 100.. (3 wide, 2 tall); page (row0,
    # col1) EMPTY -> NoData; page (row1, col0) = 300..; (row1, col1)
    # = 400.. cropped to the last raster row / 2 columns
    assert a0.tolist() == [
        [100, 101, 102, NODATA, NODATA],
        [103, 104, 105, NODATA, NODATA],
        [300, 301, 302, 400, 401]]
    # band 1: all four pages present; page rows are PW=3 wide, so the
    # second visible row of the top-right page starts at v0 + 3
    assert a1.tolist() == [
        [1000, 1001, 1002, 1100, 1101],
        [1003, 1004, 1005, 1103, 1104],
        [1200, 1201, 1202, 1300, 1301]]
    # windowed read touching only the empty page: pure NoData fill
    a_empty = M.read_window(src, info, 3, 0, 2, 2, band=0)
    assert a_empty.tolist() == [[NODATA, NODATA], [NODATA, NODATA]]
