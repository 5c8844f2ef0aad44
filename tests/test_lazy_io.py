"""Laziness as I/O pruning — ASSERTED, not assumed (VERDICT r6 #9).

The core invariant inherited from the reference (ref/RasterRef.scala:
49-64): `read_raster` rows are lazy refs, so a query that never
realizes a tile must fetch ZERO window bytes, and AOI pruning must
shrink the fetch set proportionally.  The rangeio trace hook records
every actual fetch from the executor workers onto a shared-FS file,
so these tests measure the I/O instead of trusting the plan shape.
"""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasterframes_spark import sources as S
from rasterframes_spark.sources import geotiff as GT


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lazyio")
    rng = np.random.default_rng(5)
    for name in ("a", "b"):
        arr = rng.integers(0, 999, (64, 64)).astype("uint16")
        with open(root / f"{name}.tif", "wb") as f:
            f.write(GT.write_geotiff(arr, (0.0, 0.0, 64.0, 64.0),
                                     "EPSG:32618", tile_size=16))
    return str(root)


def _catalog(scene_dir):
    return [f"{scene_dir}/a.tif", f"{scene_dir}/b.tif"]


def _trace_lines(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [ln for ln in f.read().splitlines() if ln]


def test_metadata_only_query_reads_zero_window_bytes(spark, scene_dir,
                                                     tmp_path):
    trace = str(tmp_path / "trace0")
    df = S.read_raster(spark, _catalog(scene_dir), tile_dimensions=(16, 16))
    # the trace hook lives in realize_tiles; a metadata-only query never
    # builds that column, so ALSO wire a realized column with the trace
    # and then don't select it — column pruning must keep the UDF out of
    # the executed plan entirely
    df = df.withColumn("tile", S.realize_tiles("tile_ref", io_trace=trace))
    meta = df.select("extent", "crs", F.col("tile_ref.col_off"))
    assert meta.count() == 2 * 16  # 4x4 chunk grid per scene
    # extent/crs/ref fields came from the chunk grid (header reads only):
    # zero window fetches happened
    assert _trace_lines(trace) == []
    # the realized column DOES fetch when actually selected
    df.select("tile").collect()
    n_full = len(_trace_lines(trace))
    assert n_full > 0


def test_aoi_pruning_shrinks_fetch_set(spark, tmp_path):
    """Executor range sources are LRU-cached per URI with a 256 KiB
    block cache, so the two measurements use distinct URI copies of a
    2 MiB scene (64 LZW tiles spanning ~25 blocks) — block-level
    fetch BYTES then reflect exactly which windows were read."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 999, (2048, 2048)).astype("uint16")
    payload = GT.write_geotiff(arr, (0.0, 0.0, 2048.0, 2048.0),
                               "EPSG:32618", tile_size=256)
    for name in ("full.tif", "aoi.tif"):
        with open(tmp_path / name, "wb") as f:
            f.write(payload)

    def fetched_bytes(uri, trace, query_extent=None):
        df = S.read_raster(spark, [uri], tile_dimensions=(256, 256),
                           query_extent=query_extent)
        df.select(S.realize_tiles("tile_ref", io_trace=trace)
                  .alias("t")).collect()
        return sum(int(ln.split("\t")[2]) - int(ln.split("\t")[1])
                   for ln in _trace_lines(trace))

    b_full = fetched_bytes(str(tmp_path / "full.tif"),
                           str(tmp_path / "t_full"))
    # AOI = bottom-left quarter in world coords -> 4 of 16 chunks
    aoi_df = S.read_raster(spark, [str(tmp_path / "aoi.tif")],
                           tile_dimensions=(256, 256),
                           query_extent=(0.0, 0.0, 1023.0, 1023.0))
    assert aoi_df.count() == 16
    b_aoi = fetched_bytes(str(tmp_path / "aoi.tif"),
                          str(tmp_path / "t_aoi"),
                          query_extent=(0.0, 0.0, 1023.0, 1023.0))
    assert b_full >= 1024 * 1024           # realized the bulk of the file
    # the pruned read must move well under half the bytes: its 16
    # windows are a quarter of the tile data (+ block rounding)
    assert 0 < b_aoi < 0.55 * b_full


def test_count_on_lazy_frame_is_header_only(spark, scene_dir, tmp_path):
    trace = str(tmp_path / "cnt")
    df = S.read_raster(spark, _catalog(scene_dir), tile_dimensions=(16, 16))
    df = df.withColumn("tile", S.realize_tiles("tile_ref", io_trace=trace))
    assert df.count() == 32          # count() prunes every column
    assert df.where(F.col("extent.xmin") < 32.0).count() == 16
    assert _trace_lines(trace) == []


# ---------------------------------------------------------------------------
# GRIB laziness (VERDICT r10 #3): the metadata path must parse sections
# 0-6 ONLY.  Before r11, read_info decoded every pixel of every field
# just to report dims/extent — a band_indexes=(0,) read of an
# operational GFS file (~500 fields) paid a 500-field decode per
# executor.  These tests pin the fixed contract with byte-level fetch
# accounting (RangeSource) plus the decode counter, at the adapter
# level where the invariant is measurable in-process.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def grib_scene(tmp_path_factory):
    from rasterframes_spark.sources import grib2 as GB

    root = tmp_path_factory.mktemp("lazygrib")
    rng = np.random.default_rng(17)
    fields = [rng.integers(0, 60000, (512, 512)).astype("float64")
              for _ in range(4)]
    path = str(root / "scene.grib2")
    with open(path, "wb") as f:
        f.write(GB.write_grib2(fields, (-120.0, 10.0, -48.0, 58.0),
                               nbits=16))
    return path, fields


def test_grib_metadata_read_touches_headers_not_payloads(grib_scene):
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.sources.rangeio import RangeSource

    path, fields = grib_scene
    GB._SCAN_CACHE.clear()
    GB._BAND_CACHE.clear()
    before = dict(GB.DECODE_STATS)
    src = RangeSource(path, block_size=4096)
    info = GB.read_info(src)
    assert (info.width, info.height, info.bands) == (512, 512, 4)
    # zero payload decodes — full OR row-windowed
    assert GB.DECODE_STATS == before
    # and byte-level: the 4 x 512 KiB payloads were never fetched
    # (headers + block rounding only; the file is ~2 MiB)
    assert src.bytes_fetched < 64 * 1024


def test_grib_band_read_fetches_one_bands_bytes(grib_scene):
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.sources.rangeio import RangeSource

    path, fields = grib_scene
    GB._SCAN_CACHE.clear()
    GB._BAND_CACHE.clear()
    src = RangeSource(path, block_size=4096)
    info = GB.read_info(src)
    arr = GB.read_window(src, info, 0, 0, 512, 512, band=2)
    assert np.array_equal(arr, fields[2])
    # one band is 512 KiB packed; all four are 2 MiB — a full-band read
    # must not decode its neighbors
    assert src.bytes_fetched < 1.5 * 512 * 512 * 2


def test_grib_row_window_reads_only_its_rows(grib_scene):
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.sources.rangeio import RangeSource

    path, fields = grib_scene
    GB._SCAN_CACHE.clear()
    GB._BAND_CACHE.clear()
    before_rw = GB.DECODE_STATS["row_windows"]
    src = RangeSource(path, block_size=4096)
    info = GB.read_info(src)
    header_bytes = src.bytes_fetched
    win = GB.read_window(src, info, 100, 200, 64, 32, band=1)
    assert np.array_equal(win, fields[1][200:232, 100:164])
    assert GB.DECODE_STATS["row_windows"] == before_rw + 1
    # 32 rows x 512 cols x 2 bytes = 32 KiB of payload (+ blocks)
    assert src.bytes_fetched - header_bytes < 3 * 32 * 512 * 2


def _poke_scan_mode(msg: bytes, scan: int) -> bytes:
    """Set the scanning-mode octet of a single-message GRIB2 file
    (template 3.0 octet 72 = section offset 71)."""
    buf = bytearray(msg)
    p = 16
    while True:
        slen = int.from_bytes(buf[p:p + 4], "big")
        if buf[p + 4] == 3:
            buf[p + 71] = scan
            return bytes(buf)
        p += slen


@pytest.mark.parametrize("scan", [0x00, 0x40, 0x80, 0xC0])
def test_grib_row_window_parity_across_scan_modes(scan):
    """The row-windowed decode reimplements the scan-flip logic; pin it
    boolean-identical to the full-field path for every supported mode
    at an odd nbits (mid-byte row offsets)."""
    from rasterframes_spark.sources import grib2 as GB

    rng = np.random.default_rng(23)
    a = rng.integers(0, 2000, (61, 53)).astype("float64")
    msg = _poke_scan_mode(
        GB.write_grib2([a], (-120.0, 10.0, -67.0, 71.0), nbits=11), scan)
    full = GB.parse_grib2(msg)[0]["values"]
    src = GB._BytesSrc(msg)
    metas, _ = GB._scan(src)
    rows = GB._read_rows_simple(src, metas[0], 7, 36)
    assert np.array_equal(rows, full[7:43])


@pytest.mark.parametrize("scan", [0x00, 0x40, 0x80])
def test_grib1_row_window_parity(scan):
    from rasterframes_spark.sources import grib1 as G1
    from rasterframes_spark.sources import grib2 as GB

    rng = np.random.default_rng(29)
    a = rng.integers(0, 1000, (29, 37)).astype("float64")
    buf = bytearray(G1.write_grib1([a], (-10.0, 40.0, 27.0, 69.0),
                                   nbits=11))
    buf[8 + 28 + 27] = scan          # IS(8) + PDS(28) + GDS octet 28
    msg = bytes(buf)
    full = G1.parse_grib1(msg)[0]["values"]
    metas = G1.scan_grib1(GB._BytesSrc(msg))
    rows = GB._read_rows_simple(GB._BytesSrc(msg), metas[0], 5, 13)
    assert np.array_equal(rows, full[5:18])


def test_grib_catalog_metadata_query_reads_zero_window_bytes(
        spark, grib_scene, tmp_path):
    """Spark-level mirror of the GeoTIFF test above over a GRIB
    catalog: a metadata-only query realizes nothing (the adapter-level
    tests pin that read_info itself is also payload-free)."""
    path, _fields = grib_scene
    trace = str(tmp_path / "gribtrace")
    df = S.read_raster(spark, [path], tile_dimensions=(256, 256))
    df = df.withColumn("tile", S.realize_tiles("tile_ref", io_trace=trace))
    meta = df.select("extent", "crs", F.col("tile_ref.col_off"))
    assert meta.count() == 4                      # 2x2 chunk grid
    assert _trace_lines(trace) == []
    df.select("tile").collect()
    assert len(_trace_lines(trace)) > 0


# ---------------------------------------------------------------------------
# Classic NetCDF laziness (VERDICT r10 #3 mirror): the header carries
# every variable's begin offset and the data is a plain strided slab,
# so metadata needs header + 1-D coordinate variables only and windows
# are single contiguous range reads.  (NetCDF-4/HDF5 stays on the
# eager cached decode — chunk B-trees + filters make windows
# non-strided; the recorded exception in the module docstring.)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nc_scene(tmp_path_factory):
    from rasterframes_spark.sources import netcdf as NC

    root = tmp_path_factory.mktemp("lazync")
    rng = np.random.default_rng(31)
    cube = rng.integers(-200, 800, (4, 512, 512)).astype("int16")
    path = str(root / "scene.nc")
    with open(path, "wb") as f:
        f.write(NC.write_netcdf(
            {"t2m": (("time", "y", "x"), cube),
             "y": (("y",), np.linspace(10.0, 61.1, 512)),
             "x": (("x",), np.linspace(-120.0, -68.9, 512))},
            {"time": None, "y": 512, "x": 512},
            var_attrs={"t2m": {"_FillValue": np.int16(-200),
                               "scale_factor": np.float64(0.5)}}))
    return path, cube


def test_netcdf_metadata_read_is_header_and_coords_only(nc_scene):
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.sources.rangeio import RangeSource

    path, cube = nc_scene
    NC._CDF_META_CACHE.clear()
    src = RangeSource(path, block_size=4096)
    info = NC.read_info(src, "t2m")
    assert (info.width, info.height, info.bands) == (512, 512, 4)
    assert info.dtype == "float64" and np.isnan(info.nodata)
    # the file is ~4 MiB of pixels; metadata cost header + two 4 KiB
    # coordinate variables
    assert src.bytes_fetched < 32 * 1024


def test_netcdf_window_is_one_contiguous_row_span(nc_scene):
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.sources.rangeio import RangeSource

    path, cube = nc_scene
    NC._CDF_META_CACHE.clear()
    src = RangeSource(path, block_size=4096)
    info = NC.read_info(src, "t2m")
    header_bytes = src.bytes_fetched
    win = NC.read_window(src, info, 100, 200, 64, 32, band=2, var="t2m")
    # eager-path oracle: whole-variable decode, north-up flip
    flat, _, _ = NC._load_grid(NC._NCBytesSrc(open(path, "rb").read()),
                               "t2m")
    assert np.array_equal(win, flat[2, 200:232, 100:164], equal_nan=True)
    # 32 rows x 512 cols x 2 bytes = 32 KiB of pixel data (+ blocks);
    # nothing near the 1 MiB a full-band decode would read
    assert src.bytes_fetched - header_bytes < 3 * 32 * 512 * 2


# ---------------------------------------------------------------------------
# NetCDF-4/HDF5 laziness: decode-windowed since r11, RANGE-BACKED
# since r12 (VERDICT r11 next #3) — the container's superblock/object
# headers/B-trees/heaps are walked with 16 KiB-block range reads and
# data chunks fetch through the caller's big-block source, so
# metadata is KB-scale like GRIB/NetCDF-3 and a window fetches only
# its intersecting chunks' bytes.
# ---------------------------------------------------------------------------


def test_netcdf4_metadata_decodes_nothing_window_decodes_its_chunks():
    from rasterframes_spark.sources import hdf5 as H5
    from rasterframes_spark.sources import netcdf as NC

    rng = np.random.default_rng(37)
    ny, nx = 48, 72
    cube = rng.integers(-100, 900, (3, ny, nx)).astype("int16")
    w = H5.H5Writer()
    w.create_dataset("t2m", cube, chunks=(1, 16, 16), compression="gzip",
                     attrs={"_FillValue": np.int16(-100),
                            "scale_factor": np.float64(0.5)})
    w.create_dataset("lat", np.linspace(10, 57, ny))
    w.create_dataset("lon", np.linspace(-120, -49, nx))
    data = w.tobytes()

    calls = []
    orig = H5._Dataset._decode_chunk

    def counting(self, *a):
        calls.append(self.name)
        return orig(self, *a)

    H5._Dataset._decode_chunk = counting
    try:
        NC._H5_CACHE.clear()
        src = NC._NCBytesSrc(data)
        info = NC.read_info(src)
        assert (info.width, info.height, info.bands) == (nx, ny, 3)
        assert info.dtype == "float64" and np.isnan(info.nodata)
        assert calls == []              # metadata decoded NOTHING
        win = NC.read_window(src, info, 2, 3, 10, 10, band=1)
        assert len(calls) == 1          # one 16x16 chunk covers 10x10
        # value parity against the eager whole-variable oracle
        flat, _, _ = NC._load_grid(NC._NCBytesSrc(data), "t2m")
        assert np.array_equal(win, flat[1, 3:13, 2:12], equal_nan=True)
        # a full-band read decodes only that band's chunks (3x5 grid of
        # 16x16 chunks per band; never the other bands' 30)
        calls.clear()
        full = NC.read_window(src, info, 0, 0, nx, ny, band=2)
        assert len(calls) == 3 * 5
        assert np.array_equal(full, flat[2], equal_nan=True)
    finally:
        H5._Dataset._decode_chunk = orig


def test_netcdf4_metadata_read_fetches_kilobytes(tmp_path):
    """r12 (VERDICT r11 next #3): read_info over an NetCDF-4 container
    fetches superblock + object headers + B-trees + the 1-D coordinate
    axes — KBs, NOT the file — and a one-chunk window fetches ~that
    chunk's bytes on top."""
    from rasterframes_spark.sources import hdf5 as H5
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.sources.rangeio import RangeSource

    rng = np.random.default_rng(41)
    ny, nx = 384, 512
    cube = rng.integers(-100, 900, (2, ny, nx)).astype("int16")
    w = H5.H5Writer()
    w.create_dataset("t2m", cube, chunks=(1, 64, 64),
                     attrs={"_FillValue": np.int16(-100)})
    w.create_dataset("lat", np.linspace(10, 57, ny))
    w.create_dataset("lon", np.linspace(-120, -49, nx))
    path = str(tmp_path / "big.h5")
    with open(path, "wb") as f:
        f.write(w.tobytes())
    fsize = os.path.getsize(path)
    assert fsize > 700_000                  # ~768 KiB of pixels
    NC._H5_CACHE.clear()
    src = RangeSource(path, block_size=4096)
    info = NC.read_info(src)
    assert (info.width, info.height, info.bands) == (nx, ny, 2)
    assert src.bytes_fetched < 64 * 1024
    meta_bytes = src.bytes_fetched
    win = NC.read_window(src, info, 10, 10, 40, 40, band=1)
    with open(path, "rb") as f:
        flat, _, _ = NC._load_grid(NC._NCBytesSrc(f.read()), "t2m")
    assert np.array_equal(win, flat[1, 10:50, 10:50], equal_nan=True)
    # the 40x40 window sits inside ONE 64x64 int16 chunk (8 KiB);
    # nowhere near the ~384 KiB a full-band fetch would cost
    assert src.bytes_fetched - meta_bytes < 64 * 1024


def test_mixed_grib_netcdf_catalog_metadata_reads_zero_window_bytes(
        spark, grib_scene, nc_scene, tmp_path):
    """VERDICT r11 next #6: the Spark-level zero-window-bytes assert
    over a MIXED GRIB + classic-NetCDF catalog (the GRIB-only version
    is above; NetCDF was adapter-level only until r12)."""
    import shutil

    # fresh URI copies: executor workers LRU-cache range sources (and
    # their trace hooks / block caches) per URI across tests in this
    # module, which would mask or misdirect the fetch accounting
    gpath = str(tmp_path / "mix.grib2")
    npath = str(tmp_path / "mix.nc")
    shutil.copy(grib_scene[0], gpath)
    shutil.copy(nc_scene[0], npath)
    trace = str(tmp_path / "mixtrace")
    df = S.read_raster(spark, [gpath, npath + "#t2m"],
                       tile_dimensions=(256, 256))
    df = df.withColumn("tile", S.realize_tiles("tile_ref", io_trace=trace))
    meta = df.select("path", "extent", F.col("tile_ref.col_off"))
    assert meta.count() == 8              # two 512x512 files, 2x2 grids
    assert _trace_lines(trace) == []      # metadata realized NOTHING
    df.select("tile").collect()
    assert len(_trace_lines(trace)) > 0


def test_vrt_window_prunes_nonintersecting_member(tmp_path):
    """The laziness ledger's composition layer: a VRT window read
    fetches the manifest plus ONLY the intersecting member's window
    bytes — a member whose DstRect misses the window is never opened
    at all (r12; the per-source DstRect intersection is the pruning)."""
    from rasterframes_spark.sources import raster_reader as RR
    from rasterframes_spark.sources import vrt as V
    from rasterframes_spark.sources.rangeio import RangeSource

    rng = np.random.default_rng(21)
    left = rng.integers(0, 60000, (1024, 1024)).astype("uint16")
    right = rng.integers(0, 60000, (1024, 1024)).astype("uint16")
    lp, rp = str(tmp_path / "left.tif"), str(tmp_path / "right.tif")
    with open(lp, "wb") as f:
        f.write(GT.write_geotiff(left, (0.0, 0.0, 1024.0, 1024.0),
                                 "EPSG:32618", tile_size=256))
    with open(rp, "wb") as f:
        f.write(GT.write_geotiff(right, (1024.0, 0.0, 2048.0, 1024.0),
                                 "EPSG:32618", tile_size=256))
    vrt = """<VRTDataset rasterXSize="2048" rasterYSize="1024">
  <SRS>EPSG:32618</SRS>
  <GeoTransform>0.0, 1.0, 0.0, 1024.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="UInt16" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">left.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="1024" ySize="1024"/>
      <DstRect xOff="0" yOff="0" xSize="1024" ySize="1024"/>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">right.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="1024" ySize="1024"/>
      <DstRect xOff="1024" yOff="0" xSize="1024" ySize="1024"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
    p = tmp_path / "m.vrt"
    p.write_text(vrt)
    RR._range_source.cache_clear()
    RR._cached_info.cache_clear()
    src = RangeSource(str(p))
    info = V.read_info(src)
    assert (info.width, info.height) == (2048, 1024)
    win = V.read_window(src, info, 100, 100, 200, 200)   # left half only
    np.testing.assert_array_equal(win, left[100:300, 100:300])
    fsize = os.path.getsize(lp)
    ls = RR._range_source(lp)
    # the window covers 4 of 16 tiles; even with 256 KiB block rounding
    # the fetch stays well under the whole member
    assert 0 < ls.bytes_fetched < 0.7 * fsize
    # the right member was NEVER window-read (a fresh source reads 0)
    assert RR._range_source(rp).bytes_fetched == 0
