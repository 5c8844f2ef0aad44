"""Pure-python NetCDF-3 codec + tile-chunk Spark source."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.sources.netcdf import (
    read_netcdf, read_netcdf_info, read_netcdf_var, write_netcdf)
from rasterframes_spark.tile import Tile


def _cube(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-50, 300, (3, 40, 50)).astype("int16")


def _encode(arr, fill=None, scale=None, offset=None):
    nt, ny, nx = arr.shape
    lat = np.linspace(-35.0, -35.0 + ny - 1, ny)          # ascending (CF)
    lon = np.linspace(140.0, 140.0 + nx - 1, nx)
    va = {}
    if fill is not None:
        va.setdefault("t2m", {})["_FillValue"] = np.int16(fill)
    if scale is not None:
        va.setdefault("t2m", {})["scale_factor"] = np.float64(scale)
    if offset is not None:
        va.setdefault("t2m", {})["add_offset"] = np.float64(offset)
    return write_netcdf(
        {"t2m": (("time", "lat", "lon"), arr),
         "lat": (("lat",), lat), "lon": (("lon",), lon),
         "time": (("time",), np.arange(nt, dtype="int32"))},
        {"time": nt, "lat": ny, "lon": nx},
        global_attrs={"Conventions": "CF-1.6"}, var_attrs=va)


def test_roundtrip_types_and_attrs():
    data = _encode(_cube())
    info = read_netcdf_info(data)
    assert dict((n, l) for n, l in info.dims) == {
        "time": 3, "lat": 40, "lon": 50}
    assert info.attrs["Conventions"] == "CF-1.6"
    got = read_netcdf_var(data, "t2m", info)
    np.testing.assert_array_equal(got, _cube())
    # every supported dtype round-trips
    for dt in ("int8", "int16", "int32", "float32", "float64"):
        a = np.arange(12, dtype=dt).reshape(3, 4)
        d = write_netcdf({"v": (("y", "x"), a)}, {"y": 3, "x": 4})
        np.testing.assert_array_equal(read_netcdf_var(d, "v"), a)


def test_fill_scale_offset():
    arr = _cube()
    arr[1, 5, 5] = -32000
    data = _encode(arr, fill=-32000, scale=0.1, offset=273.15)
    got = read_netcdf_var(data, "t2m")
    assert isinstance(got, np.ma.MaskedArray)
    assert got.mask[1, 5, 5] and got.mask.sum() == 1
    np.testing.assert_allclose(
        got[0, 0, 0], arr[0, 0, 0] * 0.1 + 273.15, rtol=1e-6)
    raw = read_netcdf_var(data, "t2m", unpack=False)
    np.testing.assert_array_equal(raw, arr)


def test_not_netcdf_raises():
    with pytest.raises(ValueError):
        read_netcdf_info(b"not a cdf file at all")
    with pytest.raises(ValueError):
        read_netcdf_var(_encode(_cube()), "nope")


def test_read_netcdf_spark_source(spark, tmp_path):
    arr = _cube(7)
    p = str(tmp_path / "scene.nc")
    with open(p, "wb") as f:
        f.write(_encode(arr))
    df = read_netcdf(spark, p, "t2m", tile_dimensions=(16, 16))
    rows = df.collect()
    # 3 slices x ceil(40/16) x ceil(50/16) = 3 * 3 * 4
    assert len(rows) == 36
    for r in rows:
        tr = r["tile"]
        t = Tile.from_parts(tr["cell_type"], tr["cols"], tr["rows"],
                            bytes(tr["cells"]))
        sk = r["spatial_key"]
        # lat ascending in the file -> engine flips to north-up rows
        sl = arr[r["slice_index"]][::-1]
        exp = sl[sk["row"] * 16: sk["row"] * 16 + t.cells.shape[0],
                 sk["col"] * 16: sk["col"] * 16 + t.cells.shape[1]]
        np.testing.assert_array_equal(np.asarray(t.cells), exp)
    # extent stitched from CF coordinate vars (cell-edge aligned)
    ext = df.agg(rf.rf_agg_extent(F.col("extent")).alias("e")).collect()[0]["e"]
    assert ext["xmin"] == pytest.approx(139.5)
    assert ext["xmax"] == pytest.approx(140.0 + 49 + 0.5)
    assert ext["ymin"] == pytest.approx(-35.5)
    assert ext["ymax"] == pytest.approx(-35.0 + 39 + 0.5)
    # rf operators compose directly
    s = df.where(F.col("slice_index") == 0) \
        .agg(F.sum(rf.rf_tile_sum("tile")).alias("s")).collect()[0]["s"]
    assert s == float(arr[0].sum())


def test_record_variables_roundtrip():
    """Unlimited-dimension (record) variables: interleaved storage, the
    single-record-var no-padding rule, and multi-record-var striding."""
    t = np.arange(5, dtype="int32")
    cube = np.arange(5 * 3 * 4, dtype="float32").reshape(5, 3, 4)
    # single record var (no per-record padding)
    d1 = write_netcdf({"v": (("time", "y", "x"), cube)},
                      {"time": None, "y": 3, "x": 4})
    i1 = read_netcdf_info(d1)
    assert i1.numrecs == 5
    np.testing.assert_array_equal(read_netcdf_var(d1, "v", i1), cube)
    # record + fixed vars together, two record vars (padded stride)
    d2 = write_netcdf(
        {"time": (("time",), t),
         "v": (("time", "y", "x"), cube),
         "lat": (("y",), np.array([1.0, 2.0, 3.0]))},
        {"time": None, "y": 3, "x": 4})
    i2 = read_netcdf_info(d2)
    np.testing.assert_array_equal(read_netcdf_var(d2, "time", i2), t)
    np.testing.assert_array_equal(read_netcdf_var(d2, "v", i2), cube)
    np.testing.assert_array_equal(read_netcdf_var(d2, "lat", i2),
                                  [1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# read_raster format-dispatch adapter (via="nc")
# ---------------------------------------------------------------------------


def _nc3_grid(tmp_path, name="t.nc"):
    ny, nx = 40, 60
    temp = np.arange(ny * nx, dtype="f8").reshape(ny, nx) / 7.0
    lats = np.linspace(10.0, 49.0, ny)          # ascending: flip expected
    lons = np.linspace(-120.0, -61.0, nx)
    p = tmp_path / name
    p.write_bytes(write_netcdf(
        {"temp": (("lat", "lon"), temp),
         "lat": (("lat",), lats), "lon": (("lon",), lons)},
        {"lat": ny, "lon": nx}))
    return str(p), temp, lats, lons


def _h5_grid(tmp_path, name="t4.h5"):
    from rasterframes_spark.sources.hdf5 import H5Writer

    ny, nx = 40, 60
    press = (np.arange(ny * nx, dtype="f8").reshape(ny, nx) * 3).astype("f4")
    lats = np.linspace(10.0, 49.0, ny)
    lons = np.linspace(-120.0, -61.0, nx)
    w = H5Writer()
    w.create_dataset("press", press)
    w.create_dataset("lat", lats, attrs={"units": "degrees_north"})
    w.create_dataset("lon", lons, attrs={"units": "degrees_east"})
    p = tmp_path / name
    p.write_bytes(w.tobytes())
    return str(p), press, lats, lons


def test_parse_subdataset_forms():
    from rasterframes_spark.sources.raster_reader import _parse_subdataset

    assert _parse_subdataset("NETCDF:/a/b.nc:temp") == ("/a/b.nc", "temp")
    assert _parse_subdataset('NETCDF:"/a/b.nc":temp') == ("/a/b.nc", "temp")
    assert _parse_subdataset("/a/b.nc#temp") == ("/a/b.nc", "temp")
    assert _parse_subdataset("/a/b.h5#press") == ("/a/b.h5", "press")
    # fragments on non-NetCDF paths pass through (http anchors, etc.)
    assert _parse_subdataset("/a/b.tif#x") == ("/a/b.tif#x", None)
    assert _parse_subdataset("/a/b.nc") == ("/a/b.nc", None)


def test_nc_dispatch_info_window(tmp_path):
    from rasterframes_spark.sources.netcdf import read_info, read_window
    from rasterframes_spark.sources.rangeio import RangeSource

    p, temp, lats, lons = _nc3_grid(tmp_path)
    src = RangeSource(p)
    info = read_info(src)
    assert info.via == "nc" and (info.width, info.height) == (60, 40)
    dx, dy = lons[1] - lons[0], lats[1] - lats[0]
    assert info.extent[0] == pytest.approx(lons.min() - dx / 2)
    assert info.extent[3] == pytest.approx(lats.max() + dy / 2)
    full = read_window(src, info, 0, 0, 60, 40)
    # ascending lats write north-up: row 0 = northernmost source row
    assert np.allclose(full[0], temp[-1]) and np.allclose(full[-1], temp[0])
    win = read_window(src, info, 5, 3, 10, 8)
    assert win.shape == (8, 10) and np.allclose(win, full[3:11, 5:15])


def test_h5_dispatch_and_axis_resolution(tmp_path):
    from rasterframes_spark.sources.netcdf import read_info, read_window
    from rasterframes_spark.sources.rangeio import RangeSource

    p, press, lats, lons = _h5_grid(tmp_path)
    src = RangeSource(p)
    info = read_info(src)                      # default var = first 2-D+
    assert info.via == "nc" and info.dtype == "float32"
    assert info.extent[0] == pytest.approx(lons.min() - 0.5)
    full = read_window(src, info, 0, 0, 60, 40)
    assert np.allclose(full[0], press[-1])


def test_nc_fillvalue_becomes_nan_nodata(tmp_path):
    from rasterframes_spark.sources.netcdf import read_info, read_window
    from rasterframes_spark.sources.rangeio import RangeSource

    arr = _cube()
    data = _encode(arr, fill=-50)
    p = tmp_path / "fv.nc"
    p.write_bytes(data)
    src = RangeSource(str(p))
    info = read_info(src, "t2m")
    assert info.dtype == "float64" and np.isnan(info.nodata)
    assert info.bands == 3                      # leading time dim -> bands
    band1 = read_window(src, info, 0, 0, 50, 40, band=1)
    masked = arr[1] == -50
    assert np.isnan(band1[::-1][masked]).all()  # window is north-up


def test_read_raster_mixed_nc_h5_catalog(spark, tmp_path):
    from rasterframes_spark.sources import read_raster, realize_tiles

    p3, temp, _, _ = _nc3_grid(tmp_path)
    p4, press, _, _ = _h5_grid(tmp_path)
    df = read_raster(spark, [p3 + "#temp", p4], tile_dimensions=(32, 32))
    t = df.withColumn("tile", realize_tiles(F.col("tile_ref")))
    rows = (t.select("path", rf.rf_tile_sum("tile").alias("s"))
              .groupBy("path")
              .agg(F.sum("s").alias("total"), F.count("*").alias("tiles"))
              .collect())
    got = {r.path.split("/")[-1].split("#")[0]: r for r in rows}
    assert got["t.nc"].tiles == 4 and got["t4.h5"].tiles == 4
    assert got["t.nc"].total == pytest.approx(float(temp.sum()))
    assert got["t4.h5"].total == pytest.approx(float(press.sum()), rel=1e-6)


def test_rec_is_y_window_parity(tmp_path):
    """2-D record variable — the unlimited dim IS the y axis (ADVICE
    r11 #1): the lazy adapter's fit check must not double-count the
    record span, and read_window must stride rows by recsize (records
    of other record variables interleave between rows), matching the
    eager reader exactly."""
    from rasterframes_spark.sources.netcdf import read_info, read_window
    from rasterframes_spark.sources.rangeio import RangeSource

    ny, nx = 12, 9
    t = np.arange(ny * nx, dtype="float32").reshape(ny, nx) * 1.5
    cnt = (np.arange(ny, dtype="int32") * 7)
    # MULTIPLE record vars: recsize > one row of t, the stride matters
    d = write_netcdf({"t": (("rec", "x"), t), "cnt": (("rec",), cnt)},
                     {"rec": None, "x": nx})
    np.testing.assert_array_equal(np.asarray(read_netcdf_var(d, "t")), t)
    p = tmp_path / "recy.nc"
    p.write_bytes(d)
    src = RangeSource(str(p))
    info = read_info(src, "t")
    assert (info.width, info.height, info.bands) == (nx, ny, 1)
    np.testing.assert_allclose(
        read_window(src, info, 0, 0, nx, ny, var="t"), t)
    np.testing.assert_allclose(
        read_window(src, info, 2, 3, 5, 6, var="t"), t[3:9, 2:7])
    # single record var (unpadded recsize == exactly one row) still works
    d1 = write_netcdf({"t": (("rec", "x"), t)}, {"rec": None, "x": nx})
    p1 = tmp_path / "recy1.nc"
    p1.write_bytes(d1)
    src1 = RangeSource(str(p1))
    np.testing.assert_allclose(
        read_window(src1, read_info(src1, "t"), 1, 2, 4, 5, var="t"),
        t[2:7, 1:5])


def test_window_out_of_range_raises(tmp_path):
    """Out-of-range windows on the public adapter raise instead of
    slicing garbage / silently clamping (ADVICE r11 #3) — classic and
    HDF5 branches both."""
    from rasterframes_spark.sources.netcdf import read_info, read_window
    from rasterframes_spark.sources.rangeio import RangeSource

    bad = ((0, 35, 10, 10), (55, 0, 10, 5), (-1, 0, 5, 5),
           (0, -2, 5, 5), (0, 0, 0, 5), (5, 5, 5, 0))
    p, *_ = _nc3_grid(tmp_path)
    src = RangeSource(p)
    info = read_info(src)
    for c0, r0, w, h in bad:
        with pytest.raises(IndexError):
            read_window(src, info, c0, r0, w, h)
    p4, *_ = _h5_grid(tmp_path)
    src4 = RangeSource(p4)
    info4 = read_info(src4)
    for c0, r0, w, h in bad:
        with pytest.raises(IndexError):
            read_window(src4, info4, c0, r0, w, h)


def test_h5_cache_is_per_uri_and_lru(tmp_path, monkeypatch):
    """ADVICE r11 #2 + VERDICT r11 #5: the NetCDF-4 container parses
    ONCE per file (two variables share the entry), and eviction is LRU
    — a cache hit refreshes recency, so re-touching a recent file
    survives a fifth file's arrival."""
    from rasterframes_spark.sources import hdf5 as H5
    from rasterframes_spark.sources import netcdf as NC
    from rasterframes_spark.sources.rangeio import RangeSource

    paths = []
    for i in range(5):
        w = H5.H5Writer()
        w.create_dataset("a", np.arange(12, dtype="f4").reshape(3, 4) + i)
        w.create_dataset("b", np.arange(12, dtype="f4").reshape(3, 4) - i)
        p = str(tmp_path / f"f{i}.h5")
        with open(p, "wb") as f:
            f.write(w.tobytes())
        paths.append(p)

    parses = []
    orig = H5.read_netcdf4_meta

    def counting(src):
        parses.append(getattr(src, "uri", None))
        return orig(src)

    monkeypatch.setattr(H5, "read_netcdf4_meta", counting)
    NC._H5_CACHE.clear()
    s = RangeSource(paths[0])
    NC.read_info(s, "a")
    NC.read_info(s, "b")                  # second VARIABLE: no re-parse
    assert len(parses) == 1
    for p in paths[1:4]:                  # fill the 4-entry cache
        NC.read_info(RangeSource(p), "a")
    assert len(parses) == 4
    NC.read_info(RangeSource(paths[0]), "a")   # hit refreshes f0
    assert len(parses) == 4
    NC.read_info(RangeSource(paths[4]), "a")   # evicts LRU (f1), not f0
    assert len(parses) == 5
    NC.read_info(RangeSource(paths[0]), "a")   # f0 still resident
    assert len(parses) == 5
    NC.read_info(RangeSource(paths[1]), "a")   # f1 was the eviction
    assert len(parses) == 6
