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
