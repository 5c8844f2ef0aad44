"""HDF5 classic layout (sources/hdf5.py): round-trip matrix, storage
variants, robustness, NetCDF-4 CF mapping, and the Spark read_netcdf
dispatch.  No libhdf5/h5py exists in this container — the on-disk
structure chain (superblock -> btrees -> heaps -> object headers) is
exercised by the own writer; a broken offset breaks the chain loudly."""

import numpy as np
import pytest

from rasterframes_spark.sources.hdf5 import H5File, H5Writer, read_netcdf4


def _rt(build):
    w = H5Writer()
    build(w)
    return H5File(w.tobytes())


@pytest.mark.parametrize("dtype", [
    "uint8", "int16", "uint16", "int32", "<u4", "float32", "float64",
    ">i2", ">f8"])
def test_contiguous_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(1)
    a = (rng.random((23, 31)) * 100).astype(dtype)
    f = _rt(lambda w: w.create_dataset("x", a))
    got = f.datasets["/x"].read()
    np.testing.assert_array_equal(got, a)
    assert got.dtype == np.dtype(dtype)


@pytest.mark.parametrize("chunks,comp,shuf", [
    ((8, 8), None, False), ((7, 5), None, False),
    ((8, 8), "gzip", False), ((16, 4), "gzip", True),
    ((64, 64), "gzip", False)])  # single chunk larger than data
def test_chunked_roundtrip(chunks, comp, shuf):
    rng = np.random.default_rng(2)
    a = rng.integers(-1000, 1000, (40, 55)).astype("int32")
    f = _rt(lambda w: w.create_dataset("x", a, chunks=chunks,
                                       compression=comp, shuffle=shuf))
    np.testing.assert_array_equal(f.datasets["/x"].read(), a)


def test_1d_and_3d_and_groups():
    rng = np.random.default_rng(3)
    one = np.arange(17, dtype="float32")
    cube = rng.random((4, 6, 8)).astype("float64")

    def build(w):
        w.create_dataset("one", one)
        w.create_dataset("cube", cube, chunks=(2, 3, 8), compression="gzip")
        w.create_dataset("g/nested", np.ones((3, 3), dtype="uint8"))

    f = _rt(build)
    np.testing.assert_array_equal(f.datasets["/one"].read(), one)
    np.testing.assert_array_equal(f.datasets["/cube"].read(), cube)
    assert "/g" in f.groups
    assert f.datasets["/g/nested"].read().sum() == 9


def test_attributes_roundtrip():
    def build(w):
        w.create_dataset("d", np.zeros((2, 2), dtype="int16"),
                         attrs={"scale_factor": 0.25, "add_offset": 10.0,
                                "_FillValue": -1, "units": "K",
                                "valid_range": np.array([0, 100],
                                                        dtype="int32")})
        w.set_group_attrs("", {"Conventions": "CF-1.6", "n": 7})

    f = _rt(build)
    at = f.datasets["/d"].attrs
    assert at["scale_factor"] == 0.25
    assert at["add_offset"] == 10.0
    assert at["_FillValue"] == -1
    assert at["units"] == "K"
    np.testing.assert_array_equal(at["valid_range"], [0, 100])
    assert f.attrs["/"] == {"Conventions": "CF-1.6", "n": 7}


def test_netcdf4_cf_unpacking():
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 1000, (30, 40)).astype("int16")
    raw[5, 7] = -9999

    def build(w):
        w.create_dataset("sst", raw, chunks=(16, 16), compression="gzip",
                         attrs={"scale_factor": 0.01, "add_offset": 273.15,
                                "_FillValue": -9999})
        w.create_dataset("lon", np.linspace(-179.5, 179.5, 40))
        w.create_dataset("lat", np.linspace(-89.5, 89.5, 30))

    w = H5Writer()
    build(w)
    nc = read_netcdf4(w.tobytes())
    sst, attrs = nc["variables"]["sst"]
    assert np.isnan(sst[5, 7])
    assert sst[0, 0] == pytest.approx(raw[0, 0] * 0.01 + 273.15)
    assert attrs["units"] if "units" in attrs else True


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        H5File(b"not hdf5 at all...........")
    w = H5Writer()
    w.create_dataset("x", np.zeros((4, 4), dtype="uint8"))
    good = bytearray(w.tobytes())
    bad = bytearray(good)
    bad[8] = 2  # superblock version 2
    with pytest.raises(ValueError):
        H5File(bytes(bad))
    with pytest.raises(ValueError):
        H5File(bytes(good[:100]))


def test_read_netcdf_spark_dispatches_hdf5(spark, tmp_path):
    from pyspark.sql import functions as F

    from rasterframes_spark.sources.netcdf import read_netcdf

    rng = np.random.default_rng(5)
    grid = (rng.random((64, 96)) * 50).astype("float64")
    w = H5Writer()
    w.create_dataset("pr", grid, chunks=(32, 32), compression="gzip")
    w.create_dataset("x", np.linspace(0.5, 95.5, 96))
    w.create_dataset("y", np.linspace(0.5, 63.5, 64))
    p = tmp_path / "scene.nc4"
    p.write_bytes(w.tobytes())
    df = read_netcdf(spark, [str(p)], "pr", tile_dimensions=(32, 32),
                     x_dim="x", y_dim="y")
    assert df.count() == 2 * 3
    tot = df.selectExpr("rf_tile_sum(tile) s").agg(F.sum("s")).head()[0]
    assert tot == pytest.approx(float(grid.sum()), rel=1e-12)
    ext = df.agg(F.min("extent.xmin"), F.max("extent.xmax"),
                 F.min("extent.ymin"), F.max("extent.ymax")).head()
    assert tuple(ext) == (0.0, 96.0, 0.0, 64.0)


def test_typed_fillvalue_and_sparse_chunks():
    """Fill bytes are typed by the DATASET dtype (an int32 -9999 is not a
    float32 NaN), and all-fill chunks stay unallocated."""
    a = np.full((8, 8), -9999, dtype=np.int32)
    a[0:4, 0:4] = np.arange(16, dtype=np.int32).reshape(4, 4)
    w = H5Writer()
    w.create_dataset("d", a, chunks=(4, 4), fillvalue=np.int32(-9999))
    blob = w.tobytes()
    f = H5File(blob)
    ds = f.datasets["/d"]
    got = ds.read()
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, a)
    chunks = []
    f._walk_chunk_btree(ds._btree_addr, 2, chunks)
    assert len(chunks) == 1              # 3 of 4 chunks unallocated

    b = np.full((6,), np.nan)
    b[2] = 7.5
    w = H5Writer()
    w.create_dataset("f", b, chunks=(2,), fillvalue=np.nan)
    got = H5File(w.tobytes()).datasets["/f"].read()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(b))
    assert got[2] == 7.5


def test_filter_mask_indexes_pipeline_position():
    """The chunk filter mask is indexed by PIPELINE position (spec
    IV.A.2.l): with [shuffle, deflate], a chunk whose optional deflate
    grew it carries mask bit 1 — the chunk is stored shuffled-only and
    the reader must skip zlib but still unshuffle."""
    rng = np.random.default_rng(0)
    c = rng.integers(-2 ** 31, 2 ** 31 - 1, size=(64,), dtype=np.int32)
    w = H5Writer()
    w.create_dataset("r", c, chunks=(16,), compression="gzip", shuffle=True)
    f = H5File(w.tobytes())
    ds = f.datasets["/r"]
    np.testing.assert_array_equal(ds.read(), c)
    chunks = []
    f._walk_chunk_btree(ds._btree_addr, 1, chunks)
    masks = [m for _, _, m, _ in chunks]
    assert any(m != 0 for m in masks)     # random data defeats deflate
    assert all(m in (0, 2) for m in masks)  # deflate bit = its index (1)


def test_high_compression_roundtrip():
    """A 24 MB logical dataset deflates to a ~26 KB file (constant
    data); the corruption-fuzz allocation guard must not reject valid
    high-ratio files — the bound is absolute, not file-size-relative."""
    a = np.zeros((2400, 2500), dtype="float32")
    f = _rt(lambda w: w.create_dataset("z", a, chunks=(300, 2500),
                                       compression="gzip"))
    got = f.datasets["/z"].read()
    assert got.shape == (2400, 2500) and not got.any()


def test_mutation_fuzz_never_wrong_exception():
    """Corrupted bytes surface as ValueError (the format-dispatch
    contract), never struct.error / TypeError / IndexError escapes,
    cyclic B-tree hangs, or multi-second phantom-shape allocations
    (r10 fuzz findings: chunk B-tree bounds/cycles, np.dtype on
    garbage sizes, 4 GiB fills from KB-scale files)."""
    import time

    import numpy as np

    from rasterframes_spark.sources import hdf5 as H5
    from rasterframes_spark.sources import netcdf as NC

    rng = np.random.default_rng(5)
    a = rng.normal(0, 10, size=(14, 19))
    w = H5.H5Writer()
    w.create_dataset("t2m", a, chunks=(7, 10), compression="gzip",
                     shuffle=True)
    h5 = w.tobytes()
    nc = NC.write_netcdf({"t2m": (("y", "x"), a)}, {"y": 14, "x": 19})

    def nc_parse(b):
        info = NC.read_netcdf_info(b)
        for v in list(info.vars)[:3]:
            NC.read_netcdf_var(b, v)

    for good, parse in ((h5, lambda b: H5.read_netcdf4(b)),
                        (nc, nc_parse)):
        for trial in range(500):
            b = bytearray(good)
            for _ in range(rng.integers(1, 5)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            t0 = time.time()
            try:
                parse(bytes(b))
            except (ValueError, NotImplementedError, MemoryError):
                pass
            assert time.time() - t0 < 2.0, "slow parse on corrupt input"
        for cut in rng.integers(1, len(good), size=50):
            try:
                parse(good[:int(cut)])
            except (ValueError, NotImplementedError, MemoryError):
                pass


def test_long_link_name_beyond_4096_bytes():
    """ADVICE r12 #4: the heap-string NUL scan was capped at a fixed
    4096 bytes, rejecting spec-legal link names longer than that.  The
    bound is now the local heap's own data-segment size."""
    name = "v" + "x" * 5000
    a = np.arange(12, dtype="int32").reshape(3, 4)
    f = _rt(lambda w: w.create_dataset(name, a))
    np.testing.assert_array_equal(f.datasets["/" + name].read(), a)
