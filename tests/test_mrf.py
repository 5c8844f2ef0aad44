"""MRF container (sources/mrf.py): round-trips, sparse pages, windowed
reads, multi-band layout, and the distributed read_raster path."""

import struct

import numpy as np
import pytest

from rasterframes_spark.sources import mrf as M
from rasterframes_spark.sources.rangeio import RangeSource


def _roundtrip(tmp_path, arr, name="t", **kw):
    p = str(tmp_path / f"{name}.mrf")
    M.write_mrf(p, arr, **kw)
    src = RangeSource(p)
    info = M.read_info(src)
    return p, src, info


def test_png_roundtrip_and_windows(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 60000, (100, 130)).astype("uint16")
    p, src, info = _roundtrip(tmp_path, arr, page_size=(64, 64),
                              extent=(10.0, 20.0, 140.0, 120.0),
                              crs="EPSG:32618")
    assert (info.width, info.height, info.dtype) == (130, 100, "uint16")
    assert info.crs == "EPSG:32618"
    assert info.extent == (10.0, 20.0, 140.0, 120.0)
    got = M.read_window(src, info, 0, 0, 130, 100, 0)
    np.testing.assert_array_equal(got, arr)
    win = M.read_window(src, info, 50, 30, 70, 60, 0)
    np.testing.assert_array_equal(win, arr[30:90, 50:120])


def test_raw_and_jpeg_pages(tmp_path):
    rng = np.random.default_rng(1)
    f = (rng.random((40, 50)) * 100).astype("float32")
    p, src, info = _roundtrip(tmp_path, f, name="raw", compression="NONE",
                              page_size=(32, 32))
    np.testing.assert_array_equal(
        M.read_window(src, info, 0, 0, 50, 40, 0), f)
    # JPEG pages: lossy, so PSNR-bounded on a smooth field
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = (128 + 80 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype("uint8")
    p, src, info = _roundtrip(tmp_path, img, name="jpg",
                              compression="JPEG", page_size=(32, 32))
    got = M.read_window(src, info, 0, 0, 64, 48, 0)
    e = got.astype(float) - img
    assert 10 * np.log10(255 ** 2 / (e * e).mean()) > 35


def test_sparse_pages_fill_nodata(tmp_path):
    arr = np.zeros((96, 96), dtype="uint8")
    arr[:32, :32] = 7  # only the first page has data
    p, src, info = _roundtrip(tmp_path, arr, name="sparse",
                              page_size=(32, 32), nodata=0)
    # index: 9 pages, 8 of them empty records
    idx = open(str(tmp_path / "sparse.idx"), "rb").read()
    recs = [struct.unpack(">QQ", idx[i:i + 16]) for i in range(0, len(idx), 16)]
    assert sum(1 for _, sz in recs if sz == 0) == 8
    got = M.read_window(src, info, 0, 0, 96, 96, 0)
    np.testing.assert_array_equal(got, arr)
    assert info.nodata == 0.0


def test_multiband_band_major_index(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (40, 60, 3)).astype("uint8")
    p, src, info = _roundtrip(tmp_path, arr, name="mb", page_size=(32, 32))
    assert info.bands == 3
    for b in range(3):
        np.testing.assert_array_equal(
            M.read_window(src, info, 10, 5, 40, 30, b),
            arr[5:35, 10:50, b])


def test_rejects_non_mrf_and_lerc(tmp_path):
    p = tmp_path / "x.mrf"
    p.write_text("<NotMRF/>")
    with pytest.raises(ValueError):
        M.read_info(RangeSource(str(p)))
    p2 = tmp_path / "lerc.mrf"
    p2.write_text('<MRF_META><Raster><Size x="4" y="4" c="1"/>'
                  '<Compression>LERC</Compression></Raster></MRF_META>')
    with pytest.raises(ValueError):
        M.read_info(RangeSource(str(p2)))


def test_read_raster_over_mrf(spark, tmp_path):
    from pyspark.sql import functions as F

    from rasterframes_spark import sources as S

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 9999, (128, 128)).astype("uint16")
    p = str(tmp_path / "scene.mrf")
    M.write_mrf(p, arr, page_size=(64, 64),
                extent=(0.0, 0.0, 128.0, 128.0), crs="EPSG:32617")
    df = S.read_raster(spark, [p], tile_dimensions=(64, 64))
    assert df.count() == 4
    tot = (df.select(S.realize_tiles("tile_ref").alias("t"))
           .selectExpr("rf_tile_sum(t) s").agg(F.sum("s")).head()[0])
    assert tot == float(arr.sum())
    assert df.select("crs").head()[0] == "EPSG:32617"
