"""Cross-format corruption contract: every native parser must turn
corrupt bytes into ValueError / NotImplementedError (the format
dispatch's "not this format, try the next") — never IndexError /
struct.error / TypeError escapes, and never multi-second work on
garbage.

r10 ran a ~150k-mutation sweep across every native codec; the heavy
per-format fuzzes live with their formats (GRIB: test_grib2, HDF5 +
NetCDF: test_hdf5, MP4: test_mp4, JP2: test_jp2).  This file keeps a
light always-on pass over the parsers that came through the sweep
clean, so a future edit that breaks the contract fails here instead
of in a Spark task.
"""
from __future__ import annotations

import time

import numpy as np

_OK = (ValueError, NotImplementedError, MemoryError)


def _fuzz(good: bytes, parse, trials: int = 200, budget: float = 2.0,
          rng=None):
    rng = rng or np.random.default_rng(3)
    for _ in range(trials):
        b = bytearray(good)
        for _m in range(rng.integers(1, 5)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        t0 = time.time()
        try:
            parse(bytes(b))
        except _OK:
            pass
        assert time.time() - t0 < budget, "slow parse on corrupt input"
    for cut in rng.integers(1, len(good), size=30):
        try:
            parse(good[:int(cut)])
        except _OK:
            pass


def test_geotiff():
    from rasterframes_spark.sources import geotiff as GT

    a = np.arange(2000, dtype="float64").reshape(40, 50)
    tif = GT.write_geotiff(a, (0, 0, 50, 40))
    _fuzz(tif, GT.read_info)


def test_jpeg_png_gif():
    from rasterframes_spark.sources.gif import decode_gif, encode_gif
    from rasterframes_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from rasterframes_spark.sources.png import decode_png, encode_png

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    _fuzz(encode_jpeg(img), decode_jpeg)
    _fuzz(encode_png(img), decode_png)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    gimg = pal[rng.integers(0, 4, size=(24, 32))]
    _fuzz(encode_gif([gimg, gimg]), decode_gif)


def test_audio():
    from rasterframes_spark.pipeline.audio import decode_wav, encode_wav
    from rasterframes_spark.sources.flac import decode_flac, encode_flac

    pcm = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype(np.int16)
    _fuzz(encode_wav(pcm, 8000), decode_wav)
    _fuzz(encode_flac(pcm, 8000), decode_flac)


def test_avro_container():
    from rasterframes_spark.sources import avro_io as AV

    schema = {"type": "record", "name": "KV", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "vals", "type": {"type": "array", "items": "double"}}]}
    rows = [{"id": i, "name": f"r{i}", "vals": [1.5 * i, 2.5]}
            for i in range(20)]
    _fuzz(AV.write_container(rows, schema),
          lambda b: AV.read_container(b))


def test_warc():
    from rasterframes_spark.sources import warc as W

    recs = [({"WARC-Type": "response",
              "WARC-Target-URI": f"http://x/{i}"},
             b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
             b"<html>hi there</html>") for i in range(4)]

    def parse(b):
        for _r in W.iter_warc_records(b):
            pass

    for gz in (True, False):
        _fuzz(W.write_warc(recs, gzip_members=gz), parse)


def test_mrf(tmp_path):
    """MRF's three files (XML metadata, flat index, data pages) each
    take mutations; missing XML elements used to escape as
    AttributeError/TypeError from the element walk (r10)."""
    from rasterframes_spark.sources import mrf as MRF
    from rasterframes_spark.sources.rangeio import open_source

    rng = np.random.default_rng(6)
    arr = rng.integers(0, 250, size=(48, 64)).astype(np.uint8)
    MRF.write_mrf(str(tmp_path / "scene.mrf"), arr, extent=(0, 0, 64, 48))
    orig = {n: (tmp_path / n).read_bytes()
            for n in ("scene.mrf", "scene.idx", "scene.ppg")}

    for trial in range(240):
        work = tmp_path / f"w{trial}"
        work.mkdir()
        victim = ["scene.mrf", "scene.idx", "scene.ppg"][trial % 3]
        for n, byts in orig.items():
            b = bytearray(byts)
            if n == victim:
                for _m in range(rng.integers(1, 4)):
                    b[rng.integers(0, len(b))] = rng.integers(0, 256)
            (work / n).write_bytes(bytes(b))
        t0 = time.time()
        try:
            src = open_source(str(work / "scene.mrf"))
            info = MRF.read_info(src)
            MRF.read_window(src, info, 0, 0,
                            min(16, info.width), min(16, info.height))
        except _OK:
            pass
        except FileNotFoundError:
            pass    # mutated DataFile/IndexFile path: a loud I/O error
        assert time.time() - t0 < 2.0


def test_lazy_adapter_paths_grib_netcdf():
    """r11: the scan/window split gave GRIB and NetCDF NEW metadata and
    windowed-decode code paths (grib2.scan_*/read_info/read_window,
    netcdf._cdf_meta/_h5_meta/windowed reads) that the parse-level
    fuzzes above never enter.  Mutate bytes and drive the ADAPTER
    surface: the contract exceptions only, and never multi-second work
    on a KB-scale corrupt file."""
    from rasterframes_spark.sources import grib1 as G1
    from rasterframes_spark.sources import grib2 as GB
    from rasterframes_spark.sources import hdf5 as H5
    from rasterframes_spark.sources import netcdf as NC

    rng = np.random.default_rng(7)
    a = rng.integers(0, 3000, (24, 31)).astype("float64")
    hw = H5.H5Writer()
    hw.create_dataset("v", a.astype("int16"), chunks=(8, 8),
                      compression="gzip")
    seeds = [
        ("g2", GB.write_grib2([a, a * 2], (0.0, 0.0, 31.0, 24.0),
                              nbits=11)),
        ("g2c", GB.write_grib2([a], (0.0, 0.0, 31.0, 24.0),
                               packing="complex_diff")),
        ("g1", G1.write_grib1([a], (0.0, 0.0, 31.0, 24.0), nbits=11)),
        ("nc3", NC.write_netcdf(
            {"v": (("y", "x"), a), "y": (("y",), np.arange(24.0)),
             "x": (("x",), np.arange(31.0))}, {"y": 24, "x": 31})),
        # record-dim variant: a corrupt numrecs with recsize 0 used to
        # spin the per-record read loop on a constant offset forever
        # (r11 self-review finding — the fit-the-file guard pins it)
        ("nc3r", NC.write_netcdf(
            {"v": (("t", "y", "x"), np.stack([a, a + 1]).astype("float64")),
             "y": (("y",), np.arange(24.0)),
             "x": (("x",), np.arange(31.0))},
            {"t": None, "y": 24, "x": 31})),
        ("nc4", hw.tobytes()),
    ]
    for name, good in seeds:
        is_nc = name.startswith("nc")
        mod, srcf = (NC, NC._NCBytesSrc) if is_nc else (GB, GB._BytesSrc)
        for trial in range(400):
            b = bytearray(good)
            for _m in range(rng.integers(1, 5)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            t0 = time.time()
            try:
                src = srcf(bytes(b))
                info = mod.read_info(src)
                mod.read_window(src, info, 1, 2, 5, 7, band=0)
            except _OK:
                pass
            except IndexError as e:
                # the adapters' own typed band guard only
                assert "out of range" in str(e), (name, trial, e)
            assert time.time() - t0 < 2.0, (name, trial)
        for cut in rng.integers(1, len(good), size=60):
            try:
                src = srcf(good[:int(cut)])
                info = mod.read_info(src)
                mod.read_window(src, info, 0, 0, 4, 4)
            except _OK:
                pass


def test_geojson_geometry_dicts():
    """r13 sweep finding: mutated-but-still-JSON geometry dicts leaked
    KeyError ('type' gone), TypeError (coordinates -> null), and
    IndexError out of read_geojson's pandas UDF — a malformed feature
    in a real crawl must surface as the contract ValueError (one bad
    row), never crash the task.  Nesting is depth-bounded."""
    import json

    from rasterframes_spark.sources.sinks import _geojson_to_geom

    good = json.dumps({"type": "Polygon", "coordinates":
                       [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}).encode()

    def parse(b):
        _geojson_to_geom(json.loads(b.decode("utf-8", errors="strict")))

    _fuzz(good, parse, trials=400)
    for bad in ({}, {"type": "Polygon"}, {"type": "Polygon",
                                          "coordinates": None},
                {"type": "Point", "coordinates": []},
                {"type": "Nope", "coordinates": []},
                {"type": "GeometryCollection", "geometries": [None]},
                "not a dict", None, 7):
        try:
            _geojson_to_geom(bad)
            raise AssertionError(f"accepted {bad!r}")
        except _OK:
            pass
    # depth bomb: nested collections refuse at the bound
    g = {"type": "Point", "coordinates": [1, 2]}
    for _ in range(40):
        g = {"type": "GeometryCollection", "geometries": [g]}
    try:
        _geojson_to_geom(g)
        raise AssertionError("accepted 40-deep nesting")
    except _OK:
        pass


def test_read_geojson_malformed_feature_costs_one_row(spark, tmp_path):
    """The Spark-level form of the r13 geojson finding: a crawl file
    mixing valid and malformed features yields null geometry for the
    bad rows — the batch and its valid rows survive."""
    import json

    from rasterframes_spark.sources.sinks import read_geojson

    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "good", "zone": 1},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4],
                                       [0, 0]]]}},
        {"type": "Feature", "properties": {"name": "bad", "zone": 2},
         "geometry": {"type": "Polygon", "coordinates": None}},
        {"type": "Feature", "properties": {"name": "worse", "zone": 3},
         "geometry": {"type": "Nope", "coordinates": [[1, 2]]}},
    ]}
    p = str(tmp_path / "mixed.geojson")
    with open(p, "w") as f:
        json.dump(gj, f)
    df = read_geojson(spark, p)
    rows = df.select("name", df.geometry.isNotNull().alias("g")).collect()
    assert sorted((r["name"], r["g"]) for r in rows) == [
        ("bad", False), ("good", True), ("worse", False)]
