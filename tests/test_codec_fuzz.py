"""Mutation-fuzz discipline for every pure-python codec.

Mirrors the JP2 corruption fuzz (test_jp2.py): encode a small valid
artifact, flip 1-4 random bytes, decode. A corrupted file must either
decode (bit flips in payload data are inherently undetectable) or raise
a clean ValueError / NotImplementedError — never hang, never MemoryError,
never leak a raw internal exception (struct.error, KeyError, IndexError,
TypeError, zlib.error ...) to the caller.

Pins found-by-fuzz classes: GeoTIFF corrupted tag counts building
multi-GB struct format strings (uninterruptible hang), type-byte flips
leaking bytes/float into arithmetic, deflate chunks ballooning past the
declared raster size, and NetCDF out-of-range dim ids / bad var types
(IndexError/KeyError in read_netcdf_var).
"""
from __future__ import annotations

import random
import signal

import numpy as np
import pytest

from rasterframes_spark.sources import geotiff, gif, jpeg, netcdf, png
from rasterframes_spark.pipeline import audio

CLEAN = (ValueError, NotImplementedError)
TRIALS = 200


def _fuzz(data: bytes, decode, seed: int = 6, trials: int = TRIALS):
    def on_alarm(sig, frm):
        raise AssertionError("decoder hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(seed)
        for _ in range(trials):
            b = bytearray(data)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                decode(bytes(b))
            except CLEAN:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_geotiff_corruption_fuzz():
    rng = np.random.default_rng(0)
    arr = (rng.integers(0, 97, (48, 64))).astype("float32")
    data = geotiff.write_geotiff(arr, extent=(0.0, 0.0, 64.0, 48.0),
                                 crs="EPSG:4326")
    _fuzz(data, geotiff.read_full)


def test_geotiff_deflate_bounded():
    """A deflate chunk that inflates past its declared raster size is
    rejected instead of ballooning memory."""
    import zlib

    bomb = zlib.compress(b"\x00" * 10_000_000)
    with pytest.raises(ValueError):
        geotiff._decompress(bomb, 8, expected=1000)


def test_png_corruption_fuzz():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    _fuzz(png.encode_png(arr), png.decode_png)


def test_jpeg_corruption_fuzz():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    _fuzz(jpeg.encode_jpeg(arr), jpeg.decode_jpeg)


def test_gif_corruption_fuzz():
    rng = np.random.default_rng(0)
    frames = [np.repeat(rng.integers(0, 16, (40, 40, 1)).astype(np.uint8)
                        * 16, 3, axis=2) for _ in range(3)]
    _fuzz(gif.encode_gif(frames, delay_ms=50), gif.decode_gif)


def test_wav_corruption_fuzz():
    wave = (np.sin(np.linspace(0, 40, 8000)) * 20000).astype(np.int16)
    _fuzz(audio.encode_wav(wave, 8000), audio.decode_wav)


def test_netcdf_corruption_fuzz():
    rng = np.random.default_rng(0)
    data = netcdf.write_netcdf({"t": (("y", "x"), rng.normal(size=(20, 30)))},
                               dims={"y": 20, "x": 30})

    def decode(b):
        info = netcdf.read_netcdf_info(b)
        for name in list(info.vars):
            netcdf.read_netcdf_var(b, name, info)

    _fuzz(data, decode)


# ---------------------------------------------------------------------------
# round-7 codecs: same discipline for Avro/GeoTrellis, ADPCM, progressive
# JPEG, Adam7 PNG, HDF5, FLAC, AIFF/AU, MRF
# ---------------------------------------------------------------------------


def test_avro_container_corruption_fuzz():
    from rasterframes_spark.sources import avro_io

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "int"},
        {"name": "b", "type": "string"},
        {"name": "c", "type": {"type": "array", "items": "long"}},
        {"name": "d", "type": "bytes"}]}
    recs = [{"a": i, "b": f"row{i}", "c": [i, -i, i * 7],
             "d": bytes(range(i % 7))} for i in range(20)]
    data = avro_io.write_container(recs, schema, codec="deflate")
    _fuzz(data, avro_io.read_container)


def test_geotrellis_kv_corruption_fuzz():
    import zlib

    from rasterframes_spark.sources import geotrellis as gt
    from rasterframes_spark.sources.avro_io import encode_binary

    schema = gt._kv_schema()
    rng = np.random.default_rng(4)
    pairs = [{"_1": {"col": c, "row": r},
              "_2": {"_type": "IntArrayTile", "cols": 8, "rows": 8,
                     "cells": [int(v) for v in rng.integers(-99, 99, 64)],
                     "noDataValue": -2147483648}}
             for c in range(2) for r in range(2)]
    raw = encode_binary({"pairs": pairs}, schema)
    data = zlib.compress(raw)
    _fuzz(data, lambda b: gt.decode_kv_record(b, schema))


@pytest.mark.parametrize("fmt", ["ima", "ms"])
def test_adpcm_wav_corruption_fuzz(fmt):
    from rasterframes_spark.sources.adpcm import write_adpcm_wav

    wave = (np.sin(np.linspace(0, 60, 2100)) * 18000).astype(np.int16)
    _fuzz(write_adpcm_wav(wave, 8000, fmt=fmt), audio.decode_wav,
          trials=120)


def test_jpeg_progressive_corruption_fuzz():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    _fuzz(jpeg.encode_jpeg(arr, progressive=True), jpeg.decode_jpeg)


def test_png_adam7_corruption_fuzz():
    from conftest import make_interlaced_png

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (33, 29, 3)).astype(np.uint8)
    _fuzz(make_interlaced_png(img), png.decode_png)


def test_hdf5_corruption_fuzz():
    from rasterframes_spark.sources.hdf5 import H5File, H5Writer

    rng = np.random.default_rng(7)
    w = H5Writer()
    w.create_dataset("t", (rng.random((20, 30)) * 50).astype("float32"),
                     chunks=(8, 8), compression="gzip",
                     attrs={"scale_factor": 0.5, "units": "K"})
    w.create_dataset("g/n", rng.integers(0, 9, (6, 6)).astype("int16"))
    data = w.tobytes()

    def decode(b):
        f = H5File(b)
        for ds in f.datasets.values():
            ds.read()
            dict(ds.attrs)

    _fuzz(data, decode)


def test_flac_corruption_fuzz():
    from rasterframes_spark.sources.flac import decode_flac, encode_flac

    rng = np.random.default_rng(8)
    wave = (np.sin(np.linspace(0, 80, 3000)) * 12000
            + rng.normal(0, 300, 3000)).astype(np.int16)
    data = encode_flac(np.stack([wave, wave // 2], 1), 8000,
                       blocksize=512, stereo="mid-side")
    _fuzz(data, decode_flac)


def test_aiff_au_corruption_fuzz():
    import os

    from rasterframes_spark.sources.aiff_au import decode_aiff, decode_au

    fix = os.path.join(os.path.dirname(__file__), "fixtures")
    with open(os.path.join(fix, "pluck-pcm16.aiff"), "rb") as f:
        _fuzz(f.read(), decode_aiff, trials=120)
    with open(os.path.join(fix, "pluck-ulaw.au"), "rb") as f:
        _fuzz(f.read(), decode_au, trials=120)


def test_mrf_corruption_fuzz(tmp_path):
    """MRF is a 3-file format: mutate each sibling (XML meta, 16-byte
    index records, page data) independently; the reader must fail clean
    on all of them."""
    import os

    from rasterframes_spark.sources import mrf
    from rasterframes_spark.sources.rangeio import RangeSource

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, (70, 90)).astype(np.uint8)
    base = tmp_path / "f.mrf"
    mrf.write_mrf(str(base), arr, extent=(0.0, 0.0, 90.0, 70.0),
                  page_size=(32, 32), compression="PNG")
    files = sorted(os.listdir(tmp_path))
    originals = {fn: (tmp_path / fn).read_bytes() for fn in files}

    def on_alarm(sig, frm):
        raise AssertionError("MRF reader hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(10)
        for trial in range(60):
            victim = files[trial % len(files)]
            b = bytearray(originals[victim])
            for _ in range(random.randint(1, 4)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            (tmp_path / victim).write_bytes(bytes(b))
            signal.alarm(10)
            try:
                src = RangeSource(str(base))
                info = mrf.read_info(src)
                mrf.read_window(src, info, 0, 0, info.width, info.height)
            except CLEAN:
                pass
            finally:
                signal.alarm(0)
                (tmp_path / victim).write_bytes(originals[victim])
    finally:
        signal.signal(signal.SIGALRM, old)


def test_webm_corruption_fuzz():
    from rasterframes_spark.sources.webm import read_webm_info, write_webm

    rng = np.random.default_rng(11)
    frames = [bytes(rng.integers(0, 256, 24).astype("u1")) for _ in range(6)]
    data = write_webm(frames, [0, 400, 800, 1200, 1600, 2000],
                      [True, False, False, True, False, False])
    _fuzz(data, read_webm_info)


def test_pdf_corruption_fuzz():
    from rasterframes_spark.sources.pdf import pdf_extract_text, write_pdf

    data = write_pdf(["the quick brown fox.", "jumps over the lazy dog.",
                      "with (parens) and \\slashes\\ too."])
    _fuzz(data, pdf_extract_text)


def test_pdf_real_fixture_corruption_fuzz():
    import os

    path = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
    if not os.path.exists(path):
        pytest.skip("OS doc PDF not present")
    from rasterframes_spark.sources.pdf import pdf_extract_text

    with open(path, "rb") as f:
        data = f.read()
    # xref-stream + ObjStm path under mutation; fewer trials (full-doc
    # decode per trial)
    _fuzz(data, lambda b: pdf_extract_text(b, pages=[0]), trials=40)


def test_warc_corruption_fuzz():
    from rasterframes_spark.sources.warc import iter_warc_records, write_warc

    recs = [({"WARC-Type": "response",
              "WARC-Target-URI": f"https://x.org/{i}"},
             b"HTTP/1.1 200 OK\r\n\r\nbody " + bytes([65 + i]) * 30)
            for i in range(4)]
    for gz in (False, True):
        _fuzz(write_warc(recs, gzip_members=gz),
              lambda b: list(iter_warc_records(b)), trials=150)


def test_docx_epub_corruption_fuzz():
    from conftest import make_interlaced_png  # noqa: F401  (import check)
    import sys

    sys.path.insert(0, "tests")
    from test_office_docs import make_docx, make_epub

    from rasterframes_spark.sources.office import (
        read_docx_text, read_epub_text)

    _fuzz(make_docx([["alpha beta gamma"], ["delta"]]), read_docx_text,
          trials=120)
    _fuzz(make_epub(["<html><body><p>chapter text.</p></body></html>"]),
          read_epub_text, trials=120)


def test_man_corruption_fuzz():
    import os

    from rasterframes_spark.sources.office import read_man_text

    path = "/usr/share/man/man1/ls.1.gz"
    if not os.path.exists(path):
        pytest.skip("man pages not present")
    with open(path, "rb") as f:
        _fuzz(f.read(), read_man_text, trials=120)


def test_vrt_corruption_fuzz():
    """r12 fuzz finding: a mutated rasterXSize/rasterYSize attribute
    name made ``int(root.get(...))`` raise TypeError(None), and a
    short GeoTransform raised IndexError — both now the contract
    ValueError.  The manifest parser must honor the corrupt-input
    contract like every binary codec (XML mutations often still parse
    as XML)."""
    from rasterframes_spark.sources.vrt import _parse

    data = b"""<VRTDataset rasterXSize="64" rasterYSize="64">
 <SRS>EPSG:32618</SRS>
 <GeoTransform>0,1,0,64,0,-1</GeoTransform>
 <VRTRasterBand dataType="UInt16" band="1">
  <NoDataValue>0</NoDataValue>
  <SimpleSource>
   <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
   <SourceBand>1</SourceBand>
   <SrcRect xOff="0" yOff="0" xSize="64" ySize="64"/>
   <DstRect xOff="0" yOff="0" xSize="64" ySize="64"/>
  </SimpleSource>
 </VRTRasterBand>
</VRTDataset>"""

    def parse_nocache(b: bytes):
        _parse.cache_clear()        # lru_cache would mask repeats
        return _parse(b, "/tmp")

    _fuzz(data, parse_nocache, seed=9, trials=600)
    # the two found classes, pinned directly
    with pytest.raises(ValueError):
        parse_nocache(data.replace(b"rasterXSize", b"rasterXSiz3"))
    with pytest.raises(ValueError):
        parse_nocache(data.replace(b"0,1,0,64,0,-1", b"0,1,0"))


def test_png_dimension_bomb_is_valueerror():
    """r12 fuzz: a mutated IHDR height (~2^31) reached _unfilter's
    np.zeros as a 172 GiB allocation (MemoryError).  Dimensions now
    plausibility-cap, the inflate is bounded by the spec-exact
    expected length, and a size/dimension mismatch is ValueError."""
    import struct
    import time

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (20, 28, 3)).astype("uint8")
    good = png.encode_png(img)
    # IHDR payload starts at offset 16: width(4) height(4) ...
    bomb = bytearray(good)
    bomb[20:24] = struct.pack(">I", 0x80000000)
    t0 = time.time()
    with pytest.raises(ValueError):
        png.decode_png(bytes(bomb))
    assert time.time() - t0 < 0.5
    # short IDAT for the declared dims is a mismatch, not a crash
    short = bytearray(good)
    short[20:24] = struct.pack(">I", 21)        # one extra row declared
    with pytest.raises(ValueError):
        png.decode_png(bytes(short))


def test_jpeg_dimension_vs_stream_size_bound():
    """r12 fuzz: a mutated SOF height just under the absolute pixel cap
    bought ~9 s of Huffman decode from a 1 KB stream.  Frames needing
    under ~0.03 bpp are refused as implausible."""
    import time

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 16, 3)).astype("uint8")
    good = jpeg.encode_jpeg(img)
    i = good.find(b"\xff\xc0")
    assert i > 0
    bomb = bytearray(good)
    # SOF0 payload: len(2) prec(1) height(2) width(2) — set h = 65000
    bomb[i + 5:i + 7] = (65000).to_bytes(2, "big")
    t0 = time.time()
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(bomb))
    assert time.time() - t0 < 0.5


def test_jpeg_sof_zero_components_is_contract_error():
    """ADVICE r13: nc==0 in a SOF used to survive to `max()` over an
    empty comps list — the opaque 'max() arg is an empty sequence'
    ValueError.  It must be an explicit, self-describing contract
    error raised at the SOF itself."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (8, 8, 3)).astype("uint8")
    good = jpeg.encode_jpeg(img)
    i = good.find(b"\xff\xc0")
    assert i > 0
    bad = bytearray(good)
    bad[i + 9] = 0  # SOF0 payload byte 5 (after len2): component count
    with pytest.raises(ValueError, match="zero components"):
        jpeg.decode_jpeg(bytes(bad))


def test_mp4_stts_run_count_bomb_expands_lazily():
    """r12 fuzz: np.repeat over stts run counts materialized the FULL
    declared total (a corrupt u4 count of ~2^32 = tens of GB, a
    measured 393 s parse of a 1 KB file) before the [:n] slice.  Only
    the runs the first n samples need may expand."""
    import time

    from rasterframes_spark.sources.mp4 import _expand_tables

    tables = {
        "stsz": np.array([10, 10], dtype=np.int64),
        "stco": np.array([0], dtype=np.int64),
        "stsc": np.array([[1, 2, 1]], dtype=np.uint32),
        "stts": np.array([[0xFFFFFFFF, 5]], dtype=np.uint32),
    }
    t0 = time.time()
    sizes, offsets, dts, sync = _expand_tables(tables, file_size=100)
    assert time.time() - t0 < 0.5
    assert list(dts) == [0, 5]


def test_jpeg_plausibility_bound_scales_with_sampling_factors():
    """ADVICE r12 #1: the old h*w > 256*len(buf) form assumed luma
    holds the max sampling factors.  A frame whose max factor sits on a
    NON-luma component has fewer luma blocks per pixel and must not be
    rejected as implausible; the bound now counts actual blocks.  This
    header-only stream (176x176, comps 1x1 / 2x2 / 1x1, 100 bytes)
    fails the OLD bound (30976 > 25600) but is spec-plausible (726
    blocks <= 800 bits available) — it must sail past the plausibility
    check and fail only for having no scan."""
    import struct

    # payload: precision(1) h(2) w(2) nc(1) then per-comp id,hv,tq
    payload = struct.pack(">BHHB", 8, 176, 176, 3)
    payload += bytes([1, 0x11, 0])      # comp 1: 1x1
    payload += bytes([2, 0x22, 1])      # comp 2: 2x2  (max, non-luma)
    payload += bytes([3, 0x11, 1])      # comp 3: 1x1
    seg = b"\xff\xc0" + struct.pack(">H", 2 + len(payload)) + payload
    pad = b"\xff\xfe" + struct.pack(">H", 2 + 73) + b"p" * 73
    buf = b"\xff\xd8" + seg + pad + b"\xff\xd9"
    assert len(buf) == 100
    with pytest.raises(ValueError, match="no scan data"):
        jpeg.decode_jpeg(buf)
