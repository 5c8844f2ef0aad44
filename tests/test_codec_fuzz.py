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
