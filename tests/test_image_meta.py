"""Header-only image metadata tests: every covered format pinned against
the repo's own encoders (where one exists) or hand-built headers."""
from __future__ import annotations

import random
import signal
import struct

import numpy as np
import pytest

from rasterframes_spark.sources.image_meta import read_image_info


def _rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)) \
        .astype(np.uint8)


def test_png_dims_match_decoder():
    from rasterframes_spark.sources.png import encode_png

    b = encode_png(_rgb(17, 23))
    assert read_image_info(b) == ("png", 23, 17, 3)


def test_jpeg_dims_match_decoder():
    from rasterframes_spark.sources.jpeg import encode_jpeg

    b = encode_jpeg(_rgb(33, 41))
    assert read_image_info(b) == ("jpeg", 41, 33, 3)


def test_gif_dims():
    from rasterframes_spark.sources.gif import encode_gif

    frames = [np.repeat(np.random.default_rng(s)
                        .integers(0, 16, (12, 19, 1)).astype(np.uint8) * 16,
                        3, axis=2) for s in range(2)]
    b = encode_gif(frames)
    assert read_image_info(b) == ("gif", 19, 12, 3)


def test_webp_lossless_dims_and_alpha():
    from rasterframes_spark.sources.webp import encode_webp

    assert read_image_info(encode_webp(_rgb(9, 31))) == ("webp", 31, 9, 3)
    rgba = np.dstack([_rgb(9, 31), np.full((9, 31), 7, np.uint8)])
    assert read_image_info(encode_webp(rgba)) == ("webp", 31, 9, 4)


def test_webp_lossy_header():
    # hand-built minimal VP8 chunk: 3-byte frame tag, start code, dims
    body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    buf = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert read_image_info(buf) == ("webp", 640, 480, 3)


def test_webp_vp8x_canvas():
    body = bytes([0x10]) + bytes(3) + (99).to_bytes(3, "little") \
        + (49).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    buf = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert read_image_info(buf) == ("webp", 100, 50, 4)


def test_avif_ispe():
    from rasterframes_spark.sources.mp4 import _box

    ispe = _box(b"ispe", b"\x00" * 4 + struct.pack(">II", 1280, 720))
    meta = _box(b"meta", b"\x00" * 4
                + _box(b"iprp", _box(b"ipco", ispe)))
    buf = _box(b"ftyp", b"avif" + b"\x00" * 4 + b"avifmif1") + meta
    assert read_image_info(buf) == ("avif", 1280, 720, None)
    heic = _box(b"ftyp", b"heic" + b"\x00" * 4 + b"heicmif1") + meta
    assert read_image_info(heic) == ("heic", 1280, 720, None)


def test_bmp_header():
    hdr = (b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
           + struct.pack("<IiiHH", 40, 77, -55, 1, 24) + b"\x00" * 80)
    assert read_image_info(hdr) == ("bmp", 77, 55, 3)


def test_tiff_dims_match_decoder():
    from rasterframes_spark.sources.geotiff import write_geotiff

    arr = np.arange(15 * 21, dtype=np.float32).reshape(15, 21)
    b = write_geotiff(arr, extent=(0, 0, 21, 15), crs="EPSG:4326")
    assert read_image_info(b) == ("tiff", 21, 15, 1)


def test_unrecognized_raises():
    with pytest.raises(ValueError):
        read_image_info(b"\x00" * 100)
    with pytest.raises(ValueError):
        read_image_info(b"short")


def test_corruption_fuzz():
    from rasterframes_spark.sources.jpeg import encode_jpeg
    from rasterframes_spark.sources.png import encode_png
    from rasterframes_spark.sources.webp import encode_webp

    def on_alarm(sig, frm):
        raise AssertionError("header parser hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        for data in (encode_png(_rgb(20, 20)), encode_jpeg(_rgb(20, 20)),
                     encode_webp(_rgb(20, 20))):
            random.seed(2)
            for _ in range(200):
                b = bytearray(data)
                for _ in range(random.randint(1, 4)):
                    b[random.randrange(0, len(b))] = random.randrange(256)
                signal.alarm(10)
                try:
                    read_image_info(bytes(b))
                except ValueError:
                    pass
                finally:
                    signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_spark_image_metadata(spark):
    from rasterframes_spark.pipeline.multimodal import image_metadata
    from rasterframes_spark.sources.png import encode_png
    from rasterframes_spark.sources.webp import encode_webp

    rows = [(1, bytearray(encode_png(_rgb(10, 14)))),
            (2, bytearray(encode_webp(_rgb(8, 6)))),
            (3, bytearray(b"not-an-image-at-all"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in image_metadata(df).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["format"], out[1]["width"], out[1]["height"]) == \
        ("png", 14, 10)
    assert (out[2]["format"], out[2]["width"], out[2]["height"]) == \
        ("webp", 6, 8)
    assert out[1]["payload_bytes"] == len(rows[0][1])
