"""Cross-encoder image parity: one source image, five real encoders.

CPython's test suite ships the SAME 16x16 Python-logo image encoded by
real external encoders — libpng, libjpeg (baseline + a second variant),
giflib, libtiff, libwebp — plus the raw-RGB netpbm P6, which IS the
pixel ground truth.  Decoding every compressed variant with this repo's
codecs and comparing against the raw pixels breaks the own-encoder
closed loop for PNG/JPEG/GIF/TIFF in one stroke:

- PNG and TIFF are lossless -> must match the P6 BIT-EXACTLY;
- BMP (32 bpp BI_BITFIELDS) is raw -> RGB planes bit-exact;
- JPEG is lossy 4:2:0 over hard edges -> PSNR-bounded;
- GIF is palette-quantized with transparency -> foreground-close.
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def truth():
    from rasterframes_spark.sources.simple_images import decode_ppm

    a = decode_ppm(_read("python.ppm"))
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8
    return a


def test_pgm_variant_is_grayscale_of_same_image(truth):
    from rasterframes_spark.sources.simple_images import decode_ppm

    g = decode_ppm(_read("python.pgm"))
    assert g.shape == (16, 16)
    # it's a real grayscale conversion of the same logo: strongly
    # correlated with the luma of the RGB truth
    luma = truth.astype(float) @ [0.299, 0.587, 0.114]
    c = np.corrcoef(g.ravel(), luma.ravel())[0, 1]
    assert c > 0.98


def test_png_bit_exact_vs_raw(truth):
    from rasterframes_spark.sources.png import decode_png

    np.testing.assert_array_equal(decode_png(_read("python.png")), truth)


def test_tiff_bit_exact_vs_raw(truth):
    from rasterframes_spark.sources import geotiff as GT

    data = _read("python.tiff")
    info = GT.read_info(data)
    assert (info.width, info.height, info.bands) == (16, 16, 4)
    rgb = np.stack([GT.read_window(data, info, 0, 0, 16, 16, b)
                    for b in range(3)], axis=-1)
    np.testing.assert_array_equal(rgb, truth)
    # 4th band is alpha: fully opaque where the logo has color
    alpha = GT.read_window(data, info, 0, 0, 16, 16, 3)
    assert alpha.max() == 255


def test_bmp_bit_exact_vs_raw(truth):
    from rasterframes_spark.sources.simple_images import decode_bmp

    a = decode_bmp(_read("python.bmp"))
    assert a.shape[2] in (3, 4)
    np.testing.assert_array_equal(a[:, :, :3], truth)


@pytest.mark.parametrize("name", ["python.jpg", "python-raw.jpg"])
def test_jpeg_close_to_raw(truth, name):
    from rasterframes_spark.sources.jpeg import decode_jpeg

    j = decode_jpeg(_read(name))
    assert j.shape == (16, 16, 3)
    e = j.astype(float) - truth
    psnr = 10 * np.log10(255 ** 2 / (e * e).mean())
    # 4:2:0 chroma subsampling over 1-px colored edges on a 16x16 image
    # is brutal; a broken decoder lands near ~10 dB, a correct one ~23
    assert psnr > 20.0
    # and the luma plane is much tighter than the chroma-bled RGB
    el = (j.astype(float) @ [0.299, 0.587, 0.114]) \
        - (truth.astype(float) @ [0.299, 0.587, 0.114])
    assert 10 * np.log10(255 ** 2 / (el * el).mean()) > 26.0


def test_gif_close_on_opaque_pixels(truth):
    from rasterframes_spark.sources.gif import decode_gif

    g = decode_gif(_read("python.gif"))[0][1]
    assert g.shape[:2] == (16, 16)
    # palette quantization keeps almost every pixel within a few counts;
    # a handful of pixels use the GIF transparent index (composed against
    # the GIF background color, which differs from the raw flattening) —
    # so assert the DISTRIBUTION: >= 95% of pixels nearly exact
    diff = np.abs(g[:, :, :3].astype(int) - truth.astype(int)).sum(axis=2)
    assert (diff <= 30).mean() >= 0.95
    assert np.median(diff) <= 4


def test_image_metadata_covers_the_family(spark):
    from rasterframes_spark.pipeline.multimodal import image_metadata

    names = ["python.png", "python.jpg", "python.gif", "python.tiff",
             "python.bmp", "python.ppm", "python.pgm", "python.webp"]
    df = spark.createDataFrame(
        [(i, bytearray(_read(n))) for i, n in enumerate(names)],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in image_metadata(df).collect()}
    assert len(rows) == len(names)
    for i, n in enumerate(names):
        assert (rows[i]["width"], rows[i]["height"]) == (16, 16), n
    assert rows[names.index("python.pgm")]["channels"] == 1
    assert rows[names.index("python.webp")]["channels"] == 4


def test_decode_image_auto_over_mixed_real_files(spark, truth):
    from rasterframes_spark.pipeline.multimodal import decode_image

    names = ["python.png", "python.jpg", "python.bmp", "python.ppm"]
    df = spark.createDataFrame(
        [(i, bytearray(_read(n))) for i, n in enumerate(names)],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in
            decode_image(df, decode="auto").collect()}
    assert len(rows) == len(names)
    for i in rows:
        r = rows[i]
        assert (r["height"], r["width"]) == (16, 16)
        a = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(
            16, 16, r["channels"])
        # every decoded variant agrees with the raw truth on the whole
        # image to lossless/lossy tolerance
        e = a[:, :, :3].astype(float) - truth
        assert (e == 0).all() or 10 * np.log10(
            255 ** 2 / (e * e).mean()) > 20.0, names[i]


def test_decode_image_tiff_payload(spark, truth):
    """decode_image handles real-libtiff payloads via the GeoTIFF codec
    (sniffed or explicit) — bit-exact RGB vs the raw truth."""
    from rasterframes_spark.pipeline.multimodal import decode_image

    df = spark.createDataFrame([(1, bytearray(_read("python.tiff")))],
                               "media_id long, payload binary")
    for mode in ("tiff", "auto"):
        r = decode_image(df, decode=mode).collect()[0]
        assert (r["height"], r["width"]) == (16, 16)
        a = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(
            16, 16, r["channels"])
        np.testing.assert_array_equal(a[:, :, :3], truth)
