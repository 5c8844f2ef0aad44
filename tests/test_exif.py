"""EXIF TIFF-IFD walker (sources/exif.py) + exif_metadata operator."""
from __future__ import annotations

import numpy as np
import pytest

from rasterframes_spark.sources.exif import (
    apply_orientation, read_exif, write_exif_app1)
from rasterframes_spark.sources.jpeg import encode_jpeg


def _jpeg():
    rng = np.random.default_rng(1)
    return encode_jpeg(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))


def test_roundtrip_all_fields():
    tagged = write_exif_app1(_jpeg(), {
        "make": "ACME", "model": "Cam 9", "software": "rfspark",
        "datetime": "2026:08:15 12:00:00", "orientation": 6,
        "datetime_original": "2026:08:14 09:30:00", "iso": 200,
        "exposure_time": (1, 250),
        "gps_lat": 47.6062, "gps_lon": -122.3321})
    e = read_exif(tagged)
    assert (e["make"], e["model"], e["orientation"]) == ("ACME", "Cam 9", 6)
    assert e["datetime"] == "2026:08:15 12:00:00"
    assert e["datetime_original"] == "2026:08:14 09:30:00"
    assert e["iso"] == 200
    assert e["exposure_time"] == pytest.approx(1 / 250)
    assert e["gps_lat"] == pytest.approx(47.6062, abs=1e-4)
    assert e["gps_lon"] == pytest.approx(-122.3321, abs=1e-4)
    # the tagged file still decodes as a JPEG
    from rasterframes_spark.sources.jpeg import decode_jpeg

    np.testing.assert_array_equal(decode_jpeg(tagged), decode_jpeg(_jpeg()))


def test_no_exif_is_empty():
    assert read_exif(_jpeg()) == {}
    assert read_exif(b"\x89PNG\r\n\x1a\nxxxx") == {}


def test_real_libtiff_fixture():
    """The real libtiff-written TIFF anchors the IFD walker externally:
    known Orientation short, DocumentName ascii, WhitePoint rationals."""
    b = open("tests/fixtures/python.tiff", "rb").read()
    e = read_exif(b)
    assert e["orientation"] == 1
    assert (e["width"], e["height"]) == (16, 16)
    assert isinstance(e["document_name"], str) and e["document_name"]


def test_orientation_transforms_invert():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    # inverse pairs: (2,2) (3,3) (4,4) (5,5) (6,8) (7,7) (8,6)
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o, io_ in inv.items():
        out = apply_orientation(apply_orientation(a, o), io_)
        np.testing.assert_array_equal(out, a)
    assert apply_orientation(a, 6).shape == (7, 5, 3)
    with pytest.raises(ValueError):
        apply_orientation(a, 9)


def test_orientation_phash_stability():
    """The point of apply_orientation: a rotated re-upload pHashes back
    to the original after realization."""
    from rasterframes_spark.pipeline.multimodal import phash_bits

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    rot = apply_orientation(img, 6)               # stored rotated
    fixed = apply_orientation(rot, 8)             # realized upright
    assert phash_bits(fixed) == phash_bits(img)
    assert phash_bits(rot) != phash_bits(img)     # without it: different


def test_corruption_fuzz():
    import random
    import signal

    tagged = write_exif_app1(_jpeg(), {
        "make": "ACME", "orientation": 3, "gps_lat": 1.5, "gps_lon": 2.5})

    def on_alarm(sig, frm):
        raise AssertionError("read_exif hung")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(7)
        for _ in range(200):
            b = bytearray(tagged)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                read_exif(bytes(b))
            except ValueError:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_operator(spark):
    from rasterframes_spark.pipeline.multimodal import exif_metadata

    tagged = write_exif_app1(_jpeg(), {
        "make": "ACME", "model": "X", "orientation": 8,
        "gps_lat": -33.9, "gps_lon": 151.2})
    df = spark.createDataFrame(
        [(1, bytearray(tagged)), (2, bytearray(_jpeg())), (3, None)],
        "media_id long, payload binary")
    out = {r.media_id: r for r in exif_metadata(df).collect()}
    assert out[1].make == "ACME" and out[1].orientation == 8
    assert out[1].gps_lat == pytest.approx(-33.9, abs=1e-4)
    assert out[2].make is None and out[2].orientation is None
    assert 3 not in out


def test_truncated_headers_raise_valueerror_not_struct_error():
    """A truncated TIFF header / APP1 body must be ValueError so the
    operator drops the row instead of crashing the task (review)."""
    for bad in (b"II*\x00", b"MM\x00*\x00\x00",
                b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00",
                b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00II*\x00\x08"):
        with pytest.raises(ValueError):
            read_exif(bad)
