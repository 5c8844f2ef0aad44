"""Ogg (Vorbis/Opus) + FLAC header-metadata tests."""
from __future__ import annotations

import random
import signal

import pytest

from rasterframes_spark.sources import ogg_flac as O


def test_flac_streaminfo_roundtrip():
    b = O.write_flac_header(96000, 2, 24, 1_234_567)
    i = O.read_flac_info(b)
    assert (i.container, i.codec) == ("flac", "flac")
    assert (i.sample_rate, i.channels, i.bits_per_sample) == (96000, 2, 24)
    assert i.n_samples == 1_234_567
    assert i.duration_ms == pytest.approx(1_234_567 * 1000.0 / 96000)


def test_flac_36bit_total_samples():
    big = (1 << 35) + 12345
    i = O.read_flac_info(O.write_flac_header(44100, 1, 16, big))
    assert i.n_samples == big


def test_ogg_opus_duration_minus_preskip():
    n = 48000 * 7 + 191                    # ~7 s at 48 kHz
    b = O.write_ogg_opus(n, channels=2, pre_skip=312)
    i = O.read_ogg_info(b)
    assert (i.container, i.codec, i.sample_rate, i.channels) == \
        ("ogg", "opus", 48000, 2)
    assert i.n_samples == n
    assert i.duration_ms == pytest.approx(n * 1000.0 / 48000)


def test_ogg_vorbis_duration():
    n = 44100 * 3 + 77
    i = O.read_ogg_info(O.write_ogg_vorbis(n, rate=44100, channels=1))
    assert (i.codec, i.sample_rate, i.channels) == ("vorbis", 44100, 1)
    assert i.duration_ms == pytest.approx(n * 1000.0 / 44100)


def test_ogg_trailing_junk_tolerated():
    b = O.write_ogg_vorbis(1000) + b"not-a-page-at-all"
    assert O.read_ogg_info(b).n_samples == 1000


def test_not_audio_raises():
    with pytest.raises(ValueError):
        O.read_flac_info(b"fLaX" + b"\x00" * 100)
    with pytest.raises(ValueError):
        O.read_ogg_info(b"\x00" * 100)
    with pytest.raises(ValueError):
        # Ogg pages with no recognizable codec header
        O.read_ogg_info(O._ogg_page(1, 0, 0, b"mystery-codec-header"))


def test_corruption_fuzz():
    datasets = [O.write_flac_header(44100, 2, 16, 500000),
                O.write_ogg_opus(480000),
                O.write_ogg_vorbis(441000)]

    def on_alarm(sig, frm):
        raise AssertionError("parser hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        for data in datasets:
            random.seed(4)
            for _ in range(200):
                b = bytearray(data)
                for _ in range(random.randint(1, 4)):
                    b[random.randrange(0, len(b))] = random.randrange(256)
                signal.alarm(10)
                try:
                    if bytes(b[:4]) == b"fLaC":
                        O.read_flac_info(bytes(b))
                    else:
                        O.read_ogg_info(bytes(b))
                except ValueError:
                    pass
                finally:
                    signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_spark_audio_metadata_all_formats(spark):
    import numpy as np

    from rasterframes_spark.pipeline.audio import audio_metadata, encode_wav
    from rasterframes_spark.sources.mpeg_audio import write_mp3_frames

    rows = [
        (1, bytearray(encode_wav(np.zeros(8000), 8000))),
        (2, bytearray(write_mp3_frames(20, kbps=64, rate=16000))),
        (3, bytearray(O.write_ogg_opus(96000, pre_skip=0))),
        (4, bytearray(O.write_ogg_vorbis(22050, rate=22050))),
        (5, bytearray(O.write_flac_header(48000, 2, 16, 48000 * 2))),
        (6, bytearray(b"junk-payload-none-of-the-above")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_metadata(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["format"] == "wav"
    assert out[2]["format"] == "mp3"
    assert out[3]["format"] == "ogg-opus"
    assert out[3]["duration_ms"] == pytest.approx(2000.0)
    assert out[4]["format"] == "ogg-vorbis"
    assert out[4]["duration_ms"] == pytest.approx(1000.0)
    assert out[5]["format"] == "flac"
    assert out[5]["duration_ms"] == pytest.approx(2000.0)
