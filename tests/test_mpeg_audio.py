"""MPEG audio (MP3) frame-header parser tests + the audio_metadata op."""
from __future__ import annotations

import random
import signal

import numpy as np
import pytest

from rasterframes_spark.sources import mpeg_audio as M


def test_cbr_walk_exact():
    data = M.write_mp3_frames(100, kbps=128, rate=44100, channels=2)
    i = M.read_mp3_info(data)
    assert (i.version, i.layer, i.sample_rate, i.channels) == \
        ("MPEG1", 3, 44100, 2)
    assert i.n_frames == 100 and not i.vbr
    assert i.bitrate_kbps == 128
    assert i.duration_ms == pytest.approx(100 * 1152 * 1000.0 / 44100)


@pytest.mark.parametrize("rate,ver,spf", [
    (48000, "MPEG1", 1152), (32000, "MPEG1", 1152),
    (22050, "MPEG2", 576), (16000, "MPEG2", 576),
    (8000, "MPEG2.5", 576), (11025, "MPEG2.5", 576),
])
def test_versions_and_rates(rate, ver, spf):
    data = M.write_mp3_frames(40, kbps=64, rate=rate, channels=1)
    i = M.read_mp3_info(data)
    assert (i.version, i.sample_rate, i.channels) == (ver, rate, 1)
    assert i.samples_per_frame == spf
    assert i.duration_ms == pytest.approx(40 * spf * 1000.0 / rate)


def test_layer2_and_layer1():
    i2 = M.read_mp3_info(M.write_mp3_frames(20, kbps=96, layer=2))
    assert (i2.layer, i2.samples_per_frame) == (2, 1152)
    i1 = M.read_mp3_info(M.write_mp3_frames(20, kbps=96, layer=1))
    assert (i1.layer, i1.samples_per_frame) == (1, 384)


def test_vbr_average_bitrate():
    pat = [64, 128, 192, 256]
    data = M.write_mp3_frames(80, rate=44100, vbr_pattern=pat)
    i = M.read_mp3_info(data)
    assert i.vbr
    assert i.bitrate_kbps == pytest.approx(sum(pat) / len(pat))
    assert i.n_frames == 80


def test_id3v2_skip_and_leading_junk():
    frames = M.write_mp3_frames(30, kbps=128)
    tag_body = b"\x00" * 200
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
         (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]) + tag_body
    i = M.read_mp3_info(id3 + frames)
    assert i.n_frames == 30
    # junk before the stream, including a fake lone sync word
    junk = b"garbage\xff\xe3junk-no-second-frame" + b"\x00" * 50
    i2 = M.read_mp3_info(junk + frames)
    assert i2.n_frames == 30


def test_xing_vbr_tag():
    """A Xing frame count overrides the walked count for duration."""
    frames = M.write_mp3_frames(10, kbps=128, rate=44100, channels=2)
    # inject Xing into the first frame's side-info region (MPEG1 stereo: 32B)
    b = bytearray(frames)
    p = 4 + 32
    b[p:p + 4] = b"Xing"
    b[p + 4:p + 8] = (1).to_bytes(4, "big")          # flags: frames present
    b[p + 8:p + 12] = (500).to_bytes(4, "big")       # claimed total frames
    i = M.read_mp3_info(bytes(b))
    assert i.xing_frames == 500 and i.vbr
    assert i.duration_ms == pytest.approx(500 * 1152 * 1000.0 / 44100)


def test_tail_junk_tolerated():
    data = M.write_mp3_frames(25, kbps=128) + b"TAG" + b"\x00" * 125
    assert M.read_mp3_info(data).n_frames == 25


def test_not_mp3_raises():
    with pytest.raises(ValueError):
        M.read_mp3_info(b"\x00" * 5000)
    with pytest.raises(ValueError):
        M.read_mp3_info(b"RIFF....WAVE" + b"\x00" * 100)


def test_corruption_fuzz():
    data = M.write_mp3_frames(40, kbps=128)

    def on_alarm(sig, frm):
        raise AssertionError("parser hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(3)
        for _ in range(300):
            b = bytearray(data)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                M.read_mp3_info(bytes(b))
            except ValueError:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_spark_audio_metadata(spark):
    from rasterframes_spark.pipeline.audio import audio_metadata, encode_wav

    wave = np.sin(np.linspace(0, 100, 22050))
    rows = [
        (1, bytearray(encode_wav(wave, 22050, bits=16))),
        (2, bytearray(M.write_mp3_frames(50, kbps=192, rate=44100,
                                         channels=2))),
        (3, bytearray(b"unrecognized-bytes")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_metadata(df).collect()}
    assert set(out) == {1, 2}
    w = out[1]
    assert (w["format"], w["sample_rate"], w["channels"]) == ("wav", 22050, 1)
    assert w["duration_ms"] == pytest.approx(1000.0)
    assert w["bitrate_kbps"] == pytest.approx(22050 * 16 / 1000.0)
    m = out[2]
    assert (m["format"], m["sample_rate"], m["channels"]) == ("mp3", 44100, 2)
    assert m["bitrate_kbps"] == 192 and not m["vbr"]
    assert m["duration_ms"] == pytest.approx(50 * 1152 * 1000.0 / 44100)
