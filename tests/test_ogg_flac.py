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


class TestOggFlac:
    """Ogg-FLAC mapping (r7): packet assembly, native re-splice,
    metadata codec detection, and the decode_audio auto path."""

    def _native(self, n=6000, rate=16000):
        import numpy as np

        from rasterframes_spark.sources.flac import encode_flac

        t = np.arange(n)
        x = (2000 * np.sin(t / 15)).astype(np.int32)
        return x, encode_flac(x, rate, bps=16, blocksize=1024)

    def test_roundtrip_through_ogg(self):
        import numpy as np

        from rasterframes_spark.sources.flac import decode_flac
        from rasterframes_spark.sources.ogg_flac import (
            ogg_flac_to_native, write_ogg_flac)

        x, native = self._native()
        ogg = write_ogg_flac(native)
        back = ogg_flac_to_native(ogg)
        y, rate, bps = decode_flac(back)
        assert (rate, bps) == (16000, 16)
        np.testing.assert_array_equal(y[:, 0], x)

    def test_metadata_detects_flac_codec(self):
        from rasterframes_spark.sources.ogg_flac import (
            read_ogg_info, write_ogg_flac)

        _, native = self._native(n=8000)
        info = read_ogg_info(write_ogg_flac(native))
        assert (info.codec, info.sample_rate, info.channels) == \
            ("flac", 16000, 1)
        assert info.duration_ms == pytest.approx(500.0)

    def test_packet_assembly_across_pages(self):
        from rasterframes_spark.sources.ogg_flac import (
            _ogg_page, ogg_packets)

        # a 700-byte packet spans lacing values 255,255,190
        big = bytes(range(256)) * 3
        page = _ogg_page(1, 0, 0, big[:700])
        got = list(ogg_packets(page))
        assert got == [big[:700]]
        # continued packet across two pages: emit manually
        import struct as _s
        lac1 = bytes([255, 255])
        hdr1 = (b"OggS" + bytes([0, 0]) + _s.pack("<q", 0)
                + _s.pack("<I", 1) + _s.pack("<I", 0) + b"\x00" * 4
                + bytes([2]) + lac1)
        part1 = big[:510]
        lac2 = bytes([90])
        hdr2 = (b"OggS" + bytes([0, 1]) + _s.pack("<q", 0)
                + _s.pack("<I", 1) + _s.pack("<I", 1) + b"\x00" * 4
                + bytes([1]) + lac2)
        part2 = big[510:600]
        got = list(ogg_packets(hdr1 + part1 + hdr2 + part2))
        assert got == [big[:600]]

    def test_decode_audio_auto_ogg_flac(self, spark):
        import numpy as np

        from rasterframes_spark.pipeline.audio import (
            audio_metadata, decode_audio)
        from rasterframes_spark.sources.ogg_flac import write_ogg_flac

        x, native = self._native()
        ogg = write_ogg_flac(native)
        df = spark.createDataFrame(
            [(1, bytearray(ogg)), (2, bytearray(native))],
            "media_id long, payload binary")
        rows = {r["media_id"]: r for r in
                decode_audio(df, decode="auto").collect()}
        a = np.frombuffer(bytes(rows[1]["samples"]), dtype="<f8")
        b = np.frombuffer(bytes(rows[2]["samples"]), dtype="<f8")
        np.testing.assert_array_equal(a, b)
        meta = {r["media_id"]: r["format"] for r in
                audio_metadata(df).collect()}
        assert meta == {1: "ogg-flac", 2: "flac"}


class TestOggFlacMappingSpec:
    def test_header_count_excludes_first_packet(self):
        """The 16-bit count names FOLLOWING header packets (xiph mapping
        spec) — `flac --ogg` writes 1 for its VorbisComment.  Regression:
        the count was read as including the identification packet, so the
        last metadata packet spliced into the audio as garbage."""
        import struct

        import numpy as np

        from rasterframes_spark.sources.flac import decode_flac, encode_flac
        from rasterframes_spark.sources.ogg_flac import (ogg_flac_to_native,
                                                         write_ogg_flac)

        x = np.arange(9000, dtype=np.int32) % 512 - 256
        native = encode_flac(x, 16000)
        ogg = write_ogg_flac(native)
        i = ogg.index(b"\x7fFLAC") + 7
        assert struct.unpack_from(">H", ogg, i)[0] == 1  # the VorbisComment
        y, sr, _ = decode_flac(ogg_flac_to_native(ogg))
        np.testing.assert_array_equal(y.ravel(), x)

        # count=0 (unknown): reader must sniff the frame sync instead
        unk = bytearray(ogg)
        unk[i:i + 2] = b"\x00\x00"
        y2, _, _ = decode_flac(ogg_flac_to_native(bytes(unk)))
        np.testing.assert_array_equal(y2.ravel(), x)

    def test_truncated_first_packet_raises_valueerror(self):
        from rasterframes_spark.sources.ogg_flac import ogg_flac_to_native
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ogg_flac_to_native(b"OggS" + b"\x00" * 30)
