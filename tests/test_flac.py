"""FLAC codec (sources/flac.py): round-trip matrix, WAV cross-parity,
malformed-input behavior, and the DataFrame decode path.

No externally-encoded FLAC file exists in this container (no flac/ffmpeg
binary to make one — see tests/test_external_fixtures.py docstring), so
the external anchors are: (a) bit-parity with the independently-tested
WAV path on identical samples, (b) `read_flac_info` (written last round
against the spec, before this codec existed) agreeing with the encoder's
STREAMINFO, and (c) every decoder branch exercised via encoder switches
(stereo decorrelation, LPC, escape partitions, wasted bits...).
"""

import numpy as np
import pytest

from rasterframes_spark.sources.flac import decode_flac, encode_flac


def _sig(n=9000, seed=0, scale=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (scale * np.sin(t / 20)
            + rng.integers(-scale // 15, scale // 15, n)).astype(np.int64)


@pytest.mark.parametrize("kw", [
    {}, {"method": "lpc"}, {"method": "lpc", "lpc_order": 1},
    {"method": "verbatim"}, {"force_escape": True},
    {"partition_order": 3}, {"partition_order": 2, "method": "lpc"},
    {"detect_wasted": True}, {"blocksize": 192}, {"blocksize": 333}])
def test_roundtrip_mono16(kw):
    x = _sig()
    b = encode_flac(x, 22050, bps=16, **kw)
    y, rate, bps = decode_flac(b)
    assert (rate, bps) == (22050, 16)
    np.testing.assert_array_equal(y[:, 0], x)


@pytest.mark.parametrize("bits,scale", [
    (8, 100), (16, 30000), (24, 2 ** 22), (32, 2 ** 30)])
@pytest.mark.parametrize("method", ["auto", "lpc", "verbatim"])
def test_roundtrip_bit_depths(bits, scale, method):
    rng = np.random.default_rng(bits)
    x = (rng.random(5000) * scale).astype(np.int64) - scale // 2
    b = encode_flac(x, 16000, bps=bits, method=method)
    y, _, bp = decode_flac(b)
    assert bp == bits
    np.testing.assert_array_equal(y[:, 0].astype(np.int64), x)


@pytest.mark.parametrize("stereo", [
    "independent", "left-side", "right-side", "mid-side"])
def test_roundtrip_stereo_modes(stereo):
    x = _sig()
    xs = np.stack([x, (x * 0.7).astype(np.int64) + 17], axis=1)
    b = encode_flac(xs, 44100, bps=16, stereo=stereo)
    y, rate, _ = decode_flac(b)
    assert rate == 44100
    np.testing.assert_array_equal(y.astype(np.int64), xs)
    # mid/side floor division must be exact for odd sums too
    odd = np.array([[3, 2], [-3, 2], [1, -2], [-5, -4]], dtype=np.int64)
    b = encode_flac(odd, 8000, bps=16, stereo=stereo)
    y, _, _ = decode_flac(b)
    np.testing.assert_array_equal(y.astype(np.int64), odd)


def test_constant_and_wasted_bits():
    xc = np.full(700, -42, dtype=np.int64)
    y, _, _ = decode_flac(encode_flac(xc, 8000, bps=16, blocksize=256))
    np.testing.assert_array_equal(y[:, 0], xc)
    xw = (_sig() >> 3) << 4
    b_plain = encode_flac(xw, 8000, bps=16)
    b_wast = encode_flac(xw, 8000, bps=16, detect_wasted=True)
    assert len(b_wast) < len(b_plain)  # wasted-bit coding actually engaged
    y, _, _ = decode_flac(b_wast)
    np.testing.assert_array_equal(y[:, 0], xw)


def test_streaminfo_agrees_with_metadata_parser():
    from rasterframes_spark.sources.ogg_flac import read_flac_info

    x = _sig(12345)
    b = encode_flac(x, 32000, bps=24)
    i = read_flac_info(b)
    assert (i.sample_rate, i.channels, i.bits_per_sample, i.n_samples) == \
        (32000, 1, 24, 12345)
    assert i.duration_ms == pytest.approx(12345 / 32.0)


def test_compression_actually_compresses():
    x = _sig(20000)
    b = encode_flac(x, 22050, bps=16)
    assert len(b) < 0.7 * len(x) * 2  # smooth signal ≪ raw PCM


def test_malformed_inputs_raise():
    x = _sig(2000)
    b = bytearray(encode_flac(x, 22050, bps=16))
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")
    with pytest.raises(ValueError):
        decode_flac(bytes(b[:100]))          # truncated mid-frame
    flipped = bytearray(b)
    flipped[-40] ^= 0xFF                     # corrupt frame payload
    with pytest.raises(ValueError):          # CRC-16 must catch it
        decode_flac(bytes(flipped))
    hdrflip = bytearray(b)
    # corrupt a frame-header byte (blocksize field) -> CRC-8 must catch
    frame0 = bytes(b).index(b"\xff\xf8")
    hdrflip[frame0 + 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(hdrflip))


def test_decode_audio_flac_matches_wav_bit_for_bit(spark):
    """The same int16 samples shipped as WAV and as FLAC must produce
    IDENTICAL float64 sample buffers through decode_audio — the WAV path
    (independently validated against stdlib `wave` on external fixtures)
    anchors the FLAC path."""
    from rasterframes_spark.pipeline.audio import decode_audio, encode_wav

    x = _sig(6000, seed=5)
    wav = encode_wav(x / 32767.0, 22050, bits=16)
    fl = encode_flac(x, 22050, bps=16)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(fl))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in decode_audio(df, decode="auto").collect()}
    assert rows[1]["sample_rate"] == rows[2]["sample_rate"] == 22050
    a = np.frombuffer(bytes(rows[1]["samples"]), dtype="<f8")
    b = np.frombuffer(bytes(rows[2]["samples"]), dtype="<f8")
    np.testing.assert_array_equal(a, b)
    # and corrupt FLAC rows drop, not fail
    bad = bytearray(fl)
    bad[-30] ^= 1
    df2 = spark.createDataFrame([(3, bytearray(bad))],
                                "media_id long, payload binary")
    assert decode_audio(df2, decode="flac").count() == 0


def test_audio_features_on_flac(spark):
    from rasterframes_spark.pipeline.audio import audio_features, decode_audio

    x = _sig(4000, seed=9)
    df = spark.createDataFrame(
        [(7, bytearray(encode_flac(x, 16000, bps=16)))],
        "media_id long, payload binary")
    r = audio_features(decode_audio(df, decode="flac")).collect()[0]
    xs = x / 32767.0
    assert r["duration_ms"] == pytest.approx(4000 / 16.0)
    assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(xs * xs))), rel=1e-12)


def test_multibyte_frame_numbers_128_plus_frames():
    """Frame numbers >= 128 take the multi-byte UTF-8-style coding; the
    lead byte is n ones + a zero + 7-n payload bits.  A 130-frame stream
    must round-trip (regression: the encoder emitted one marker bit too
    many, making frame 128 unreadable)."""
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, size=130 * 4096).astype(np.int32)
    blob = encode_flac(x, 8000)
    y, sr, bps = decode_flac(blob)
    assert sr == 8000
    np.testing.assert_array_equal(y.ravel(), x)


def test_utf8_number_coder_matches_utf8_spec():
    """For values in the Unicode range the coding IS UTF-8: compare the
    writer byte-for-byte against chr(v).encode('utf-8')."""
    from rasterframes_spark.sources.flac import (_BitWriter,
                                                 _write_utf8_number)

    for v in [0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF]:
        bw = _BitWriter()
        _write_utf8_number(bw, v)
        assert bytes(bw.out) == chr(v).encode("utf-8"), hex(v)


def test_truncated_stream_raises_valueerror():
    """Corrupt-row-drop contract: truncation surfaces as ValueError,
    never IndexError/struct.error."""
    for blob in [b"fLaC" + b"\x00\x00\x00\x22" + b"\x00" * 10,
                 b"fLaC\x80\x00\x00\x22" + b"\x00" * 10,
                 b"fLaC"]:
        with pytest.raises(ValueError):
            decode_flac(blob)
