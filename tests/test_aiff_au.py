"""AIFF/AIFF-C and Sun AU decoders vs real CPython fixtures, with the
stdlib aifc/sunau/audioop modules as independent oracles (the WAV-vs-
`wave` external-parity discipline, extended to the remaining PCM
containers and G.711)."""

import os
import warnings

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import aifc
    import audioop
    import sunau


def _read(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,bits", [
    ("pluck-pcm8.aiff", 8), ("pluck-pcm16.aiff", 16),
    ("pluck-pcm24.aiff", 24)])
def test_aiff_pcm_bit_parity_with_stdlib(name, bits):
    from rasterframes_spark.sources.aiff_au import decode_aiff

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = aifc.open(os.path.join(FIX, name))
        ch, rate, n = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
        f.close()
    a, r = decode_aiff(_read(name))
    assert (r, a.shape) == (rate, (n, ch))
    flat = a.ravel()
    if bits == 8:
        theirs = np.frombuffer(raw, dtype=np.int8).astype(np.int64)
        mine = np.round(flat * 127.0).astype(np.int64)
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        b4 = np.zeros((b.shape[0], 4), dtype=np.uint8)
        b4[:, 1:] = b
        theirs = (b4.view(">i4").ravel() >> 8).astype(np.int64)
        mine = np.round(flat * 8388607.0).astype(np.int64)
    else:
        theirs = np.frombuffer(raw, dtype=">i2").astype(np.int64)
        mine = np.round(flat * 32767.0).astype(np.int64)
    np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("name,law", [
    ("pluck-ulaw.aifc", "ulaw"), ("pluck-alaw.aifc", "alaw")])
def test_aifc_g711_matches_audioop(name, law):
    """Our closed-form G.711 expansion vs the stdlib audioop tables,
    applied to a real AIFF-C fixture."""
    from rasterframes_spark.sources.aiff_au import decode_aiff

    data = _read(name)
    a, rate = decode_aiff(data)
    assert rate == 11025 and a.shape[1] == 2
    # independently expand: pull the raw codes from the SSND chunk via
    # stdlib aifc (it returns the COMPRESSED bytes converted... aifc
    # decompresses ulaw/alaw itself via audioop) — compare sample values
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = aifc.open(os.path.join(FIX, name))
        n = f.getnframes()
        raw = f.readframes(n)  # linear PCM16 via audioop tables
        f.close()
    theirs = np.frombuffer(raw, dtype="<i2" if law == "ulaw" else "<i2")
    # aifc returns big-endian? readframes gives bytes in native order
    # produced by audioop.ulaw2lin(..., 2) — little-endian on x86
    mine = np.round(a.ravel() * 32767.0).astype(np.int64)
    np.testing.assert_array_equal(mine, theirs.astype(np.int64)[:len(mine)])


def test_g711_full_codespace_vs_audioop():
    from rasterframes_spark.sources.aiff_au import alaw_to_lin16, ulaw_to_lin16

    codes = np.arange(256, dtype=np.uint8)
    u_ref = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    np.testing.assert_array_equal(ulaw_to_lin16(codes), u_ref)
    a_ref = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype="<i2")
    np.testing.assert_array_equal(alaw_to_lin16(codes), a_ref)


@pytest.mark.parametrize("name,bits", [
    ("pluck-pcm16.au", 16), ("pluck-pcm32.au", 32)])
def test_au_pcm_bit_parity_with_stdlib(name, bits):
    from rasterframes_spark.sources.aiff_au import decode_au

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = sunau.open(os.path.join(FIX, name))
        ch, rate, n = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
        f.close()
    a, r = decode_au(_read(name))
    assert (r, a.shape) == (rate, (n, ch))
    full = float(2 ** (bits - 1) - 1)
    mine = np.round(a.ravel() * full).astype(np.int64)
    theirs = np.frombuffer(raw, dtype=f">i{bits // 8}").astype(np.int64)
    np.testing.assert_array_equal(mine, theirs)


def test_au_ulaw_fixture():
    from rasterframes_spark.sources.aiff_au import decode_au

    a, rate = decode_au(_read("pluck-ulaw.au"))
    assert rate == 11025 and a.shape[1] == 2
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = sunau.open(os.path.join(FIX, "pluck-ulaw.au"))
        raw = f.readframes(f.getnframes())  # sunau expands via audioop
        f.close()
    theirs = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    mine = np.round(a.ravel() * 32767.0).astype(np.int64)
    np.testing.assert_array_equal(mine, theirs[:len(mine)])


def test_audio_metadata_and_decode_audio_auto(spark):
    from rasterframes_spark.pipeline.audio import audio_metadata, decode_audio

    names = ["pluck-pcm16.aiff", "pluck-ulaw.aifc", "pluck-pcm16.au",
             "pluck-pcm16.wav"]
    df = spark.createDataFrame(
        [(i, bytearray(_read(n))) for i, n in enumerate(names)],
        "media_id long, payload binary")
    meta = {r["media_id"]: r for r in audio_metadata(df).collect()}
    assert [meta[i]["format"] for i in range(4)] == \
        ["aiff", "aifc", "au", "wav"]
    assert all(meta[i]["sample_rate"] == 11025 for i in range(4))
    assert all(meta[i]["channels"] == 2 for i in range(4))
    dec = {r["media_id"]: r for r in
           decode_audio(df, decode="auto").collect()}
    assert len(dec) == 4
    # all four containers carry the same pluck recording; the fixtures
    # were converted independently (sample values differ by a couple of
    # int16 LSBs between files), so compare at LSB scale
    a = np.frombuffer(bytes(dec[0]["samples"]), dtype="<f8")
    c = np.frombuffer(bytes(dec[2]["samples"]), dtype="<f8")
    w = np.frombuffer(bytes(dec[3]["samples"]), dtype="<f8")
    assert a.shape == c.shape == w.shape
    np.testing.assert_allclose(a, c, atol=3 / 32767.0)
    np.testing.assert_allclose(a, w, atol=3 / 32767.0)


def test_header_only_info_matches_decode_on_all_fixtures():
    """read_aiff_info/read_au_info report the same (rate, channels,
    frames) as the full decode without touching sample bytes — the
    audio_metadata profile pass must not pay decode cost."""
    import glob

    from rasterframes_spark.sources.aiff_au import (decode_aiff, decode_au,
                                                    read_aiff_info,
                                                    read_au_info)

    checked = 0
    for p in sorted(glob.glob(os.path.join(FIX, "pluck*"))):
        b = open(p, "rb").read()
        if b[:4] == b"FORM":
            rate, ch, n, fmt = read_aiff_info(b)
            a, rate2 = decode_aiff(b)
            assert fmt in ("aiff", "aifc")
        elif b[:4] == b".snd":
            rate, ch, n = read_au_info(b)
            a, rate2 = decode_au(b)
        else:
            continue
        assert (rate, ch, n) == (rate2, a.shape[1], a.shape[0]), p
        checked += 1
    assert checked >= 8


def test_truncated_payloads_raise_valueerror():
    """Corrupt-row-drop contract: short COMM/header bodies surface as
    ValueError, never struct.error/IndexError."""
    import struct

    from rasterframes_spark.sources.aiff_au import (decode_aiff, decode_au,
                                                    read_aiff_info,
                                                    read_au_info)

    bad_aiff = (b"FORM" + struct.pack(">I", 30) + b"AIFF"
                + b"COMM" + struct.pack(">I", 4) + b"\x00" * 4)
    for fn in (decode_aiff, read_aiff_info):
        with pytest.raises(ValueError):
            fn(bad_aiff)
    for fn in (decode_au, read_au_info):
        with pytest.raises(ValueError):
            fn(b".snd" + b"\x00" * 8)
