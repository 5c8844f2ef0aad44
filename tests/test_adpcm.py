"""IMA/DVI + MS ADPCM WAV codecs.

The IMA inner loop is pinned against CPython's ``audioop.adpcm2lin``
(same public IMA step/index tables; audioop packs high-nibble-first and
carries state across the whole stream, so the comparison feeds it the
nibble sequence of ONE block with the matching initial state).  MS ADPCM
has no in-container reference decoder: pinned by hand-computed spec math
(including a negative-predictor truncation case) and encoder round-trips.
"""
import struct

import numpy as np
import pytest

from rasterframes_spark.pipeline.audio import (
    _wav_header_info, decode_wav)
from rasterframes_spark.sources.adpcm import (
    IMA_STEPS, MS_COEFS, _MS_ADAPT, decode_ima_adpcm, decode_ms_adpcm,
    encode_ima_adpcm, encode_ms_adpcm, write_adpcm_wav)

audioop = pytest.importorskip("audioop")   # removed in python 3.13


def _signal(n, ch=1, seed=0, scale=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    base = (np.sin(t / 23.0) * scale + rng.normal(0, 300, (n, ch)))
    return np.clip(base, -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA vs audioop (independent oracle)
# ---------------------------------------------------------------------------


def test_ima_block_matches_audioop():
    """Decode one IMA block both ways: ours from the WAV block layout,
    audioop from the same nibble sequence packed high-first, seeded with
    the same (predictor, index) state."""
    rng = np.random.default_rng(7)
    nibs = rng.integers(0, 16, 64).astype(np.uint8)
    pred0, idx0 = 1234, 30

    # WAV block: header (pred, idx, 0) + nibbles low-first
    block = bytearray(struct.pack("<hBB", pred0, idx0, 0))
    for i in range(0, 64, 2):
        block.append(int(nibs[i]) | (int(nibs[i + 1]) << 4))
    ours = decode_ima_adpcm(bytes(block), 1, len(block)).ravel()

    # audioop: same nibbles packed HIGH-first, state = (pred0, idx0)
    frag = bytearray()
    for i in range(0, 64, 2):
        frag.append((int(nibs[i]) << 4) | int(nibs[i + 1]))
    lin, _state = audioop.adpcm2lin(bytes(frag), 2, (pred0, idx0))
    ref = np.frombuffer(lin, dtype="<i2")

    # ours carries the header predictor as sample 0, then the 64 steps
    assert ours[0] == pred0
    np.testing.assert_array_equal(ours[1:], ref)


def test_ima_multiblock_state_reset():
    """Across blocks the state must reset to each block header —
    audioop run per-block with per-block seeds must agree."""
    rng = np.random.default_rng(11)
    blocks = []
    expected = []
    for b in range(5):
        pred0 = int(rng.integers(-20000, 20000))
        idx0 = int(rng.integers(0, 89))
        nibs = rng.integers(0, 16, 8).astype(np.uint8)
        blk = bytearray(struct.pack("<hBB", pred0, idx0, 0))
        frag = bytearray()
        for i in range(0, 8, 2):
            blk.append(int(nibs[i]) | (int(nibs[i + 1]) << 4))
            frag.append((int(nibs[i]) << 4) | int(nibs[i + 1]))
        blocks.append(bytes(blk))
        lin, _ = audioop.adpcm2lin(bytes(frag), 2, (pred0, idx0))
        expected.append([pred0] + list(np.frombuffer(lin, dtype="<i2")))
    data = b"".join(blocks)
    ours = decode_ima_adpcm(data, 1, len(blocks[0])).ravel()
    np.testing.assert_array_equal(ours, np.concatenate(expected))


def test_ima_encoder_roundtrip_snr():
    a = _signal(3000)
    payload, ba = encode_ima_adpcm(a, 1)
    back = decode_ima_adpcm(payload, 1, ba)[:3000]
    err = back.astype("f8") - a.astype("f8")
    snr = 10 * np.log10((a.astype("f8") ** 2).mean() / (err ** 2).mean())
    assert snr > 25, snr                      # 4-bit ADPCM ~ 30+ dB


def test_ima_stereo_interleave():
    a = _signal(1010, ch=2, seed=3)
    payload, ba = encode_ima_adpcm(a, 2)
    back = decode_ima_adpcm(payload, 2, ba)[:1010]
    for c in range(2):
        err = back[:, c].astype("f8") - a[:, c].astype("f8")
        snr = 10 * np.log10(
            (a[:, c].astype("f8") ** 2).mean() / (err ** 2).mean())
        assert snr > 25, (c, snr)


# ---------------------------------------------------------------------------
# MS ADPCM: spec math + round-trip
# ---------------------------------------------------------------------------


def test_ms_spec_math_block():
    """Hand-decode one mono block with coefficient pair 1 (512, -256),
    including a negative-predictor sample (division truncates toward
    zero, not floor)."""
    delta0, s1_0, s2_0 = 300, -100, 2000
    nibs = [3, 0x0F, 8, 1]                   # two bytes, high first
    blk = bytearray([1])                     # coef pair 1
    blk += struct.pack("<hhh", delta0, s1_0, s2_0)
    blk.append((nibs[0] << 4) | nibs[1])
    blk.append((nibs[2] << 4) | nibs[3])
    got = decode_ms_adpcm(bytes(blk), 1, len(blk)).ravel()

    c1, c2 = MS_COEFS[1]
    s1, s2, delta = s1_0, s2_0, delta0
    exp = [s2_0, s1_0]
    for nib in nibs:
        signed = nib - 16 if nib >= 8 else nib
        acc = s1 * c1 + s2 * c2
        pred = int(np.sign(acc)) * (abs(int(acc)) >> 8)  # trunc to zero
        new = max(-32768, min(32767, pred + signed * delta))
        exp.append(new)
        s2, s1 = s1, new
        delta = max(16, (int(_MS_ADAPT[nib]) * delta) >> 8)
    np.testing.assert_array_equal(got, np.array(exp, dtype=np.int16))


def test_ms_encoder_roundtrip_snr():
    a = _signal(2500, seed=5)
    payload, ba = encode_ms_adpcm(a, 1)
    back = decode_ms_adpcm(payload, 1, ba)[:2500]
    err = back.astype("f8") - a.astype("f8")
    snr = 10 * np.log10((a.astype("f8") ** 2).mean() / (err ** 2).mean())
    assert snr > 25, snr


def test_ms_bad_coef_index_raises():
    blk = bytearray([9]) + struct.pack("<hhh", 256, 0, 0) + b"\x00\x00"
    with pytest.raises(ValueError):
        decode_ms_adpcm(bytes(blk), 1, len(blk))


# ---------------------------------------------------------------------------
# WAV container integration (decode_wav + header profile)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["ima", "ms"])
def test_decode_wav_adpcm(fmt):
    a = _signal(2222, ch=2, seed=9)
    wav = write_adpcm_wav(a, 16000, fmt=fmt)
    dec, rate = decode_wav(wav)
    assert rate == 16000 and dec.shape == (2222, 2)
    ref = a.astype("f8") / 32767.0
    err = dec - ref
    snr = 10 * np.log10((ref ** 2).mean() / (err ** 2).mean())
    assert snr > 25, snr
    # header-only profile: fact chunk gives the exact frame count
    r, ch, n, _br = _wav_header_info(wav)
    assert (r, ch, n) == (16000, 2, 2222)


def test_decode_wav_g711():
    from rasterframes_spark.sources.aiff_au import ulaw_to_lin16

    rng = np.random.default_rng(2)
    codes = rng.integers(0, 256, 800).astype(np.uint8)
    fmt_chunk = struct.pack("<HHIIHH", 0x0007, 1, 8000, 8000, 1, 8)
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", 16) + fmt_chunk
    riff += b"data" + struct.pack("<I", len(codes)) + codes.tobytes()
    wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
    dec, rate = decode_wav(wav)
    assert rate == 8000
    ref = ulaw_to_lin16(codes) / 32767.0
    np.testing.assert_allclose(dec.ravel(), ref)
    # audioop is the independent G.711 oracle
    lin = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    np.testing.assert_array_equal((dec.ravel() * 32767).round(), lin)


def test_header_info_without_fact():
    a = _signal(505)
    payload, ba = encode_ima_adpcm(a, 1)
    fmt_chunk = struct.pack("<HHIIHH", 0x0011, 1, 8000, 4055, ba, 4)
    riff = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt_chunk
    riff += b"data" + struct.pack("<I", len(payload)) + payload
    wav = b"RIFF" + struct.pack("<I", len(riff)) + riff
    r, ch, n, _ = _wav_header_info(wav)
    assert (r, ch, n) == (8000, 1, 505)      # derived from block_align
