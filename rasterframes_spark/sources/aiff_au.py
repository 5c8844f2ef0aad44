"""AIFF / AIFF-C and Sun AU audio decoders — pure python.

The remaining uncompressed-PCM audio containers a scraped corpus
actually contains (podcast archives and old datasets ship .aiff/.au):

- AIFF (`FORM..AIFF`): COMM chunk (channels, frames, bits, 80-bit
  extended-float sample rate) + SSND big-endian signed PCM.
- AIFF-C (`FORM..AIFC`): adds a compression type — NONE / `sowt`
  (little-endian PCM) / `ulaw`/`ULAW` / `alaw`/`ALAW` (G.711) are
  decoded; anything else raises.
- AU (`.snd`): fixed big-endian header; encodings 1 (mu-law), 2-5
  (8/16/24/32-bit PCM), 6/7 (float32/64), 27 (A-law).

G.711 mu-law/A-law expansion is computed closed-form (the 8-bit code
space is also cross-checked bit-for-bit against the stdlib `audioop`
tables in tests).  Validated against real CPython-test-suite fixtures
with stdlib `aifc`/`sunau` as independent oracles
(tests/test_aiff_au.py) — same discipline as the WAV-vs-`wave` parity
suite.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_aiff", "decode_au", "read_aiff_info", "read_au_info",
           "ulaw_to_lin16", "alaw_to_lin16"]


def _ext80_to_float(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the AIFF sampleRate field)."""
    if len(b) != 10:
        raise ValueError("aiff: bad extended float")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("aiff: inf/nan sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def ulaw_to_lin16(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16 (closed-form expansion)."""
    u = ~codes.astype(np.uint8)
    sign = (u & 0x80) != 0
    exp = (u.astype(np.int32) >> 4) & 0x07
    mant = u.astype(np.int32) & 0x0F
    mag = ((mant << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def alaw_to_lin16(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes -> int16 (closed-form expansion).  Unlike
    mu-law, a SET sign bit means positive in A-law."""
    a = codes.astype(np.uint8) ^ 0x55
    positive = (a & 0x80) != 0
    exp = (a.astype(np.int32) >> 4) & 0x07
    mant = a.astype(np.int32) & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    return np.where(positive, mag, -mag).astype(np.int16)


def _pcm_to_float(raw: bytes, bits: int, big: bool) -> np.ndarray:
    bo = ">" if big else "<"
    if bits == 8:
        a = np.frombuffer(raw, dtype=np.int8).astype("float64") / 127.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3)
        if not big:
            b = b[:, ::-1]
        b4 = np.zeros((b.shape[0], 4), dtype=np.uint8)
        b4[:, 1:] = b
        a = (b4.view(">i4").ravel() >> 8).astype("float64") / 8388607.0
    elif bits in (16, 32):
        full = float(2 ** (bits - 1) - 1)
        a = np.frombuffer(raw, dtype=f"{bo}i{bits // 8}").astype("float64") \
            / full
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return a


def _uniform_errors(fn):
    """Truncated/corrupt payloads must surface as ValueError (the
    corrupt-row-drop contract of pipeline callers), never struct.error
    or IndexError."""
    import functools

    @functools.wraps(fn)
    def wrap(*a, **k):
        try:
            return fn(*a, **k)
        except (struct.error, IndexError, KeyError, OverflowError) as e:
            raise ValueError(f"{fn.__name__}: malformed input: {e}") from e
    return wrap


@_uniform_errors
def decode_aiff(buf: bytes):
    """AIFF / AIFF-C bytes -> (float64 samples shape (n, channels) in
    [-1, 1], sample_rate) — the decode_wav contract."""
    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] not in (b"AIFF",
                                                                b"AIFC"):
        raise ValueError("not an AIFF/AIFC stream")
    aifc = buf[8:12] == b"AIFC"
    pos = 12
    ch = bits = None
    rate = None
    nframes = 0
    comp = b"NONE"
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from(">I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + clen]
        if cid == b"COMM":
            ch, nframes, bits = struct.unpack_from(">hLh", body, 0)
            rate = _ext80_to_float(body[8:18])
            if aifc and clen >= 22:
                comp = body[18:22]
        elif cid == b"SSND" and clen >= 8:
            (off, _blk) = struct.unpack_from(">II", body, 0)
            data = body[8 + off:]
        pos += 8 + clen + (clen & 1)
    if ch is None or data is None or rate is None:
        raise ValueError("aiff: missing COMM or SSND chunk")
    if ch < 1 or rate <= 0:
        raise ValueError("aiff: bad channel count / rate")
    comp_u = comp.upper().strip()
    if comp_u == b"NONE":
        a = _pcm_to_float(data, bits, big=True)
    elif comp_u == b"SOWT":
        a = _pcm_to_float(data, bits, big=False)
    elif comp_u == b"ULAW":
        a = ulaw_to_lin16(np.frombuffer(data, dtype=np.uint8)) \
            .astype("float64") / 32767.0
    elif comp_u == b"ALAW":
        a = alaw_to_lin16(np.frombuffer(data, dtype=np.uint8)) \
            .astype("float64") / 32767.0
    else:
        raise ValueError(f"aifc: compression {comp!r} not supported")
    n = len(a) - len(a) % ch
    a = a[:n].reshape(-1, ch)
    if nframes:
        a = a[:nframes]
    return a, int(round(rate))


@_uniform_errors
def read_aiff_info(buf: bytes):
    """Header-only AIFF/AIFC profile — parses the COMM chunk without
    touching SSND sample bytes (the metadata pass must not pay decode
    cost): (sample_rate, channels, n_frames, 'aiff'|'aifc')."""
    if len(buf) < 12 or buf[:4] != b"FORM" or buf[8:12] not in (b"AIFF",
                                                                b"AIFC"):
        raise ValueError("not an AIFF/AIFC stream")
    aifc = buf[8:12] == b"AIFC"
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from(">I", buf, pos + 4)
        if cid == b"COMM":
            body = buf[pos + 8:pos + 8 + clen]
            ch, nframes, _bits = struct.unpack_from(">hLh", body, 0)
            rate = _ext80_to_float(body[8:18])
            if ch < 1 or rate <= 0:
                raise ValueError("aiff: bad channel count / rate")
            return int(round(rate)), int(ch), int(nframes), \
                ("aifc" if aifc else "aiff")
        pos += 8 + clen + (clen & 1)
    raise ValueError("aiff: missing COMM chunk")


_AU_SAMPLE_BYTES = {1: 1, 27: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8}


@_uniform_errors
def read_au_info(buf: bytes):
    """Header-only AU profile: (sample_rate, channels, n_frames)."""
    if len(buf) < 24 or buf[:4] != b".snd":
        raise ValueError("not an AU stream")
    off, size, enc, rate, ch = struct.unpack_from(">IIIII", buf, 4)
    if ch < 1 or rate <= 0 or off < 24:
        raise ValueError("au: bad header")
    if enc not in _AU_SAMPLE_BYTES:
        raise ValueError(f"au: encoding {enc} not supported")
    end = len(buf) if size in (0, 0xFFFFFFFF) else min(len(buf), off + size)
    nbytes = max(end - off, 0)
    return int(rate), int(ch), nbytes // (_AU_SAMPLE_BYTES[enc] * ch)


_AU_BITS = {2: 8, 3: 16, 4: 24, 5: 32}


@_uniform_errors
def decode_au(buf: bytes):
    """Sun AU bytes -> (float64 samples (n, channels) in [-1, 1], rate)."""
    if len(buf) < 24 or buf[:4] != b".snd":
        raise ValueError("not an AU stream")
    off, size, enc, rate, ch = struct.unpack_from(">IIIII", buf, 4)
    if ch < 1 or rate <= 0 or off < 24:
        raise ValueError("au: bad header")
    end = len(buf) if size in (0, 0xFFFFFFFF) else min(len(buf), off + size)
    data = buf[off:end]
    if enc == 1:
        a = ulaw_to_lin16(np.frombuffer(data, dtype=np.uint8)) \
            .astype("float64") / 32767.0
    elif enc == 27:
        a = alaw_to_lin16(np.frombuffer(data, dtype=np.uint8)) \
            .astype("float64") / 32767.0
    elif enc in _AU_BITS:
        a = _pcm_to_float(data, _AU_BITS[enc], big=True)
    elif enc == 6:
        a = np.frombuffer(data, dtype=">f4").astype("float64")
    elif enc == 7:
        a = np.frombuffer(data, dtype=">f8").astype("float64")
    else:
        raise ValueError(f"au: encoding {enc} not supported")
    n = len(a) - len(a) % ch
    return a[:n].reshape(-1, ch), int(rate)
