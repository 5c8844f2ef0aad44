"""Minimal stdlib PNG codec (zlib deflate/inflate; no PIL in this
environment).

Encoder supports 8-bit grayscale (H,W) and RGB (H,W,3) numpy arrays — what
rf_render_png and the slippy exporter need. The decoder is its inverse and
additionally handles all five scanline filters, RGBA, gray+alpha, and
palette images (8-bit depth) and Adam7 interlacing so
externally-produced PNGs decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

# Decode-side allocation policy (named per ADVICE r12 #2 — mirrors
# jpeg._MAX_PIXELS): the unfiltered-scanline buffer is sized from
# header-declared dimensions, so this cap is the largest raw payload a
# single decode may allocate on an executor.  1 GiB admits a
# 16384x16384 RGB8 scene (768 MB raw) and any web-scraped image while
# keeping a mutated-IHDR allocation bomb (r12 fuzz found a 172 GiB
# np.zeros) bounded to one task's budget.  Raising it is an explicit
# large-scene decision, not a fuzz-guard side effect.
_MAX_RAW_BYTES = 1 << 30


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 -> 8-bit PNG; uint16 -> 16-bit PNG (big-endian per spec —
    the web-DEM/terrarium elevation-tile format)."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        depth = 16
        arr = arr.astype(">u2")
    else:
        depth = 8
        arr = arr.astype(np.uint8)
    if arr.ndim == 2:
        color_type = 0
        h, w = arr.shape
        raw = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
        h, w = arr.shape[:2]
        raw = arr
    else:
        raise ValueError("encode_png expects (H,W) or (H,W,3) uint8/uint16")
    # filter type 0 per scanline
    lines = b"".join(b"\x00" + raw[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prior) & 0xFF
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-ch]
            recon = line.reshape(w, ch)
            recon = np.cumsum(recon, axis=0, dtype=np.int64).astype(np.int64) & 0xFF
            recon = recon.reshape(stride).astype(np.int32)
        elif ftype == 3:  # Average
            recon = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                recon[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - ch] if i >= ch else 0
                b = prior[i]
                c = prior[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out


# Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _deinterlace_adam7(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images scattered onto the
    pass grid -> (h, w*bpp) byte rows (same shape _unfilter returns)."""
    full = np.zeros((h, w, bpp), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        needed = ph * (1 + pw * bpp)
        sub = _unfilter(raw[off:off + needed], ph, pw, bpp)
        off += needed
        full[y0::dy, x0::dx, :] = sub.reshape(ph, pw, bpp)
    return full.reshape(h, w * bpp)


def _decode_png_impl(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (or uint16 for depth-16) array: (H,W) for
    grayscale, (H,W,C) otherwise. Supports bit depths 8 and 16, color
    types 0 (gray), 2 (RGB), 3 (palette, 8-bit), 4 (gray+alpha),
    6 (RGBA); both interlace methods (none / Adam7)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    plte = None
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth not in (8, 16) or (depth == 16 and ctype == 3):
        raise ValueError(f"unsupported PNG bit depth {depth} for type {ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    # PNG filters operate on BYTES with the left-neighbor offset equal to
    # the bytes-per-pixel, so 16-bit rows unfilter as 2x-wide byte rows
    bpp = channels * (depth // 8)
    # corrupt-input contract (r12 fuzz): a mutated IHDR height of ~2^31
    # reached _unfilter's np.zeros((h, stride)) as a 172 GiB allocation
    # (MemoryError, not the dispatcher's ValueError).  Cap dimensions,
    # bound the inflate by the spec-exact expected length, and require
    # the decompressed stream to match it EXACTLY before allocating.
    if not (0 < w <= (1 << 24) and 0 < h <= (1 << 24)) \
            or w * h * bpp > _MAX_RAW_BYTES:
        raise ValueError("PNG: implausible dimensions")
    if interlace:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expected += ph * (1 + pw * bpp)
    else:
        expected = h * (w * bpp + 1)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG: decompressed size does not match "
                         "dimensions")
    if interlace:
        arr = _deinterlace_adam7(raw, h, w, bpp)
    else:
        arr = _unfilter(raw, h, w, bpp)
    if depth == 16:
        arr = np.frombuffer(arr.tobytes(), dtype=">u2").astype(np.uint16)
        arr = arr.reshape(h, w, channels)
    else:
        arr = arr.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
    if arr.shape[2] == 1:
        return arr[:, :, 0]
    return arr


def decode_png(data: bytes) -> np.ndarray:
    try:
        return _decode_png_impl(data)
    except (struct.error, IndexError, KeyError, zlib.error) as e:
        raise ValueError(f"malformed PNG: {e}") from e


decode_png.__doc__ = _decode_png_impl.__doc__
