"""PPM/PGM (netpbm) and BMP pixel decoders — the uncompressed formats.

Tiny but load-bearing: P6 is raw RGB bytes, so a netpbm file is the
ground-truth anchor of the cross-encoder fixture family in
``tests/test_cross_format_images.py`` (the same image encoded by real
libpng/libtiff/libjpeg/giflib/libwebp encoders, all decoded by this
repo's codecs and compared against the raw pixels).  BMP shows up in
scraped web corpora often enough that the profile pass should decode
it rather than route it to a stub.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_ppm", "decode_bmp"]


def _pnm_tokens(data: bytes, n: int, start: int):
    """Read n whitespace/comment-separated header tokens, return
    (values, offset_after_single_whitespace)."""
    vals = []
    i = start
    while len(vals) < n:
        if i >= len(data):
            raise ValueError("pnm: truncated header")
        c = data[i:i + 1]
        if c == b"#":
            j = data.find(b"\n", i)
            i = (j if j >= 0 else len(data)) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j:j + 1].isspace():
                j += 1
            tok = data[i:j]
            if not tok.isdigit():
                raise ValueError(f"pnm: bad header token {tok!r}")
            vals.append(int(tok))
            i = j
    return vals, i + 1  # single whitespace after maxval, then raster


def decode_ppm(data: bytes) -> np.ndarray:
    """P5 (PGM, -> (h, w)) / P6 (PPM, -> (h, w, 3)) binary netpbm.
    maxval <= 255 -> uint8; 256..65535 -> uint16 (big-endian samples)."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("pnm: only binary P5/P6 supported")
    (w, h, maxval), off = _pnm_tokens(data, 3, 2)
    if not (0 < maxval < 65536):
        raise ValueError(f"pnm: bad maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    need = w * h * ch * dt.itemsize
    raster = data[off:off + need]
    if len(raster) < need:
        raise ValueError("pnm: truncated raster")
    a = np.frombuffer(raster, dtype=dt).reshape(h, w, ch)
    a = a.astype("uint16") if maxval > 255 else a
    return a[:, :, 0] if ch == 1 else a


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP (BI_RGB 8/24/32 bpp incl. palette, BI_BITFIELDS
    32 bpp with byte-aligned masks) -> (h, w, 3|4) uint8.  Bottom-up and
    top-down rows; the 4th channel is alpha when a 32-bpp alpha mask /
    byte is present."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("bmp: bad signature or truncated")
    (off,) = struct.unpack_from("<I", data, 10)
    (hsz,) = struct.unpack_from("<I", data, 14)
    if hsz < 40:
        raise ValueError("bmp: BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    if comp not in (0, 3):
        raise ValueError(f"bmp: compression {comp} not supported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError("bmp: bad dimensions")

    if bpp == 8:
        (used,) = struct.unpack_from("<I", data, 46)
        ncol = used or 256
        pal = np.frombuffer(data, dtype=np.uint8,
                            count=ncol * 4, offset=14 + hsz)
        pal = pal.reshape(ncol, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        stride = (w + 3) & ~3
        idx = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                            offset=off).reshape(h, stride)[:, :w]
        out = pal[idx]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        px = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                           offset=off).reshape(h, stride)
        px = px[:, :w * nb].reshape(h, w, nb)
        if bpp == 24:
            out = px[:, :, ::-1]                       # BGR -> RGB
        else:
            if comp == 3:
                rm, gm, bm = struct.unpack_from("<III", data, 54)
                am = struct.unpack_from("<I", data, 66)[0] if hsz >= 56 \
                    else 0
                order = {}
                for name, mask in (("r", rm), ("g", gm), ("b", bm),
                                   ("a", am)):
                    if mask:
                        if mask not in (0xFF, 0xFF00, 0xFF0000, 0xFF000000):
                            raise ValueError(
                                "bmp: only byte-aligned bitfields supported")
                        order[name] = mask.bit_length() // 8 - 1
                chans = [px[:, :, order["r"]], px[:, :, order["g"]],
                         px[:, :, order["b"]]]
                if "a" in order:
                    chans.append(px[:, :, order["a"]])
                out = np.stack(chans, axis=-1)
            else:
                out = np.stack([px[:, :, 2], px[:, :, 1], px[:, :, 0],
                                px[:, :, 3]], axis=-1)
    else:
        raise ValueError(f"bmp: {bpp} bpp not supported")
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)
