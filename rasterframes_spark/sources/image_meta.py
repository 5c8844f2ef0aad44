"""Header-only image metadata: format / dimensions / channels without
pixel decode.

A corpus profile pass over billions of images cannot afford full decode —
dimensions, format, and channel count live in the first KB of every
mainstream format. Covers PNG (IHDR), baseline+progressive JPEG (SOF
scan), GIF (logical screen descriptor), WebP (lossless VP8L header, lossy
VP8 frame tag, extended VP8X canvas), AVIF/HEIC (ISO-BMFF ``ispe``
property, via the box walker in ``sources/mp4.py``), TIFF (tag parse via
``sources/geotiff.py``), and BMP (BITMAPINFOHEADER). Formats whose
*pixels* this repo can decode (PNG/JPEG/GIF/lossless WebP/TIFF) report
the same dims the decoder would produce; AVIF/HEIC/lossy-WebP metadata is
real even though their pixel decode stays stubbed.
"""
from __future__ import annotations

import struct

from rasterframes_spark.sources.mp4 import _iter_boxes

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# SOF markers: C0-CF minus C4 (DHT), C8 (JPG), CC (DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _png(b: bytes):
    if len(b) < 26 or b[12:16] != b"IHDR":
        raise ValueError("png: missing IHDR")
    w, h = struct.unpack_from(">II", b, 16)
    bit_depth, color_type = b[24], b[25]
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None or w == 0 or h == 0:
        raise ValueError("png: bad IHDR")
    return "png", w, h, ch


def _jpeg(b: bytes):
    off = 2
    n = len(b)
    while off + 4 <= n:
        if b[off] != 0xFF:
            raise ValueError("jpeg: marker desync")
        marker = b[off + 1]
        if marker == 0xFF:          # fill byte
            off += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            off += 2                # standalone markers
            continue
        (seg_len,) = struct.unpack_from(">H", b, off + 2)
        if seg_len < 2:
            raise ValueError("jpeg: bad segment length")
        if marker in _JPEG_SOF:
            if off + 2 + 7 >= n:
                raise ValueError("jpeg: truncated SOF")
            h, w = struct.unpack_from(">HH", b, off + 5)
            ch = b[off + 9]
            if w == 0 or h == 0 or ch == 0:
                raise ValueError("jpeg: bad SOF dims")
            return "jpeg", w, h, ch
        off += 2 + seg_len
    raise ValueError("jpeg: no SOF marker found")


def _gif(b: bytes):
    if len(b) < 10:
        raise ValueError("gif: truncated header")
    w, h = struct.unpack_from("<HH", b, 6)
    if w == 0 or h == 0:
        raise ValueError("gif: bad dims")
    return "gif", w, h, 3


def _webp(b: bytes):
    off = 12
    while off + 8 <= len(b):
        tag = b[off:off + 4]
        (size,) = struct.unpack_from("<I", b, off + 4)
        body = b[off + 8:off + 8 + size]
        if tag == b"VP8L" and len(body) >= 5:
            if body[0] != 0x2F:
                raise ValueError("webp: bad VP8L signature")
            bits = int.from_bytes(body[1:5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = (bits >> 28) & 1
            return "webp", w, h, 4 if alpha else 3
        if tag == b"VP8 " and len(body) >= 10:
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("webp: bad VP8 start code")
            w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
            if w == 0 or h == 0:
                raise ValueError("webp: bad VP8 dims")
            return "webp", w, h, 3
        if tag == b"VP8X" and len(body) >= 10:
            alpha = (body[0] >> 4) & 1
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return "webp", w, h, 4 if alpha else 3
        off += 8 + size + (size & 1)
    raise ValueError("webp: no image chunk found")


def _bmff_image(b: bytes, fmt: str):
    """AVIF/HEIC: find the ispe (image spatial extents) property."""
    for cc, s, e in _iter_boxes(b, 0, len(b)):
        if cc != b"meta":
            continue
        # meta is a FullBox: skip version/flags
        for cc2, s2, e2 in _iter_boxes(b, s + 4, e):
            if cc2 != b"iprp":
                continue
            for cc3, s3, e3 in _iter_boxes(b, s2, e2):
                if cc3 != b"ipco":
                    continue
                for cc4, s4, e4 in _iter_boxes(b, s3, e3):
                    if cc4 == b"ispe" and e4 - s4 >= 12:
                        w, h = struct.unpack_from(">II", b, s4 + 4)
                        if w == 0 or h == 0:
                            raise ValueError(f"{fmt}: bad ispe dims")
                        return fmt, w, h, None
    raise ValueError(f"{fmt}: no ispe property found")


def _bmp(b: bytes):
    if len(b) < 30:
        raise ValueError("bmp: truncated header")
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size >= 40:
        w, h = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
    elif hdr_size == 12:          # BITMAPCOREHEADER
        w, h = struct.unpack_from("<hh", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 24)
    else:
        raise ValueError("bmp: unknown header size")
    if w <= 0 or h == 0:
        raise ValueError("bmp: bad dims")
    return "bmp", w, abs(h), max(bpp // 8, 1)


def _tiff(b: bytes):
    from rasterframes_spark.sources.geotiff import read_info

    info = read_info(b)
    return "tiff", info.width, info.height, info.bands


def read_image_info(b: bytes) -> tuple[str, int, int, int | None]:
    """(format, width, height, channels) from the header bytes only.
    channels is None where the format stores it too deep to read cheaply
    (AVIF/HEIC). Raises ValueError for unrecognized/corrupt input."""
    if len(b) < 12:
        raise ValueError("image: too short to sniff")
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png(b)
    if b[:2] == b"\xff\xd8":
        return _jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _webp(b)
    if b[:2] == b"BM":
        return _bmp(b)
    if b[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        return _tiff(b)
    if b[:2] in (b"P5", b"P6") and b[2:3].isspace():
        from rasterframes_spark.sources.simple_images import _pnm_tokens

        (w, h, _), _ = _pnm_tokens(b, 3, 2)
        return ("pnm", w, h, 3 if b[:2] == b"P6" else 1)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        brand = b[8:12]
        if brand in (b"avif", b"avis"):
            return _bmff_image(b, "avif")
        if brand in (b"heic", b"heix", b"mif1", b"msf1"):
            return _bmff_image(b, "heic")
    raise ValueError("image: unrecognized format")
