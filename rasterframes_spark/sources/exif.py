"""EXIF metadata: TIFF-IFD walk over JPEG APP1 segments and TIFF files.

The image-corpus profile signals a curation pipeline filters and groups
on — capture time, camera make/model, orientation (needed before any
pixel-space dedup: a rotated copy is the same photo), GPS position.
Plain TIFF baseline tags parse through the same walker, so the real
libtiff fixture anchors the string/short/rational decoders externally.

``apply_orientation`` realizes the 8 EXIF orientation transforms on a
decoded array — run it before pHash/embedding so rotated re-uploads
land in the same near-dup bucket.

Malformed input raises ValueError (shared corruption-fuzz discipline).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["read_exif", "apply_orientation", "write_exif_app1"]

_IFD0_TAGS = {
    0x010D: "document_name", 0x010E: "description", 0x010F: "make",
    0x0110: "model", 0x0112: "orientation", 0x0131: "software",
    0x0132: "datetime", 0x013B: "artist", 0x8298: "copyright",
    0x0100: "width", 0x0101: "height",
}
_EXIF_TAGS = {
    0x9003: "datetime_original", 0x9004: "datetime_digitized",
    0x829A: "exposure_time", 0x829D: "f_number", 0x8827: "iso",
    0x920A: "focal_length", 0xA002: "pixel_width", 0xA003: "pixel_height",
}
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(b: bytes, base: int, off: int, fmt: str) -> dict[int, object]:
    if off + 2 > len(b) - base or off < 0:
        raise ValueError("exif: IFD offset out of range")
    (n,) = struct.unpack_from(fmt + "H", b, base + off)
    if n > 4096:
        raise ValueError("exif: implausible IFD entry count")
    out: dict[int, object] = {}
    for i in range(n):
        ep = base + off + 2 + 12 * i
        if ep + 12 > len(b):
            raise ValueError("exif: truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", b, ep)
        size = _SIZES.get(typ)
        if size is None or cnt > 1 << 24:
            continue   # unknown type / absurd count: skip the entry
        total = size * cnt
        if total <= 4:
            vp = ep + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", b, ep + 8)
            vp = base + voff
        if vp + total > len(b):
            raise ValueError("exif: tag value out of range")
        if typ == 2:
            out[tag] = b[vp:vp + cnt].split(b"\x00")[0] \
                .decode("latin1", "replace")
        elif typ in (3, 8):
            vals = struct.unpack_from(fmt + ("H" if typ == 3 else "h") * cnt,
                                      b, vp)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ in (4, 9):
            vals = struct.unpack_from(fmt + ("I" if typ == 4 else "i") * cnt,
                                      b, vp)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ in (5, 10):
            c = "II" if typ == 5 else "ii"
            vals = []
            for k in range(cnt):
                num, den = struct.unpack_from(fmt + c, b, vp + 8 * k)
                vals.append(num / den if den else float("nan"))
            out[tag] = vals[0] if cnt == 1 else vals
        elif typ in (1, 6, 7):
            out[tag] = b[vp:vp + cnt]
    return out


def _tiff_exif(b: bytes, base: int) -> dict:
    hdr = b[base:base + 8]
    if hdr[:2] == b"II":
        fmt = "<"
    elif hdr[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("exif: bad TIFF byte order")
    (magic,) = struct.unpack_from(fmt + "H", b, base + 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(fmt + "I", b, base + 4)
    ifd0 = _read_ifd(b, base, ifd0_off, fmt)
    out: dict[str, object] = {}
    for tag, name in _IFD0_TAGS.items():
        if tag in ifd0:
            out[name] = ifd0[tag]
    if 0x8769 in ifd0 and isinstance(ifd0[0x8769], int):
        try:
            ex = _read_ifd(b, base, ifd0[0x8769], fmt)
            for tag, name in _EXIF_TAGS.items():
                if tag in ex:
                    out[name] = ex[tag]
        except ValueError:
            pass   # broken sub-IFD: keep what IFD0 gave us
    if 0x8825 in ifd0 and isinstance(ifd0[0x8825], int):
        try:
            g = _read_ifd(b, base, ifd0[0x8825], fmt)
            lat, lon = g.get(2), g.get(4)
            if isinstance(lat, list) and len(lat) == 3 \
                    and isinstance(lon, list) and len(lon) == 3:
                la = lat[0] + lat[1] / 60 + lat[2] / 3600
                lo = lon[0] + lon[1] / 60 + lon[2] / 3600
                if str(g.get(1, "N")).upper().startswith("S"):
                    la = -la
                if str(g.get(3, "E")).upper().startswith("W"):
                    lo = -lo
                out["gps_lat"] = la
                out["gps_lon"] = lo
        except ValueError:
            pass
    return out


def read_exif(b: bytes) -> dict:
    """JPEG or TIFF bytes -> flat EXIF dict (``{}`` when the image
    carries none). Keys: make/model/orientation/datetime/software,
    datetime_original, exposure_time/f_number/iso/focal_length,
    pixel_width/height, gps_lat/gps_lon (signed decimal degrees).
    Malformed input raises ValueError (never struct.error — a truncated
    image must drop a row, not crash a task)."""
    try:
        return _read_exif_impl(b)
    except struct.error as e:
        raise ValueError(f"exif: truncated structure ({e})") from None


def _read_exif_impl(b: bytes) -> dict:
    if b[:2] == b"\xff\xd8":   # JPEG: walk segments for APP1/Exif
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                break
            marker = b[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9 or marker == 0xDA:
                break
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            if seglen < 2:
                raise ValueError("exif: bad JPEG segment length")
            if marker == 0xE1 and b[pos + 4:pos + 10] == b"Exif\x00\x00":
                return _tiff_exif(b, pos + 10)
            pos += 2 + seglen
        return {}
    if b[:2] in (b"II", b"MM"):
        return _tiff_exif(b, 0)
    return {}


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Realize an EXIF orientation (1..8) so the array is display-
    upright. 1 = identity; run before perceptual hashing so rotated
    re-uploads of one photo hash together."""
    o = int(orientation)
    if o in (0, 1):
        return arr
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1, :]
    if o == 5:
        return np.swapaxes(arr, 0, 1)
    if o == 6:
        return np.swapaxes(arr, 0, 1)[:, ::-1]
    if o == 7:
        return np.swapaxes(arr, 0, 1)[::-1, ::-1]
    if o == 8:
        return np.swapaxes(arr, 0, 1)[::-1, :]
    raise ValueError(f"exif: orientation {orientation} out of range")


def write_exif_app1(jpeg: bytes, fields: dict) -> bytes:
    """Insert an APP1/Exif segment (little-endian TIFF) after SOI —
    the round-trip fixture generator for ``read_exif``. Supported
    fields: make, model, software, datetime, orientation,
    datetime_original, iso, exposure_time (num, den), gps_lat, gps_lon
    (signed decimal degrees)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("write_exif_app1: not a JPEG")
    ifd0: list[tuple] = []
    exif_ifd: list[tuple] = []
    gps_ifd: list[tuple] = []
    heap = bytearray()

    def ascii_entry(tag, s):
        raw = s.encode("latin1") + b"\x00"
        return (tag, 2, len(raw), raw)

    for key, tag in (("make", 0x010F), ("model", 0x0110),
                     ("software", 0x0131), ("datetime", 0x0132)):
        if key in fields:
            ifd0.append(ascii_entry(tag, str(fields[key])))
    if "orientation" in fields:
        ifd0.append((0x0112, 3, 1,
                     struct.pack("<H", int(fields["orientation"]))))
    if "datetime_original" in fields:
        exif_ifd.append(ascii_entry(0x9003,
                                    str(fields["datetime_original"])))
    if "iso" in fields:
        exif_ifd.append((0x8827, 3, 1,
                         struct.pack("<H", int(fields["iso"]))))
    if "exposure_time" in fields:
        num, den = fields["exposure_time"]
        exif_ifd.append((0x829A, 5, 1, struct.pack("<II", num, den)))
    if "gps_lat" in fields and "gps_lon" in fields:
        def dms(v):
            v = abs(float(v))
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return struct.pack("<IIIIII", d, 1, m, 1, s, 10000)

        la, lo = float(fields["gps_lat"]), float(fields["gps_lon"])
        gps_ifd.append((1, 2, 2, (b"S" if la < 0 else b"N") + b"\x00"))
        gps_ifd.append((2, 5, 3, dms(la)))
        gps_ifd.append((3, 2, 2, (b"W" if lo < 0 else b"E") + b"\x00"))
        gps_ifd.append((4, 5, 3, dms(lo)))

    # layout: header(8) IFD0 [EXIF IFD] [GPS IFD] heap
    n0 = len(ifd0) + (1 if exif_ifd else 0) + (1 if gps_ifd else 0)
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = 8 + ifd0_size
    exif_size = (2 + 12 * len(exif_ifd) + 4) if exif_ifd else 0
    gps_off = exif_off + exif_size
    gps_size = (2 + 12 * len(gps_ifd) + 4) if gps_ifd else 0
    heap_off = gps_off + gps_size

    def emit(entries):
        nonlocal heap
        out = struct.pack("<H", len(entries))
        for tag, typ, cnt, payload in sorted(entries):
            out += struct.pack("<HHI", tag, typ, cnt)
            if len(payload) <= 4:
                out += payload.ljust(4, b"\x00")
            else:
                out += struct.pack("<I", heap_off + len(heap))
                heap += payload
        out += struct.pack("<I", 0)
        return out

    full0 = list(ifd0)
    if exif_ifd:
        full0.append((0x8769, 4, 1, struct.pack("<I", exif_off)))
    if gps_ifd:
        full0.append((0x8825, 4, 1, struct.pack("<I", gps_off)))
    tiff = bytearray(b"II*\x00" + struct.pack("<I", 8))
    tiff += emit(full0)
    if exif_ifd:
        tiff += emit(exif_ifd)
    if gps_ifd:
        tiff += emit(gps_ifd)
    tiff += heap
    seg = b"Exif\x00\x00" + bytes(tiff)
    app1 = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
    return jpeg[:2] + app1 + jpeg[2:]
