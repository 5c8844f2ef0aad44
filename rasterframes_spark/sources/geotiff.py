"""Pure-python GeoTIFF codec (no rasterio/GDAL in this environment).

Implements the subset of TIFF 6.0 + GeoTIFF 1.1 the engine's sources and
sinks need (reference reader surface: ``datasource/.../geotiff/``,
``core/.../ref/RFRasterSource.scala``):

- read: classic + BigTIFF (magic 43, 8-byte offsets) little/big-endian;
  strip- or tile-organized;
  uncompressed or DEFLATE (8 / 32946); uint8/16/32, int8/16/32,
  float32/64; single- or multi-band chunky (PlanarConfiguration=1);
  windowed reads (only the strips/tiles overlapping the window are
  decoded — the I/O-pruning contract lazy tiles rely on);
- georeferencing: ModelPixelScale + ModelTiepoint -> extent;
  GeoKeyDirectory -> EPSG code; GDAL_NODATA;
- write: tiled (or stripped) DEFLATE GeoTIFF with the same tags.
"""

from __future__ import annotations

import math
import struct
import zlib
from dataclasses import dataclass

import numpy as np

__all__ = ["GeoTiffInfo", "read_info", "read_window", "read_full", "write_geotiff"]

_SAMPLE_DTYPES = {
    # (SampleFormat, BitsPerSample) -> numpy dtype
    (1, 8): "uint8", (1, 16): "uint16", (1, 32): "uint32",
    (2, 8): "int8", (2, 16): "int16", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
}
_TAG_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TAG_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
            16: "Q", 17: "q", 18: "Q"}


@dataclass
class GeoTiffInfo:
    width: int
    height: int
    bands: int
    dtype: str
    nodata: float | None
    crs: str
    extent: tuple  # (xmin, ymin, xmax, ymax)
    tile_width: int | None
    tile_height: int | None
    rows_per_strip: int | None
    compression: int
    chunk_offsets: list
    chunk_counts: list
    byte_order: str
    pixel_scale: tuple
    tiepoint: tuple
    predictor: int = 1
    # which decoder realizes windows: "tiff" = this module's pure-python
    # reader; "gdal" = the optional rasterio fallback (gdal_fallback.py)
    via: str = "tiff"


def _slice(data, a: int, b: int) -> bytes:
    """Byte range [a, b) from plain bytes or a range source (an object with
    ``read_range`` — see sources/rangeio.py). Keeping ALL byte access behind
    this choke point is what makes remote windowed reads fetch ~tile bytes
    instead of whole objects."""
    if hasattr(data, "read_range"):
        return data.read_range(a, b - a)
    return data[a:b]


def _unpack(fmt: str, data, off: int):
    return struct.unpack(fmt, _slice(data, off, off + struct.calcsize(fmt)))


def _read_ifd(data: bytes, bo: str, off: int, big: bool = False):
    """Parse one IFD. ``big=True`` reads the BigTIFF layout (8-byte entry
    count, 20-byte entries, 8-byte inline value field) — same tag
    semantics, wider offsets, so >4 GB rasters parse pure-python.
    Returns the tag dict; the offset of the NEXT IFD in the chain (0 at
    chain end) lands under key ``-1`` for multi-IFD files (overview levels
    of a COG)."""
    if big:
        (n,) = _unpack(bo + "Q", data, off)
        entry_sz, vfo, cnt_fmt, ptr_fmt, inline = 20, 12, "HHQ", "Q", 8
        table = _slice(data, off + 8, off + 8 + entry_sz * n + 8)
        (next_off,) = struct.unpack_from(bo + "Q", table, entry_sz * n)
    else:
        (n,) = _unpack(bo + "H", data, off)
        entry_sz, vfo, cnt_fmt, ptr_fmt, inline = 12, 8, "HHI", "I", 4
        # one fetch for the whole tag table (+ the next-IFD pointer)
        table = _slice(data, off + 2, off + 2 + entry_sz * n + 4)
        (next_off,) = struct.unpack_from(bo + "I", table, entry_sz * n)
    tags = {}
    for i in range(n):
        base = entry_sz * i
        tag, typ, count = struct.unpack_from(bo + cnt_fmt, table, base)
        size = _TAG_SIZES.get(typ, 1) * count
        if size <= inline:
            raw = table[base + vfo: base + vfo + size]
        else:
            (ptr,) = struct.unpack_from(bo + ptr_fmt, table, base + vfo)
            raw = _slice(data, ptr, ptr + size)
        if len(raw) != size:
            # must reject BEFORE struct.unpack: a corrupted 32-bit count
            # would otherwise build a multi-GB format string (found by
            # mutation fuzzing as an uninterruptible hang)
            raise ValueError("truncated TIFF tag data")
        if typ in _TAG_FMT:
            vals = list(struct.unpack(bo + _TAG_FMT[typ] * count, raw))
        elif typ == 2:  # ascii
            vals = [raw.rstrip(b"\x00").decode("ascii", "replace")]
        elif typ == 5:  # rational
            parts = struct.unpack(bo + "II" * count, raw)
            vals = [parts[2 * j] / (parts[2 * j + 1] or 1) for j in range(count)]
        else:
            vals = [raw]
        tags[tag] = vals
    tags[-1] = [next_off]
    return tags


def _read_info_impl(data) -> GeoTiffInfo:
    head = _slice(data, 0, 16)
    if head[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF (bad byte-order mark)")
    bo = "<" if head[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", head, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from(bo + "I", head, 4)
        t = _read_ifd(data, bo, ifd_off)
    elif magic == 43:  # BigTIFF
        (off_sz, pad) = struct.unpack_from(bo + "HH", head, 4)
        if off_sz != 8 or pad != 0:
            raise ValueError("malformed BigTIFF header")
        (ifd_off,) = struct.unpack_from(bo + "Q", head, 8)
        t = _read_ifd(data, bo, ifd_off, big=True)
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    return _info_from_tags(t, bo)


def _int_tag(t: dict, tag: int, default=None, lo: int = 1,
             hi: int = 1 << 48) -> int:
    """Tag value as a bounded int; corrupted files routinely flip a tag's
    TYPE byte so the value parses as bytes/str/float — without this check
    those leak into arithmetic as raw TypeErrors (found by mutation
    fuzzing)."""
    vals = t.get(tag)
    if vals is None:
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default
    v = vals[0]
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    if not isinstance(v, int) or isinstance(v, bool) or not (lo <= v <= hi):
        raise ValueError(f"malformed TIFF tag {tag}: {v!r}")
    return v


def _info_from_tags(t: dict, bo: str) -> "GeoTiffInfo":
    width = _int_tag(t, 256)
    height = _int_tag(t, 257)
    bands = _int_tag(t, 277, 1, hi=1 << 16)
    bits = _int_tag(t, 258, 8, hi=64)
    fmt = _int_tag(t, 339, 1, hi=6)
    if (fmt, bits) not in _SAMPLE_DTYPES:
        raise ValueError(f"unsupported TIFF sample type ({fmt}, {bits})")
    dtype = _SAMPLE_DTYPES[(fmt, bits)]
    comp = _int_tag(t, 259, 1, hi=1 << 16)
    nodata = None
    if 42113 in t:
        try:
            nodata = float(str(t[42113][0]).strip())
        except ValueError:
            pass

    # georeferencing (corrupt type bytes can deliver bytes/str here too)
    scale = tuple(t.get(33550, [1.0, 1.0, 0.0]))
    tie = tuple(t.get(33922, [0.0, 0.0, 0.0, 0.0, float(height), 0.0]))
    if not all(isinstance(v, (int, float)) for v in scale[:2] + tie[:6]) \
            or len(scale) < 2 or len(tie) < 5:
        raise ValueError("malformed TIFF georeferencing tags")
    # tiepoint: raster (i,j,k) -> model (x,y,z); standard: (0,0) -> (xmin, ymax)
    xmin = tie[3] - tie[0] * scale[0]
    ymax = tie[4] + tie[1] * scale[1]
    extent = (xmin, ymax - height * scale[1], xmin + width * scale[0], ymax)

    crs = "EPSG:4326"
    if 34735 in t:
        keys = t[34735]  # 4-short header, then 4 shorts per key entry
        for j in range(4, len(keys) - 3, 4):
            kid, loc, cnt, val = keys[j], keys[j + 1], keys[j + 2], keys[j + 3]
            if kid in (2048, 3072) and loc == 0 and val not in (0, 32767):
                crs = f"EPSG:{val}"

    if 322 in t:  # tiled
        tw, th = _int_tag(t, 322), _int_tag(t, 323)
        offsets, counts = t.get(324), t.get(325)
        rps = None
        nchunks = math.ceil(width / tw) * math.ceil(height / th)
    else:
        tw = th = None
        rps = _int_tag(t, 278, height)
        offsets, counts = t.get(273), t.get(279)
        nchunks = math.ceil(height / rps)
    # chunk-grid invariant: the offset/count arrays must cover exactly the
    # grid the dimensions imply (per planar band). Corrupted dimension tags
    # otherwise send read paths into billion-iteration loops or huge
    # allocations before any per-chunk check fires.
    if offsets is None or counts is None:
        raise ValueError("TIFF missing chunk offset/bytecount tags")
    if not (nchunks <= len(offsets) <= nchunks * bands) \
            or len(counts) != len(offsets):
        raise ValueError(
            f"TIFF chunk table size {len(offsets)} inconsistent with "
            f"{nchunks}-chunk grid")
    if not all(isinstance(v, int) and 0 <= v < 1 << 62
               for v in list(offsets) + list(counts)):
        raise ValueError("malformed TIFF chunk offset/bytecount values")

    predictor = _int_tag(t, 317, 1, hi=3)
    return GeoTiffInfo(width, height, bands, dtype, nodata, crs, extent,
                       tw, th, rps, comp, list(offsets), list(counts), bo,
                       scale, tie, predictor)


def read_info(data) -> GeoTiffInfo:
    try:
        return _read_info_impl(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed TIFF: {e}") from e


def read_ifd_chain(data, max_ifds: int = 64) -> list[GeoTiffInfo]:
    """Parse EVERY IFD in the file — index 0 is the full-resolution image,
    the rest are overview levels (COG pyramid, NewSubfileType=1). Each
    entry is a full :class:`GeoTiffInfo`, so ``read_window`` works against
    any level for progressively zoomed reads."""
    try:
        head = _slice(data, 0, 16)
        if head[:2] not in (b"II", b"MM"):
            raise ValueError("not a TIFF (bad byte-order mark)")
        bo = "<" if head[:2] == b"II" else ">"
        (magic,) = struct.unpack_from(bo + "H", head, 2)
        big = magic == 43
        if magic == 42:
            (off,) = struct.unpack_from(bo + "I", head, 4)
        elif big:
            (off,) = struct.unpack_from(bo + "Q", head, 8)
        else:
            raise ValueError(f"not a TIFF (magic {magic})")
        infos = []
        seen = set()
        while off and off not in seen and len(infos) < max_ifds:
            seen.add(off)
            t = _read_ifd(data, bo, off, big=big)
            infos.append(_info_from_tags(t, bo))
            off = t[-1][0]
        return infos
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed TIFF: {e}") from e


read_info.__doc__ = _read_info_impl.__doc__


def _lzw_decode_tiff(data: bytes) -> bytes:
    """TIFF6 LZW: 8-bit symbols, Clear=256, EOI=257, MSB-first bit packing,
    early code-width change (the TIFF spec's off-by-one vs plain LZW)."""
    CLEAR, EOI = 256, 257
    base = [bytes((i,)) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev = None
    out = bytearray()
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated: return what we have
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            out += table[code]
            prev = code
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("corrupt TIFF LZW stream")
            out += entry
            table.append(table[prev] + entry[:1])
            prev = code
        # early change: width grows one code EARLIER than plain LZW.
        # The decoder's table lags the encoder's next-free-code by one at
        # the same stream point, so the spec's "switch when next code is
        # 2^w - 1" lands here at len(table) == 2^w - 2 (libtiff uses the
        # same -2 boundary in tif_lzw.c).
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += data[i:i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _decompress(chunk: bytes, comp: int, expected: int | None = None) -> bytes:
    if comp == 1:
        return chunk
    if comp in (8, 32946):
        try:
            if expected is not None:
                # cap output at the chunk's declared raster size so a
                # corrupted (or hostile) stream can't balloon memory
                d = zlib.decompressobj()
                out = d.decompress(chunk, expected)
                if d.unconsumed_tail:
                    raise ValueError(
                        "TIFF deflate chunk decodes past its raster size")
                return out
            return zlib.decompress(chunk)
        except zlib.error as e:
            raise ValueError(f"corrupt TIFF deflate chunk: {e}") from e
    if comp == 5:
        return _lzw_decode_tiff(chunk)
    if comp == 32773:
        return _packbits_decode(chunk)
    raise ValueError(f"unsupported TIFF compression: {comp}")


def _unpredict(arr: np.ndarray, predictor: int) -> np.ndarray:
    """Undo TIFF predictor=2 (horizontal differencing) along each row;
    wraps in the storage dtype like the spec requires."""
    if predictor == 2:
        return np.cumsum(arr, axis=1, dtype=arr.dtype)
    if predictor in (1, 0):
        return arr
    raise ValueError(f"unsupported TIFF predictor: {predictor}")


def read_window(data: bytes, info: GeoTiffInfo, col_off: int, row_off: int,
                width: int, height: int, band: int = 0) -> np.ndarray:
    """Decode only the chunks overlapping the window (windowed-read contract
    of RasterRef.realizedTile, ref/RasterRef.scala:49-64)."""
    dt = np.dtype(info.dtype).newbyteorder(info.byte_order)
    out = np.zeros((height, width), dtype=info.dtype)

    if info.tile_width:  # tiled layout
        tw, th = info.tile_width, info.tile_height
        tiles_across = math.ceil(info.width / tw)
        t0c, t1c = col_off // tw, (col_off + width - 1) // tw
        t0r, t1r = row_off // th, (row_off + height - 1) // th
        for tr in range(t0r, t1r + 1):
            for tc in range(t0c, t1c + 1):
                idx = tr * tiles_across + tc
                if info.chunk_counts[idx] == 0:
                    # sparse TIFF/COG convention: offset 0 / bytecount 0
                    # means "tile never written" — leave the fill value
                    continue
                raw = _decompress(
                    _slice(data, info.chunk_offsets[idx],
                           info.chunk_offsets[idx] + info.chunk_counts[idx]),
                    info.compression)
                arr = _unpredict(
                    np.frombuffer(raw, dtype=dt).reshape(th, tw, info.bands)[:, :, band],
                    info.predictor)
                # intersect tile with window
                r0 = max(row_off, tr * th)
                r1 = min(row_off + height, tr * th + th, info.height)
                c0 = max(col_off, tc * tw)
                c1 = min(col_off + width, tc * tw + tw, info.width)
                if r1 <= r0 or c1 <= c0:
                    continue
                out[r0 - row_off: r1 - row_off, c0 - col_off: c1 - col_off] = (
                    arr[r0 - tr * th: r1 - tr * th, c0 - tc * tw: c1 - tc * tw]
                )
    else:  # strips
        rps = info.rows_per_strip
        s0, s1 = row_off // rps, (row_off + height - 1) // rps
        for s in range(s0, s1 + 1):
            if info.chunk_counts[s] == 0:
                continue  # sparse strip — leave the fill value
            raw = _decompress(
                _slice(data, info.chunk_offsets[s],
                       info.chunk_offsets[s] + info.chunk_counts[s]),
                info.compression)
            nrows = min(rps, info.height - s * rps)
            arr = _unpredict(
                np.frombuffer(raw, dtype=dt).reshape(nrows, info.width, info.bands)[:, :, band],
                info.predictor)
            r0 = max(row_off, s * rps)
            r1 = min(row_off + height, s * rps + nrows)
            if r1 <= r0:
                continue
            out[r0 - row_off: r1 - row_off, :] = (
                arr[r0 - s * rps: r1 - s * rps, col_off: col_off + width]
            )
    return out


def read_full(data: bytes, band: int = 0) -> tuple[np.ndarray, GeoTiffInfo]:
    info = read_info(data)
    return read_window(data, info, 0, 0, info.width, info.height, band), info


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_FMT_FOR_KIND = {"u": 1, "i": 2, "f": 3}


def write_geotiff(arr: np.ndarray, extent: tuple, crs: str = "EPSG:4326",
                  nodata: float | None = None, tile_size: int = 256,
                  big: bool | str = "auto") -> bytes:
    """Encode a 2-D (single band) or 3-D (H,W,bands) array as a tiled
    DEFLATE GeoTIFF. ``big``: True emits BigTIFF (magic 43, 8-byte
    offsets); 'auto' switches to BigTIFF when any offset would overflow
    the classic format's uint32 fields (>4 GB outputs)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    dt = arr.dtype
    bits = dt.itemsize * 8
    fmt = _FMT_FOR_KIND[dt.kind]
    xmin, ymin, xmax, ymax = extent
    sx, sy = (xmax - xmin) / w, (ymax - ymin) / h

    ts = min(tile_size, 16 * math.ceil(max(w, h) / 16))
    ts = max(16, ts)
    tiles_across = math.ceil(w / ts)
    tiles_down = math.ceil(h / ts)
    chunks = []
    for tr in range(tiles_down):
        for tc in range(tiles_across):
            block = np.zeros((ts, ts, bands), dtype=dt)
            r1 = min(h, (tr + 1) * ts)
            c1 = min(w, (tc + 1) * ts)
            block[: r1 - tr * ts, : c1 - tc * ts] = arr[tr * ts: r1, tc * ts: c1]
            chunks.append(zlib.compress(block.astype(dt.newbyteorder("<")).tobytes(), 6))

    epsg = 4326
    c = crs.strip().upper()
    if c.startswith("EPSG:"):
        epsg = int(c.split(":")[1])
    model_type = 2 if epsg == 4326 else 1
    geo_key_id = 2048 if model_type == 2 else 3072
    geokeys = [1, 1, 0, 3,
               1024, 0, 1, model_type,
               1025, 0, 1, 1,  # RasterPixelIsArea
               geo_key_id, 0, 1, epsg]

    nodata_s = (f"{nodata} ".encode("ascii") + b"\x00") if nodata is not None else None

    # assemble: header | tag data area | chunk data | IFD
    tags = []  # (tag, type, count, values) — values as packed bytes or small ints

    def add(tag, typ, values):
        tags.append((tag, typ, values))

    add(256, 3, [w])
    add(257, 3, [h])
    add(258, 3, [bits] * bands)
    add(259, 3, [8])  # deflate
    add(262, 3, [1])
    add(277, 3, [bands])
    add(284, 3, [1])  # chunky
    add(322, 3, [ts])
    add(323, 3, [ts])
    add(339, 3, [fmt] * bands)
    add(33550, 12, [sx, sy, 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, xmin, ymax, 0.0])
    add(34735, 3, geokeys)
    if nodata_s:
        add(42113, 2, nodata_s)

    # layout decision: classic unless an offset would overflow uint32
    data_bytes = sum(len(c) for c in chunks)
    if big == "auto":
        big = 16 + data_bytes + 4096 > 0xFFFF0000
    if big:
        header_size, off_typ, inline = 16, 16, 8
        entry_hdr, ptr_fmt = "<HHQ", "<Q"
    else:
        header_size, off_typ, inline = 8, 4, 4
        entry_hdr, ptr_fmt = "<HHI", "<I"

    # chunk data first (after header), then tag overflow data, then IFD
    chunk_offsets = []
    pos = header_size
    for chk in chunks:
        chunk_offsets.append(pos)
        pos += len(chk)
    add(324, off_typ, chunk_offsets)
    add(325, off_typ, [len(c) for c in chunks])
    tags.sort(key=lambda x: x[0])

    overflow = b""
    overflow_base = pos
    # first compute overflow sizes
    packed = []
    for tag, typ, values in tags:
        if typ == 2:
            raw = values if isinstance(values, bytes) else bytes(values)
            count = len(raw)
        else:
            fmtch = _TAG_FMT[typ]
            raw = struct.pack("<" + fmtch * len(values), *values)
            count = len(values)
        packed.append((tag, typ, count, raw))
    for tag, typ, count, raw in packed:
        if len(raw) > inline:
            overflow += raw
    ifd_off = overflow_base + len(overflow)

    # now emit entries with correct overflow pointers
    ov_pos = overflow_base
    body = b""
    for tag, typ, count, raw in packed:
        if len(raw) <= inline:
            body += struct.pack(entry_hdr, tag, typ, count) + raw.ljust(inline, b"\x00")
        else:
            body += struct.pack(entry_hdr, tag, typ, count) + struct.pack(ptr_fmt, ov_pos)
            ov_pos += len(raw)
    if big:
        ifd = struct.pack("<Q", len(packed)) + body + struct.pack("<Q", 0)
    else:
        ifd = struct.pack("<H", len(packed)) + body + struct.pack("<I", 0)

    out = bytearray()
    if big:
        out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    else:
        out += b"II" + struct.pack("<HI", 42, ifd_off)
    for chk in chunks:
        out += chk
    out += overflow
    out += ifd
    return bytes(out)
