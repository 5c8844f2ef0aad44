"""Pure-python animated-GIF codec (decode-complete, encode for tests).

Companion to ``sources/png.py``: gives the multimodal video path
(``pipeline/multimodal.py: sample_video_frames``) a REAL container format
with zero external dependencies. GIF = logical screen + per-frame
LZW-compressed palette indices; everything needed is stdlib + numpy.

Decoder handles the full animation feature set a scraped-GIF corpus hits:
GIF87a/89a, global and local color tables, interlaced frames, transparency
index, frame offsets smaller than the canvas, disposal methods 0/1
(draw-over) and 2 (restore background), per-frame delays from the Graphic
Control Extension. Encoder writes a valid GIF89a with a real LZW
compressor (global palette built from the frames; ≤256 unique colors —
it's a test/round-trip tool, the decode side is the production path).

No counterpart exists in the reference (it renders PNG only,
``core/.../util/MultibandRender.scala``) — this module belongs to the
training-data pipeline extension of the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width 3..12)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as python list of bytes; reset template
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]

    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: int | None = None
    out = bytearray()
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                # missing EOI: tolerate truncated streams
                return np.frombuffer(bytes(out), dtype=np.uint8)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: first code not literal")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        table.append(table[prev] + entry[:1])
        prev = code
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes((px,))
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # decoder grows its width when ITS table hits 2^size; ours leads by
        # the in-flight code, so grow at the same boundary
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes((px,))
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(arr: np.ndarray) -> np.ndarray:
    h = arr.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(arr)
    out[order] = arr
    return out


def _decode_gif_impl(buf: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> list of (delay_ms, H x W x 3 uint8 RGB frame), frames
    fully composed onto the logical canvas (disposal + transparency
    honored). Raises ValueError on malformed input."""
    if len(buf) < 13 or buf[:3] != b"GIF" or buf[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF stream")
    width, height, flags, bg_idx, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(buf[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        canvas[:] = global_pal[bg_idx]
    bg_color = canvas[0, 0].copy()

    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0

    def read_subblocks(p):
        chunks = []
        while p < len(buf):
            sz = buf[p]
            p += 1
            if sz == 0:
                break
            chunks.append(buf[p:p + sz])
            p += sz
        return b"".join(chunks), p

    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = buf[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack_from("<BHB", body, 0)
                delay_ms = delay_cs * 10
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
            continue
        if b0 != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(buf[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("frame without any color table")
        min_code = buf[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _lzw_decode(min_code, lzw)
        if len(idx) < fw * fh:
            raise ValueError("short frame data")
        idx = idx[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        region = canvas[fy:fy + fh, fx:fx + fw]
        safe = np.minimum(idx, len(pal) - 1)
        rgb = pal[safe]
        if transparent is not None:
            opaque = (idx != transparent)[..., None]
            region[:] = np.where(opaque, rgb, region)
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:
            canvas[fy:fy + fh, fx:fx + fw] = bg_color
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def decode_gif(buf: bytes) -> list[tuple[int, np.ndarray]]:
    try:
        return _decode_gif_impl(buf)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed GIF: {e}") from e


decode_gif.__doc__ = _decode_gif_impl.__doc__


def encode_gif(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """H x W x 3 uint8 frames (≤256 unique colors total) -> animated GIF89a.
    Full-frame images, one global palette, real LZW compression."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    if stack.shape[1:] != (h, w, 3):
        raise ValueError("all frames must be H x W x 3 and equally sized")
    flat = stack.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"{len(pal)} unique colors; quantize to <=256 before encoding")
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    pal_size = 1 << pal_bits
    pal_full = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    idx_frames = inv.astype(np.uint8).reshape(len(frames), h, w)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_full.tobytes()
    # netscape loop extension (loop forever) — standard for animations
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, pal_bits)
    for fi in range(len(frames)):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_ms // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx_frames[fi])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
