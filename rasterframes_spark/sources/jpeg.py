"""Pure-python baseline JPEG (JFIF) codec.

Completes the image-codec story next to ``png.py`` (lossless) — JPEG is
the dominant scraped-web format, so ``decode_image(decode='jpeg')`` makes
the multimodal image path real for it with zero external dependencies.

Decoder: baseline sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2,
Annex G: spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs) — the two framings that cover the scraped
web; Huffman entropy coding, grayscale or YCbCr with any sampling factors
up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart markers, 8- and 16-bit
quantization tables. Arithmetic coding raises ValueError. The per-block
IDCT is one batched numpy einsum per component — the bit-level Huffman
walk is the only python loop.

Encoder: baseline 4:4:4/422/420 (or grayscale) with the JPEG Annex K
example tables scaled by ``quality``; ``progressive=True`` re-emits the
SAME quantized coefficients as an SOF2 scan script exercising all four
progressive scan kinds — since entropy framing is lossless, progressive
and baseline outputs of one encode must decode bit-identically, which is
the decoder's internal consistency oracle (the jpegtran identity).

All constants (zigzag order, Annex K tables) are from the public JPEG
standard (ITU-T T.81)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# Decode-side allocation bound: the coefficient store / output planes are
# sized from header-declared dimensions, so a tiny corrupted stream could
# otherwise demand a multi-GB allocation (MemoryError crashing a Spark
# task). 2^27 pixels = 134 MP covers any real scraped-web image.
_MAX_PIXELS = 1 << 27

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis matrix: spatial = M.T @ coeff @ M
_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16) *
                (np.sqrt(0.125) if u == 0 else 0.5)
                for x in range(8)] for u in range(8)])

# ITU-T T.81 Annex K quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_huff(bits, huffval):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past the end
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller resyncs
                else:
                    break  # real marker: end of scan
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next RST marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _huff_decode(br: _BitReader, table) -> int:
    if table is None:
        raise ValueError("missing Huffman table for scan")
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_jpeg_impl(buf: bytes) -> np.ndarray:
    """JPEG bytes -> H x W x 3 uint8 RGB (or H x W x 1 for grayscale);
    baseline and progressive. Raises ValueError on malformed input."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    restart_interval = 0
    frame = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        pos += 1
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
        while pos < len(buf) and buf[pos] == 0xFF:
            pos += 1
        if pos + 1 >= len(buf):
            break
        marker = buf[pos]
        pos += 1
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length field
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        if seglen < 2:
            raise ValueError("jpeg: segment length < 2")
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype("f8")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype="u1").astype("f8")
                    p += 64
                z = np.zeros(64)
                z[_ZIGZAG] = vals
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17:p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huff(bits, huffval)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progr.
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if h == 0 or w == 0 or h * w > _MAX_PIXELS:
                raise ValueError(f"jpeg: frame {w}x{h} out of bounds "
                                 f"(cap {_MAX_PIXELS} pixels)")
            if nc == 0:
                # explicit: zero components would otherwise survive to
                # the hmax computation (max() over an empty sequence)
                # and surface as an opaque ValueError (ADVICE r13)
                raise ValueError("jpeg: SOF with zero components")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated SOF component list")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hh, vv = hv >> 4, hv & 0x0F
                if not (1 <= hh <= 4 and 1 <= vv <= 4):
                    raise ValueError(
                        f"jpeg: sampling factors {hh}x{vv} out of range")
                comps.append({"id": cid, "h": hh, "v": vv, "tq": tq})
            # data-proportional bound (r12 fuzz; refined r13, ADVICE r12
            # #1): every 8x8 block costs >= 1 entropy bit in SOME scan
            # (a DC size/first-pass code is at least one Huffman bit),
            # so a real frame needs >= total_blocks/8 compressed bytes.
            # Block count comes from the ACTUAL sampling factors — the
            # old h*w/256-bytes form assumed >= one block per 64 pixels
            # (luma at max factors), which over-rejected spec-legal
            # frames whose max factor sits on a non-luma component (up
            # to 16x fewer blocks per pixel).  A mutated SOF dim just
            # under the absolute cap otherwise buys seconds of
            # Huffman-decode work from a KB-scale file.
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            total_blocks = sum(
                -(-w * c["h"] // (8 * hmax)) * -(-h * c["v"] // (8 * vmax))
                for c in comps)
            if total_blocks > 8 * len(buf):
                raise ValueError(f"jpeg: frame {w}x{h} implausible for "
                                 f"{len(buf)}-byte stream")
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                coef_store = _alloc_coef_store(frame)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_pos = pos + seglen
            if not frame["progressive"]:
                return _decode_scan(buf, data_pos, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                buf, data_pos, frame, scan, huff_dc, huff_ac,
                restart_interval, coef_store, ss, se,
                ahal >> 4, ahal & 0x0F)
            continue
        pos += seglen
    if frame is not None and frame.get("progressive"):
        return _reconstruct(frame, coef_store, qt)
    raise ValueError("no scan data found")


def decode_jpeg(buf: bytes) -> np.ndarray:
    try:
        return _decode_jpeg_impl(buf)
    except (struct.error, IndexError, KeyError, StopIteration) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


decode_jpeg.__doc__ = _decode_jpeg_impl.__doc__


def _decode_scan(buf, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient block stacks
    blocks = {c["id"]: [] for c in comps}
    br = _BitReader(buf, pos)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            br.align_to_marker()
            pred = {c["id"]: 0 for c in comps}
        for comp, tdc, tac in scan:
            for _ in range(comp["h"] * comp["v"]):
                zz = np.zeros(64, dtype=np.float64)
                t = _huff_decode(br, huff_dc[tdc])
                if t > 15:   # T.81: DC category <= 11 (8-bit) / 15 (12-bit)
                    raise ValueError(f"jpeg: DC category {t} out of range")
                diff = _extend(br.receive(t), t) if t else 0
                pred[comp["id"]] += diff
                zz[0] = pred[comp["id"]]
                k = 1
                while k < 64:
                    rs = _huff_decode(br, huff_ac[tac])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz[k] = _extend(br.receive(s), s)
                    k += 1
                blocks[comp["id"]].append(zz)
    return _finish(comps, blocks, qt, mcux, mcuy, hmax, vmax, h, w)


def _finish(comps, blocks, qt, mcux, mcuy, hmax, vmax, h, w):
    """Shared tail: per-component zigzag block stacks in MCU scan order
    -> dequantize, batched IDCT, plane assembly, colorspace."""
    n_mcu = mcux * mcuy
    planes = []
    for comp in comps:
        bs = np.stack(blocks[comp["id"]])  # (n, 64) zigzag
        deq = np.zeros_like(bs, dtype=np.float64)
        deq[:, _ZIGZAG] = bs * qt[comp["tq"]].reshape(-1)[_ZIGZAG]
        coef = deq.reshape(-1, 8, 8)
        spatial = np.einsum("ur,nuv,vc->nrc", _C, coef, _C)
        spatial = np.clip(np.round(spatial + 128), 0, 255).astype(np.uint8)
        # blocks are in MCU scan order: reassemble the component plane
        ch, cv = comp["h"], comp["v"]
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        per_mcu = ch * cv
        for m in range(n_mcu):
            my, mx = divmod(m, mcux)
            base = m * per_mcu
            for b in range(per_mcu):
                by, bx = divmod(b, ch)
                y0 = (my * cv + by) * 8
                x0 = (mx * ch + bx) * 8
                plane[y0:y0 + 8, x0:x0 + 8] = spatial[base + b]
        # upsample to full resolution then crop
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w].astype(np.float64))
    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — ITU-T T.81 Annex G
# ---------------------------------------------------------------------------


def _alloc_coef_store(frame):
    """Per-component zigzag coefficient grids, MCU-padded (interleaved DC
    scans address padding blocks inside partial MCUs), plus each
    component's TRUE block-grid dims (non-interleaved scans cover only
    those)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    store = {"mcux": mcux, "mcuy": mcuy, "hmax": hmax, "vmax": vmax}
    for c in comps:
        cw = -(-frame["w"] * c["h"] // hmax)
        chh = -(-frame["h"] * c["v"] // vmax)
        store[c["id"]] = {
            "coef": np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                             dtype=np.int32),
            "nbr": -(-chh // 8), "nbc": -(-cw // 8)}
    return store


def _next_marker(buf, pos):
    """First position >= pos of a real (non-stuffing, non-RST) marker."""
    while pos + 1 < len(buf):
        if buf[pos] == 0xFF and buf[pos + 1] != 0x00 \
                and not (0xD0 <= buf[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return len(buf)


def _decode_prog_scan(buf, pos, frame, scan, huff_dc, huff_ac, ri,
                      store, ss, se, ah, al):
    """One progressive scan into the coefficient store; returns the
    position of the marker that ends the scan."""
    br = _BitReader(buf, pos)
    interleaved = len(scan) > 1
    if ss == 0:
        if se != 0:
            raise ValueError("progressive: DC scan with Se != 0")
        _prog_dc_scan(br, frame, scan, huff_dc, ri, store, ah, al,
                      interleaved)
    else:
        if interleaved:
            raise ValueError("progressive: AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("progressive: bad spectral range")
        _prog_ac_scan(br, scan[0], huff_ac, ri, store, ss, se, ah, al)
    return _next_marker(buf, br.pos)


def _prog_dc_scan(br, frame, scan, huff_dc, ri, store, ah, al,
                  interleaved):
    pred = {c["id"]: 0 for c, _, _ in scan}
    if interleaved:
        mcux, mcuy = store["mcux"], store["mcuy"]
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                br.align_to_marker()
                pred = {c["id"]: 0 for c, _, _ in scan}
            my, mx = divmod(m, mcux)
            for comp, tdc, _tac in scan:
                cg = store[comp["id"]]["coef"]
                for b in range(comp["h"] * comp["v"]):
                    by, bx = divmod(b, comp["h"])
                    _dc_one(br, huff_dc.get(tdc), pred, comp, ah, al,
                            cg[my * comp["v"] + by, mx * comp["h"] + bx])
    else:
        comp, tdc, _tac = scan[0]
        st = store[comp["id"]]
        cg = st["coef"]
        n = 0
        for by in range(st["nbr"]):
            for bx in range(st["nbc"]):
                if ri and n and n % ri == 0:
                    br.align_to_marker()
                    pred = {comp["id"]: 0}
                _dc_one(br, huff_dc.get(tdc), pred, comp, ah, al,
                        cg[by, bx])
                n += 1


def _dc_one(br, table, pred, comp, ah, al, zz):
    if ah == 0:
        t = _huff_decode(br, table)
        if t > 15:   # T.81: DC category <= 11 (8-bit) / 15 (12-bit)
            raise ValueError(f"jpeg: DC category {t} out of range")
        diff = _extend(br.receive(t), t) if t else 0
        pred[comp["id"]] += diff
        zz[0] = pred[comp["id"]] << al
    else:
        if br.read_bit():
            zz[0] = int(zz[0]) | (1 << al)


def _prog_ac_scan(br, scan_comp, huff_ac, ri, store, ss, se, ah, al):
    comp, _tdc, tac = scan_comp
    st = store[comp["id"]]
    cg = st["coef"]
    table = huff_ac.get(tac)
    eobrun = 0
    n = 0
    for by in range(st["nbr"]):
        for bx in range(st["nbc"]):
            if ri and n and n % ri == 0:
                br.align_to_marker()
                eobrun = 0
            n += 1
            zz = cg[by, bx]
            if ah == 0:
                eobrun = _ac_first(br, table, zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(br, table, zz, ss, se, al, eobrun)


def _ac_first(br, table, zz, ss, se, al, eobrun):
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            e = (1 << r) - 1
            if r:
                e += br.receive(r)
            return e
        k += r
        if k > se:
            raise ValueError("progressive: AC run past band end")
        zz[k] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(br, table, zz, ss, se, al, eobrun):
    """T.81 G.1.2.3: refinement scan — new ±1<<Al significances with
    interleaved correction bits for already-nonzero coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    # FULL run count here (unlike _ac_first): the tail
                    # below must still refine the rest of THIS band,
                    # then decrement for it
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                val = 0           # ZRL: pass 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("progressive: refine size != 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if zz[k]:
                    if br.read_bit() and not (int(zz[k]) & p1):
                        zz[k] = int(zz[k]) + (p1 if zz[k] > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k]:
                if br.read_bit() and not (int(zz[k]) & p1):
                    zz[k] = int(zz[k]) + (p1 if zz[k] > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, store, qt):
    """All scans consumed: coefficient grids -> pixels via the shared
    baseline tail (blocks re-listed in MCU scan order)."""
    comps = frame["comps"]
    mcux, mcuy = store["mcux"], store["mcuy"]
    hmax, vmax = store["hmax"], store["vmax"]
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 not supported")
    blocks = {}
    for c in comps:
        cg = store[c["id"]]["coef"]
        lst = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for b in range(c["h"] * c["v"]):
                by, bx = divmod(b, c["h"])
                lst.append(cg[my * c["v"] + by, mx * c["h"] + bx]
                           .astype(np.float64))
        blocks[c["id"]] = lst
    return _finish(comps, blocks, qt, mcux, mcuy, hmax, vmax,
                   frame["h"], frame["w"])


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4 / grayscale, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _enc_table(bits, huffval):
    """symbol -> (code, length)"""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * s + 50) / 100)
    return np.clip(q, 1, 255)


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsampling: str = "444",
                restart_interval: int = 0, progressive: bool = False) -> bytes:
    """H x W x 3 RGB (or H x W / H x W x 1 grayscale) uint8 -> JFIF bytes
    (Annex K tables scaled by quality). ``subsampling``: '444',
    '422' (2x1-averaged chroma) or '420' (2x2-averaged chroma); ``restart_interval`` > 0 emits DRI +
    RSTn markers every N MCUs (baseline only). ``progressive=True`` emits
    the same quantized coefficients as an SOF2 scan script (DC first
    Al=1, DC refine, per-component AC first Al=1 and AC refine) — decodes
    bit-identically to the baseline encoding of the same input."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("1 or 3 channels required")
    a = a.astype(np.float64)
    if nc == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        tids = [0, 1, 1]
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for i in (1, 2):
                p = planes[i]
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                planes[i] = (ph[0::2, 0::2] + ph[1::2, 0::2]
                             + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
        elif subsampling == "422":
            samp = [(2, 1), (1, 1), (1, 1)]
            for i in (1, 2):
                p = planes[i]
                ph = np.pad(p, ((0, 0), (0, p.shape[1] % 2)), mode="edge")
                planes[i] = (ph[:, 0::2] + ph[:, 1::2]) / 2.0
        elif subsampling == "444":
            samp = [(1, 1)] * 3
        else:
            raise ValueError("subsampling must be '444', '422' or '420'")
    else:
        planes = [a[..., 0]]
        qids = [0]
        tids = [0]
        samp = [(1, 1)]

    ql = _scale_q(_QL.reshape(8, 8), quality)
    qc = _scale_q(_QC.reshape(8, 8), quality)
    qts = [ql, qc]
    dc_tabs = [_enc_table(*_DC_L), _enc_table(*_DC_C)]
    ac_tabs = [_enc_table(*_AC_L), _enc_table(*_AC_C)]

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for i, q in enumerate(qts[: 2 if nc == 3 else 1]):
        z = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, i) + z.tobytes()
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        out += bytes((i + 1, (samp[i][0] << 4) | samp[i][1], qids[i]))
    if not progressive:
        # the progressive scan script writes its own two-pass optimized
        # DHTs under the same table ids — emitting the Annex K baseline
        # tables here too would be ~450 dead bytes per file
        for i, (bits, hv) in enumerate([_DC_L, _DC_C][: 2 if nc == 3 else 1]):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(hv), i) \
                + bytes(bits) + bytes(hv)
        for i, (bits, hv) in enumerate([_AC_L, _AC_C][: 2 if nc == 3 else 1]):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(hv), 0x10 | i) \
                + bytes(bits) + bytes(hv)
    if restart_interval and not progressive:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if not progressive:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for i in range(nc):
            out += bytes((i + 1, (tids[i] << 4) | tids[i]))
        out += b"\x00\x3f\x00"

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component: pad plane to its MCU-aligned size, batched forward DCT
    coefs = []
    ncols = []
    for ci, p in enumerate(planes):
        ch, cv = samp[ci]
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        nbr, nbc = ph // 8, pw // 8
        blocks = (pp.reshape(nbr, 8, nbc, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8) - 128.0)
        c = np.einsum("ur,nrc,vc->nuv", _C, blocks, _C)
        coefs.append(np.round(c / qts[qids[ci]]).astype(np.int64))
        ncols.append(nbc)

    if progressive:
        out += _emit_progressive(coefs, ncols, samp, tids, nc,
                                 mcux, mcuy, h, w, hmax, vmax)
        out += b"\xff\xd9"
        return bytes(out)

    def put_block(zz, ci):
        dc_t, ac_t = dc_tabs[tids[ci]], ac_tabs[tids[ci]]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _cat(diff)
        code, ln = dc_t[t]
        bw.write(code, ln)
        if t:
            v = diff if diff >= 0 else diff + (1 << t) - 1
            bw.write(v & ((1 << t) - 1), t)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _cat(v)
            code, ln = ac_t[(run << 4) | s]
            bw.write(code, ln)
            ev = v if v >= 0 else v + (1 << s) - 1
            bw.write(ev & ((1 << s) - 1), s)
            run = 0
        if last < 63:
            code, ln = ac_t[0x00]
            bw.write(code, ln)

    bw = _BitWriter()
    pred = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes((0xFF, 0xD0 | (rst % 8)))
            rst += 1
            pred = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            ch, cv = samp[ci]
            for b in range(ch * cv):
                by, bx = divmod(b, ch)
                bi = (my * cv + by) * ncols[ci] + (mx * ch + bx)
                put_block(coefs[ci][bi].reshape(-1)[_ZIGZAG], ci)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive emission (encoder side of Annex G)
# ---------------------------------------------------------------------------


def _msh(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncate toward zero)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _sos_header(comp_ids, tids_dc, tids_ac, ss, se, ah, al) -> bytes:
    ns = len(comp_ids)
    out = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
    for cid, td, ta in zip(comp_ids, tids_dc, tids_ac):
        out += bytes((cid, (td << 4) | ta))
    out += bytes((ss, se, (ah << 4) | al))
    return bytes(out)


def _optimize_huffman(freq: dict) -> tuple:
    """Annex K.2 'suggested table generation': symbol frequencies ->
    (bits[1..16], huffval), with the reserved pseudo-symbol 256 ensuring
    the all-ones code stays unused and the >16-length adjustment."""
    f = [0] * 257
    for s, c in freq.items():
        f[s] = c
    f[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        lo1 = lo2 = None
        for i in range(257):
            if f[i] > 0:
                if lo1 is None or f[i] < lo1 or (f[i] == lo1 and i > v1):
                    v2, lo2 = v1, lo1
                    v1, lo1 = i, f[i]
                elif lo2 is None or f[i] < lo2 or (f[i] == lo2 and i > v2):
                    v2, lo2 = i, f[i]
        if v2 < 0:
            break
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # adjust_bits: fold lengths > 16 down (K.2 figure K.3)
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # remove the reserved symbol's code (largest length)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    huffval = [s for s in sorted(range(256),
                                 key=lambda s: (codesize[s], s))
               if codesize[s]]
    return bits[1:17], huffval


class _SymCounter:
    """Stands in for an encode table during the statistics pass."""

    def __init__(self):
        self.freq = {}

    def __getitem__(self, sym):
        self.freq[sym] = self.freq.get(sym, 0) + 1
        return (0, 1)


class _NullWriter:
    def write(self, code, length):
        pass

    def flush(self):
        pass


def _emit_progressive(coefs, ncols, samp, tids, nc, mcux, mcuy, h, w,
                      hmax, vmax) -> bytes:
    """Scan script: DC first (Al=1) -> DC refine -> per-component AC
    first (Ss=1..63, Al=1) -> per-component AC refine.  Exercises all
    four progressive scan kinds.  Two passes, libjpeg-style: the Annex K
    baseline tables lack the EOBn symbols progressive needs, so pass 1
    gathers per-table symbol statistics and pass 2 emits with optimized
    tables (Annex K.2) declared via in-stream DHTs."""
    ntab = 2 if nc == 3 else 1

    def grid(ci):
        """(nbr_true, nbc_true) — non-interleaved scans cover only the
        component's own ceil-grid, not MCU padding."""
        ch, cv = samp[ci]
        return (-(-(h * cv) // (vmax * 8)), -(-(w * ch) // (hmax * 8)))

    zz_grids = []
    for ci in range(nc):
        nbr, nbc = grid(ci)
        zz_grids.append([coefs[ci][by * ncols[ci] + bx].reshape(-1)[_ZIGZAG]
                         for by in range(nbr) for bx in range(nbc)])

    def dc_first_scan(bw, dc_tabs):
        pred = [0] * nc
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(nc):
                ch, cv = samp[ci]
                for b in range(ch * cv):
                    by, bx = divmod(b, ch)
                    bi = (my * cv + by) * ncols[ci] + (mx * ch + bx)
                    dc = int(coefs[ci][bi][0, 0]) >> 1   # arithmetic shift
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    t = _cat(diff)
                    code, ln = dc_tabs[tids[ci]][t]
                    bw.write(code, ln)
                    if t:
                        v = diff if diff >= 0 else diff + (1 << t) - 1
                        bw.write(v & ((1 << t) - 1), t)
        bw.flush()

    def dc_refine_scan(bw):
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(nc):
                ch, cv = samp[ci]
                for b in range(ch * cv):
                    by, bx = divmod(b, ch)
                    bi = (my * cv + by) * ncols[ci] + (mx * ch + bx)
                    bw.write(int(coefs[ci][bi][0, 0]) & 1, 1)
        bw.flush()

    def ac_first_scan(bw, ac_t, ci):
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_t[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0

        for zz in zz_grids[ci]:
            vals = [_msh(int(zz[k]), 1) for k in range(64)]
            nzk = [k for k in range(1, 64) if vals[k]]
            if not nzk:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(1, nzk[-1] + 1):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_t[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _cat(v)
                code, ln = ac_t[(run << 4) | s]
                bw.write(code, ln)
                ev = v if v >= 0 else v + (1 << s) - 1
                bw.write(ev & ((1 << s) - 1), s)
                run = 0
            if nzk[-1] < 63:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.flush()

    def ac_refine_scan(bw, ac_t, ci):
        eobrun = 0
        eob_bits = []

        def flush_eob_r():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_t[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                for bit in eob_bits:
                    bw.write(bit, 1)
                eob_bits.clear()
                eobrun = 0

        for zz in zz_grids[ci]:
            vals = [int(zz[k]) for k in range(64)]        # Al = 0
            run = 0
            bits = []
            new_sig = [k for k in range(1, 64) if abs(vals[k]) == 1]
            eobpos = new_sig[-1] if new_sig else 0
            for k in range(1, 64):
                t = vals[k]
                at = abs(t)
                if at == 0:
                    run += 1
                    continue
                # ZRLs must flush BEFORE a correction bit is buffered —
                # the decoder's post-symbol walk only passes nonzero
                # coefficients within a 16-zero window.  Past the last
                # new significance zeros fold into the EOB run instead.
                while run > 15 and k <= eobpos:
                    flush_eob_r()
                    code, ln = ac_t[0xF0]
                    bw.write(code, ln)
                    for bit in bits:
                        bw.write(bit, 1)
                    bits.clear()
                    run -= 16
                if at > 1:
                    bits.append(at & 1)
                    continue
                # newly significant: |t| == 1
                flush_eob_r()
                code, ln = ac_t[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if t > 0 else 0, 1)
                for bit in bits:
                    bw.write(bit, 1)
                bits.clear()
                run = 0
            if run > 0 or bits:
                eobrun += 1
                eob_bits.extend(bits)
                if eobrun == 0x7FFF:
                    flush_eob_r()
        flush_eob_r()
        bw.flush()

    # ---- pass 1: symbol statistics
    dc_cnt = [_SymCounter() for _ in range(ntab)]
    ac_cnt = [_SymCounter() for _ in range(ntab)]
    dc_first_scan(_NullWriter(), dc_cnt)
    for ci in range(nc):
        ac_first_scan(_NullWriter(), ac_cnt[tids[ci]], ci)
        ac_refine_scan(_NullWriter(), ac_cnt[tids[ci]], ci)

    # ---- optimized tables + DHTs
    out = bytearray()
    dc_tabs = []
    ac_tabs = []
    for i in range(ntab):
        bits, hv = _optimize_huffman(dc_cnt[i].freq or {0: 1})
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(hv), i) \
            + bytes(bits) + bytes(hv)
        dc_tabs.append(_enc_table(bits, hv))
        bits, hv = _optimize_huffman(ac_cnt[i].freq or {0: 1})
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(hv), 0x10 | i) \
            + bytes(bits) + bytes(hv)
        ac_tabs.append(_enc_table(bits, hv))

    # ---- pass 2: emit scans
    bw = _BitWriter()
    out += _sos_header([i + 1 for i in range(nc)],
                       [tids[i] for i in range(nc)], [0] * nc, 0, 0, 0, 1)
    dc_first_scan(bw, dc_tabs)
    out += bw.out

    bw = _BitWriter()
    out += _sos_header([i + 1 for i in range(nc)], [0] * nc, [0] * nc,
                       0, 0, 1, 0)
    dc_refine_scan(bw)
    out += bw.out

    for ci in range(nc):
        bw = _BitWriter()
        out += _sos_header([ci + 1], [0], [tids[ci]], 1, 63, 0, 1)
        ac_first_scan(bw, ac_tabs[tids[ci]], ci)
        out += bw.out

        bw = _BitWriter()
        out += _sos_header([ci + 1], [0], [tids[ci]], 1, 63, 1, 0)
        ac_refine_scan(bw, ac_tabs[tids[ci]], ci)
        out += bw.out
    return bytes(out)
