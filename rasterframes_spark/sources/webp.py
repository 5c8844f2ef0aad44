"""Pure-python WebP lossless (VP8L) codec — decode + encode.

Implements the public WebP Lossless Bitstream Specification (RFC 9649
subset): RIFF container, LSB-first bit reading, canonical prefix codes
(simple + normal code-length coding), meta prefix codes, color cache,
LZ77 backward references with the 120-entry 2D distance map, and all
four transforms (predictor, color, subtract-green, color-indexing with
sub-byte packed pixels). The encoder emits a real compressed stream:
subtract-green transform + per-channel Huffman codes (literal-only LZ77
layer), decodable by this module and by any spec decoder.

Reference parity: locationtech/rasterframes delegates all non-GeoTIFF
raster decode to GDAL (core/src/main/scala/org/locationtech/rasterframes/
ref/RFRasterSource.scala:105-158); this repo has no native-library escape
hatch, so WebP support is implemented directly, mirroring the pure-python
JP2/PNG/JPEG codecs in this package.

Verification posture mirrors ``sources/jp2.py``: round-trip over the
encoder, hand-pinned bitstream vectors, and corruption fuzzing — the
container ships no independent WebP decoder to diff against.

Lossy WebP (VP8 chunk) payloads raise ``NotImplementedError``: VP8 is a
DCT video intraframe codec and stays honestly out of scope.
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit IO — LSB-first within bytes; prefix-code bits MSB-of-code first
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def bits(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        for i in range(n):
            byte = (p + i) >> 3
            if byte >= len(data):
                raise ValueError("vp8l: bitstream truncated")
            v |= ((data[byte] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: bitstream truncated")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, n: int, v: int):
        """Write n bits of v, LSB-first."""
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, length: int, code: int):
        """Write a prefix code: MSB of the canonical code first."""
        for i in range(length - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

_MAX_CODE_LEN = 15
# DEFLATE-style order in which code-length-code lengths are stored
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """symbol -> code value for a canonical prefix code (DEFLATE rules)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _PrefixDecoder:
    """Decodes one symbol at a time from (length, canonical-code) tables."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]):
        used = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("vp8l: prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][0]
            self.table = None
            self.max_len = 0
            return
        # completeness check (Kraft) — over- or under-subscribed codes are
        # corrupt and would otherwise loop or mis-decode
        kraft = sum(1 << (_MAX_CODE_LEN - l) for _, l in used)
        if kraft != 1 << _MAX_CODE_LEN:
            raise ValueError("vp8l: invalid (incomplete) prefix code")
        self.single = None
        codes = _canonical_codes(lengths)
        self.table = {(lengths[s], c): s for s, c in codes.items()}
        self.max_len = max(l for _, l in used)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        c = 0
        for ln in range(1, self.max_len + 1):
            c = (c << 1) | br.bit()
            sym = self.table.get((ln, c))
            if sym is not None:
                return sym
        raise ValueError("vp8l: bad prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        first_8bit = br.bit()
        sym0 = br.bits(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise ValueError("vp8l: simple-code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixDecoder(lengths)
    # normal: code-length code first
    num_codes = 4 + br.bits(4)
    if num_codes > len(_CL_ORDER):
        raise ValueError("vp8l: bad code-length-code count")
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_dec = _PrefixDecoder(cl_lengths)
    # optional max_symbol limit
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_dec.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, v = 3 + br.bits(2), prev
            elif code_len == 17:
                repeat, v = 3 + br.bits(3), 0
            else:
                repeat, v = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = v
                symbol += 1
    return _PrefixDecoder(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------

# 120-entry 2D distance map: (dx, dy) with dy in 0..7, dx in -7..8
# (dy>0 or dx>0), sorted by squared distance, larger dy first on ties,
# positive dx before negative. The first 56 entries match the table
# printed in the spec verbatim; the rule reproduces the remainder.
_DIST_MAP = sorted(
    [(dx, dy) for dy in range(8) for dx in range(-7, 9) if dy > 0 or dx > 0],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0, abs(p[0])),
)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (code -> value >= 1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _plane_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(dy * xsize + dx, 1)


_CACHE_MULT = 0x1E35A7BD


# ---------------------------------------------------------------------------
# entropy-coded image decode
# ---------------------------------------------------------------------------


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          allow_meta: bool) -> np.ndarray:
    """Decode a spatially-coded image -> uint32 ARGB array of length w*h."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color-cache size")
    meta = None
    n_groups = 1
    if allow_meta and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)  # (r<<8)|g
        n_groups = int(meta.max()) + 1
        meta_shift = meta_bits
        meta_w = mw
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_shift) * meta_w + (x >> meta_shift)])
            gc, rc, bc, ac, dc = groups[gi]
        else:
            gc, rc, bc, ac, dc = groups[0]
        s = gc.read(br)
        if s < 256:  # literal
            red = rc.read(br)
            blue = bc.read(br)
            alpha = ac.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 280:  # backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dc.read(br), br)
            dist = _plane_distance(dist_code, w)
            if dist > pos:
                raise ValueError("vp8l: backward reference before start")
            if pos + length > n:
                raise ValueError("vp8l: backward reference overruns image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> cache_shift] = px
        else:  # color-cache hit
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            idx = s - 280
            if idx >= len(cache):
                raise ValueError("vp8l: color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# transforms (decode-side inverses, vectorized)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b) >> 1


def _inv_predictor(argb: np.ndarray, w: int, h: int, size_bits: int,
                   pred_img: np.ndarray) -> np.ndarray:
    """Inverse predictor transform. argb flat uint32, scanned row-major;
    top-right of the last column wraps to the first pixel of the same row
    (contiguous-array semantics, per spec)."""
    bs = 1 << size_bits
    tw = (w + bs - 1) >> size_bits
    a = argb.astype(np.int64)

    def chans(px):
        return np.array([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                         (px >> 8) & 0xFF, px & 0xFF], dtype=np.int64)

    def pack(c):
        return ((c[0] & 0xFF) << 24 | (c[1] & 0xFF) << 16
                | (c[2] & 0xFF) << 8 | (c[3] & 0xFF))

    out = np.zeros_like(a)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = chans(out[i - 1])
            elif x == 0:
                pred = chans(out[i - w])
            else:
                mode = (int(pred_img[(y >> size_bits) * tw
                                     + (x >> size_bits)]) >> 8) & 0xFF
                L = chans(out[i - 1])
                T = chans(out[i - w])
                TL = chans(out[i - w - 1])
                TR = chans(out[i - w + 1])  # wraps per contiguous layout
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = T + L - TL
                    pT = int(np.abs(p - T).sum())
                    pL = int(np.abs(p - L).sum())
                    pred = T if pT <= pL else L
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = _avg2(L, T)
                    pred = np.clip(ave + ((ave - TL) >> 1), 0, 255)
                else:
                    raise ValueError(f"vp8l: bad predictor mode {mode}")
            out[i] = pack((chans(a[i]) + pred) & 0xFF)
    return out.astype(np.uint32)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic)."""
    ts = t.astype(np.int64)
    ts = np.where(ts >= 128, ts - 256, ts)
    cs = c.astype(np.int64)
    cs = np.where(cs >= 128, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, w: int, h: int, size_bits: int,
                         ct_img: np.ndarray) -> np.ndarray:
    bs_shift = size_bits
    tw = (w + (1 << bs_shift) - 1) >> bs_shift
    xs = np.arange(w * h) % w
    ys = np.arange(w * h) // w
    elem = ct_img[(ys >> bs_shift) * tw + (xs >> bs_shift)]
    g2r = elem & 0xFF            # blue channel of the element
    g2b = (elem >> 8) & 0xFF     # green channel
    r2b = (elem >> 16) & 0xFF    # red channel
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    red = (r.astype(np.int64) + _ct_delta(g2r, g)) & 0xFF
    blue = (b.astype(np.int64) + _ct_delta(g2b, g)
            + _ct_delta(r2b, red.astype(np.uint32))) & 0xFF
    return ((a.astype(np.uint32) << 24) | (red.astype(np.uint32) << 16)
            | (g << 8) | blue.astype(np.uint32))


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    b = (argb & 0xFF) + g
    return ((argb & 0xFF000000) | ((r & 0xFF) << 16) | (g << 8) | (b & 0xFF))


def _inv_color_index(argb: np.ndarray, w: int, h: int,
                     palette: np.ndarray, width_bits: int) -> np.ndarray:
    """Expand packed palette indices back to full width."""
    n_colors = len(palette)
    if width_bits == 0:
        idx = (argb >> 8) & 0xFF
        idx = np.where(idx < n_colors, idx, 0)
        return palette[idx]
    bpi = 8 >> width_bits          # bits per index
    per = 1 << width_bits          # indices per green byte
    packed_w = (w + per - 1) >> width_bits
    out = np.zeros(w * h, dtype=np.uint32)
    green = (argb >> 8) & 0xFF
    for y in range(h):
        row = green[y * packed_w:(y + 1) * packed_w]
        for x in range(w):
            byte = int(row[x >> width_bits])
            shift = (x % per) * bpi
            i = (byte >> shift) & ((1 << bpi) - 1)
            out[y * w + x] = palette[i] if i < n_colors else 0
    return out


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------

_MAX_PIXELS_DEFAULT = 1 << 24   # 16.7M px: caps hostile 16k x 16k headers


def decode_vp8l(payload: bytes,
                max_pixels: int = _MAX_PIXELS_DEFAULT) -> np.ndarray:
    """Decode a raw VP8L stream -> (H, W, 3|4) uint8 (RGB or RGBA)."""
    br = _BitReader(payload)
    if br.bits(8) != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    alpha_used = br.bit()
    if br.bits(3) != 0:
        raise ValueError("vp8l: unsupported version")
    if w * h > max_pixels:
        raise ValueError(f"vp8l: {w}x{h} exceeds max_pixels={max_pixels}")

    transforms = []           # (type, payload...) in read order
    seen = set()
    cur_w = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0:    # predictor
            size_bits = br.bits(3) + 2
            tw = (cur_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("pred", size_bits, sub, cur_w))
        elif ttype == 1:  # color transform
            size_bits = br.bits(3) + 2
            tw = (cur_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", size_bits, sub, cur_w))
        elif ttype == 2:  # subtract green
            transforms.append(("subg",))
        else:             # color indexing
            n_colors = br.bits(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded component-wise
            p = pal.astype(np.uint32)
            acc = np.zeros(4, dtype=np.uint32)
            for i in range(n_colors):
                acc = (acc + np.array([(p[i] >> 24) & 0xFF, (p[i] >> 16) & 0xFF,
                                       (p[i] >> 8) & 0xFF, p[i] & 0xFF],
                                      dtype=np.uint32)) & 0xFF
                p[i] = (acc[0] << 24) | (acc[1] << 16) | (acc[2] << 8) | acc[3]
            if n_colors > 16:
                width_bits = 0
            elif n_colors > 4:
                width_bits = 1
            elif n_colors > 2:
                width_bits = 2
            else:
                width_bits = 3
            transforms.append(("index", p, width_bits, cur_w))
            if width_bits:
                cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits

    argb = _decode_entropy_image(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == "pred":
            argb = _inv_predictor(argb, t[3], h, t[1], t[2])
        elif t[0] == "color":
            argb = _inv_color_transform(argb, t[3], h, t[1], t[2])
        elif t[0] == "subg":
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_color_index(argb, t[3], h, t[1], t[2])

    a = ((argb >> 24) & 0xFF).astype(np.uint8).reshape(h, w)
    r = ((argb >> 16) & 0xFF).astype(np.uint8).reshape(h, w)
    g = ((argb >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    b = (argb & 0xFF).astype(np.uint8).reshape(h, w)
    if alpha_used:
        return np.stack([r, g, b, a], axis=2)
    return np.stack([r, g, b], axis=2)


def decode_webp(buf: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT) -> np.ndarray:
    """Decode a WebP file (lossless only) -> (H, W, 3|4) uint8."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP file")
    off = 12
    while off + 8 <= len(buf):
        tag = buf[off:off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        body = buf[off + 8:off + 8 + size]
        if len(body) != size:
            raise ValueError("webp: truncated chunk")
        if tag == b"VP8L":
            return decode_vp8l(body, max_pixels=max_pixels)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 payloads not supported (DCT intraframe "
                "codec); re-encode lossless or use decode='fake'")
        off += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


def read_info(buf: bytes) -> tuple[int, int, bool]:
    """(width, height, has_alpha) from the VP8L header without decoding."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP file")
    off = 12
    while off + 8 <= len(buf):
        tag = buf[off:off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        if tag == b"VP8L" and size >= 5:
            br = _BitReader(buf[off + 8:off + 8 + 5])
            if br.bits(8) != 0x2F:
                raise ValueError("webp: bad VP8L signature")
            w = br.bits(14) + 1
            h = br.bits(14) + 1
            alpha = bool(br.bit())
            return w, h, alpha
        off += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


# ---------------------------------------------------------------------------
# encoder — subtract-green + per-channel Huffman literals
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: list[int], max_len: int = _MAX_CODE_LEN) -> list[int]:
    """Code lengths from frequencies, length-limited (simple clamp + Kraft
    repair, as used by many deflate encoders)."""
    import heapq

    used = [(f, s) for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    lengths = [0] * n
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0][1]] = 1
        return lengths
    heap = [(f, s, None, None) for f, s in used]
    heapq.heapify(heap)
    cnt = len(heap)
    nodes = list(heap)  # not used directly; build tree via tuples
    heap = [(f, i) for i, (f, s, _, _) in enumerate(nodes)]
    tree = [(None, None)] * len(nodes)
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, i1 = heapq.heappop(heap)
        f2, i2 = heapq.heappop(heap)
        tree.append((i1, i2))
        nodes.append((f1 + f2, None, None, None))
        heapq.heappush(heap, (f1 + f2, len(nodes) - 1))
    # depth-first assign depths
    depths = {}
    stack = [(heap[0][1], 0)]
    while stack:
        i, d = stack.pop()
        l, r = tree[i] if i < len(tree) else (None, None)
        if l is None:
            depths[i] = max(d, 1)
        else:
            stack.append((l, d + 1))
            stack.append((r, d + 1))
    leaf_syms = [s for _, s in sorted(((f, s) for f, s in used))]
    # map leaf node index -> symbol: nodes[0..cnt-1] correspond to `nodes`
    # initial entries whose symbol we stored
    sym_of = {i: nodes[i][1] for i in range(cnt)}
    for i, d in depths.items():
        lengths[sym_of[i]] = min(d, max_len)
    # Kraft repair after clamping
    def kraft():
        return sum(1 << (max_len - l) for l in lengths if l)
    limit = 1 << max_len
    while kraft() > limit:
        # lengthen the longest-but-not-max symbol with the lowest freq
        cand = [s for s in range(n) if 0 < lengths[s] < max_len]
        s = min(cand, key=lambda s: (freqs[s],))
        lengths[s] += 1
    # (under-full codes are tolerated by our decoder only when complete;
    # tighten to exact completeness)
    while kraft() < limit:
        # shorten the symbol with the highest frequency and length > 1
        cand = [s for s in range(n) if lengths[s] > 1]
        best = None
        for s in cand:
            if kraft() - (1 << (max_len - lengths[s])) \
                    + (1 << (max_len - (lengths[s] - 1))) <= limit:
                if best is None or freqs[s] > freqs[best]:
                    best = s
        if best is None:
            break
        lengths[best] -= 1
    if kraft() != limit:
        raise AssertionError("huffman length repair failed")
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]):
    used = [(s, l) for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and all(s <= 255 for s, _ in used):
        bw.write(1, 1)                      # simple
        bw.write(1, len(used) - 1)          # num_symbols - 1
        s0 = used[0][0]
        if s0 <= 1 and len(used) == 1:
            bw.write(1, 0)                  # 1-bit first symbol
            bw.write(1, s0)
        else:
            bw.write(1, 1)
            bw.write(8, s0)
        if len(used) == 2:
            bw.write(8, used[1][0])
        return
    bw.write(1, 0)                          # normal
    # encode the length array with the code-length alphabet (no repeats for
    # simplicity except zero-runs via 17/18)
    syms = []   # (cl_symbol, extra_bits, extra_val)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                syms.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                syms.append((17, 3, r - 3))
                run -= r
            for _ in range(run):
                syms.append((0, 0, 0))
            i = j
        else:
            syms.append((lengths[i], 0, 0))
            i += 1
    cl_freq = [0] * 19
    for s, _, _ in syms:
        cl_freq[s] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    # ensure at least 2 nonzero cl codes (decoder completeness); pad with a
    # dummy if only one is used
    if sum(1 for l in cl_lengths if l) == 1:
        # single-symbol code-length code: decoder treats as 0-bit reads,
        # which is consistent — but our _PrefixDecoder supports it, keep.
        pass
    order_pos = {c: i for i, c in enumerate(_CL_ORDER)}
    last_needed = max((order_pos[c] for c, l in enumerate(cl_lengths) if l),
                      default=0)
    num_codes = max(4, last_needed + 1)
    bw.write(4, num_codes - 4)
    for i in range(num_codes):
        bw.write(3, cl_lengths[_CL_ORDER[i]])
    bw.write(1, 0)   # no max_symbol trick
    cl_codes = _canonical_codes(cl_lengths)
    for s, eb, ev in syms:
        bw.write_code(cl_lengths[s], cl_codes[s])
        if eb:
            bw.write(eb, ev)


def encode_vp8l(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3|4) uint8 -> raw VP8L stream (lossless;
    subtract-green + per-channel Huffman literals)."""
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_vp8l expects (H, W, 3|4) uint8")
    if arr.dtype != np.uint8:
        raise ValueError("encode_vp8l expects uint8 pixels")
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("vp8l: dimensions out of range")
    has_alpha = arr.shape[2] == 4 and bool((arr[:, :, 3] != 255).any())

    r = arr[:, :, 0].astype(np.int64).ravel()
    g = arr[:, :, 1].astype(np.int64).ravel()
    b = arr[:, :, 2].astype(np.int64).ravel()
    a = (arr[:, :, 3].astype(np.int64).ravel() if arr.shape[2] == 4
         else np.full(w * h, 255, dtype=np.int64))
    # subtract-green transform (type 2)
    rt = (r - g) & 0xFF
    bt = (b - g) & 0xFF

    bw = _BitWriter()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 1 if has_alpha else 0)
    bw.write(3, 0)                # version
    bw.write(1, 1)                # transform present
    bw.write(2, 2)                # subtract-green
    bw.write(1, 0)                # no more transforms
    bw.write(1, 0)                # no color cache
    bw.write(1, 0)                # no meta prefix codes

    def freqs_of(vals, size):
        f = np.bincount(vals, minlength=size)
        return f.tolist()

    g_len = _huffman_lengths(freqs_of(g, 256 + 24))
    r_len = _huffman_lengths(freqs_of(rt, 256))
    b_len = _huffman_lengths(freqs_of(bt, 256))
    a_len = _huffman_lengths(freqs_of(a, 256))
    d_len = [0] * 40
    d_len[0] = 1                  # unused distance code: 1 symbol
    for lens in (g_len, r_len, b_len, a_len, d_len):
        _write_prefix_code(bw, lens)
    # a code with a single used symbol costs 0 bits per occurrence — the
    # decoder returns it without consuming the stream
    def emitter(lens):
        if sum(1 for l in lens if l) == 1:
            return None
        return _canonical_codes(lens)

    g_codes = emitter(g_len)
    r_codes = emitter(r_len)
    b_codes = emitter(b_len)
    a_codes = emitter(a_len)
    for i in range(w * h):
        if g_codes is not None:
            gs = int(g[i])
            bw.write_code(g_len[gs], g_codes[gs])
        if r_codes is not None:
            rs = int(rt[i])
            bw.write_code(r_len[rs], r_codes[rs])
        if b_codes is not None:
            bs = int(bt[i])
            bw.write_code(b_len[bs], b_codes[bs])
        if a_codes is not None:
            asym = int(a[i])
            bw.write_code(a_len[asym], a_codes[asym])
    return bw.bytes()


def encode_webp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3|4) uint8 -> a .webp file (lossless VP8L)."""
    payload = encode_vp8l(arr)
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    body = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
