"""Pure-python FLAC codec (decode + encode) — the first *compressed*
audio format the training pipeline can featurize in-container.

Scope: the full mandatory decode surface of the FLAC format spec
(RFC 9639 / xiph format.html) for streams up to 32 bps:

- metadata walk (STREAMINFO + skip-all-others);
- frame headers: both blocking strategies, all blocksize/sample-rate/
  sample-size codes (incl. the STREAMINFO-referencing code 0), UTF-8
  coded frame/sample numbers, CRC-8 verification;
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (orders 1-32),
  wasted-bits unary prefix;
- residuals: 4-bit (method 0) and 5-bit (method 1) Rice partitions with
  escape-to-raw partitions, any partition order;
- stereo decorrelation: independent, left/side, right/side, mid/side;
- frame CRC-16 verification.

Decoding is exact integer arithmetic throughout (numpy int64 for the
vectorizable fixed-predictor integration, python ints in the LPC tap
loop), so decode(encode(x)) is bit-identical to x by construction — and
the WAV path provides an independent in-container cross-check on the
same samples (tests/test_flac.py).

The encoder exists to make the codec testable end-to-end and as a real
sink: fixed predictors (order chosen per frame by residual-sum), an
optional integer-LPC mode, verbatim fallback, optional wasted-bits
detection, mid/left/right-side stereo modes, Rice partitions with
escape — every decoder branch has an encoder switch that produces it.

The reference cannot read or write FLAC at all (its raster/audio I/O
delegates to GDAL/JVM; `core/.../ref/RFRasterSource.scala:105-158`).

Like the JP2 codec this is a correctness-first pure-python bitstream
implementation: per-sample Rice loops run at CPython speed (~1-3 µs per
sample), which parallelizes linearly across executors via
``decode_audio`` but is 10-50x a C libFLAC — the runbook notes the
cost.  Metadata-only triage (``read_flac_info``) stays the cheap path.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------

def _mk_crc8():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _mk_crc16():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _mk_crc8()
_CRC16 = _mk_crc16()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("d", "p")

    def __init__(self, d: bytes, bitpos: int = 0):
        self.d = d
        self.p = bitpos

    def read(self, n: int) -> int:
        p = self.p
        end = p + n
        if (end + 7) >> 3 > len(self.d):
            raise ValueError("flac: bitstream truncated")
        v = int.from_bytes(self.d[p >> 3:(end + 7) >> 3], "big")
        v >>= (-end) & 7
        self.p = end
        return v & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def unary(self) -> int:
        d, p = self.d, self.p
        q = 0
        nbytes = len(d)
        while True:
            if p >> 3 >= nbytes:
                raise ValueError("flac: bitstream truncated in unary code")
            rem = d[p >> 3] & (0xFF >> (p & 7))
            if rem:
                stop = (p & ~7) + (7 - (rem.bit_length() - 1))
                q += stop - p
                self.p = stop + 1
                return q
            q += 8 - (p & 7)
            p = (p & ~7) + 8

    def align(self):
        self.p = (self.p + 7) & ~7


class _BitWriter:
    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def write(self, val: int, nbits: int):
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_TO_CODE = {v: k for k, v in _BPS_CODES.items()}

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise ValueError("flac: bad UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(nbytes):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_utf8_number(bw: _BitWriter, v: int):
    if v < 0x80:
        bw.write(v, 8)
        return
    # count 6-bit payload groups
    groups = []
    while v:
        groups.append(v & 0x3F)
        v >>= 6
    n = len(groups)
    # lead byte = n one-bits, a zero, then 7 - n payload bits (n = total
    # bytes incl. the lead); grow if the top group doesn't fit
    if groups[-1] >> max(0, 7 - n):
        groups.append(0)
        n += 1
    lead = ((0xFF << (8 - n)) & 0xFF) | groups[-1]
    bw.write(lead, 8)
    for g in reversed(groups[:-1]):
        bw.write(0x80 | g, 8)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        k = br.read(plen)
        if k == escape:
            nb = br.read(5)
            if nb == 0:
                out[pos:pos + n] = 0
            else:
                for i in range(n):
                    out[pos + i] = br.read_signed(nb)
        else:
            unary = br.unary
            read = br.read
            for i in range(n):
                q = unary()
                u = (q << k) | read(k) if k else q
                out[pos + i] = (u >> 1) ^ -(u & 1)
        pos += n
    return out


def _undiff(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k finite difference given k warmup samples —
    vectorized as k cumulative sums (exact int64 integer math)."""
    if order == 0:
        return res.copy()
    ws = [warm.astype(np.int64)]
    for _ in range(order - 1):
        ws.append(np.diff(ws[-1]))
    x = res.astype(np.int64)
    for j in range(order, 0, -1):
        seed = ws[j - 1][-1]
        x = np.cumsum(np.concatenate(([seed], x)))[1:]
    return np.concatenate([ws[0], x])


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if t == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = br.read_signed(eff)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = np.array([br.read_signed(eff) for _ in range(order)],
                        dtype=np.int64)
        res = _read_residual(br, blocksize, order)
        out = _undiff(warm, res, order)
    elif t >= 32:  # LPC order 1-32
        order = t - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        x = warm + [0] * (blocksize - order)
        # sequential IIR tap loop — python ints are exact at any width
        rl = res.tolist()
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = rl[i - order] + (acc >> shift)
        out = np.array(x, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes):
    """FLAC bytes -> (int32 samples shape (n, channels), sample_rate,
    bits_per_sample).  Verifies frame header CRC-8 and frame CRC-16;
    raises ValueError on any malformed/unsupported structure."""
    try:
        return _decode_flac(data)
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        # truncated/corrupt payloads must surface uniformly as ValueError
        # (the corrupt-row-drop contract of pipeline callers)
        raise ValueError(f"flac: malformed stream: {e}") from e


def _decode_flac(data: bytes):
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad signature")
    pos = 4
    st_rate = st_ch = st_bps = st_total = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if hdr & 0x7F == 0:
            if blen < 34:
                raise ValueError("flac: short STREAMINFO")
            st_rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            st_ch = ((body[12] >> 1) & 0x7) + 1
            st_bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            st_total = ((body[13] & 0x0F) << 32) | struct.unpack(
                ">I", body[14:18])[0]
        pos += 4 + blen
        if hdr & 0x80:
            break
    if st_rate is None:
        raise ValueError("flac: missing STREAMINFO")

    chans = []
    total = 0
    while pos < len(data) and (st_total == 0 or total < st_total):
        frame_start = pos
        br = _BitReader(data, pos * 8)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("flac: reserved bit set in frame header")
        br.read(1)  # blocking strategy (both fine: number is unused here)
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        _utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            rate = st_rate
        elif rate_code == 12:
            rate = br.read(8) * 1000
        elif rate_code == 13:
            rate = br.read(16)
        elif rate_code == 14:
            rate = br.read(16) * 10
        elif rate_code == 15:
            raise ValueError("flac: invalid sample rate code")
        else:
            rate = _RATE_CODES[rate_code]
        if bps_code == 0:
            bps = st_bps
        elif bps_code in _BPS_CODES:
            bps = _BPS_CODES[bps_code]
        else:
            raise ValueError(f"flac: reserved sample size code {bps_code}")
        hdr_end = br.p >> 3
        if _crc8(data[frame_start:hdr_end]) != br.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            bps_l = bps + (1 if ch_code == 9 else 0)
            bps_r = bps + (1 if ch_code in (8, 10) else 0)
            a = _decode_subframe(br, blocksize, bps_l)
            b = _decode_subframe(br, blocksize, bps_r)
            if ch_code == 8:          # left/side
                subs = [a, a - b]
            elif ch_code == 9:        # right/side
                subs = [a + b, b]
            else:                     # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if nch != st_ch:
            raise ValueError("flac: frame channel count != STREAMINFO")
        br.align()
        crc_pos = br.p >> 3
        if _crc16(data[frame_start:crc_pos]) != br.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = br.p >> 3
        chans.append(np.stack(subs, axis=1))
        total += blocksize

    if not chans:
        raise ValueError("flac: no audio frames")
    out = np.concatenate(chans, axis=0)
    if st_total:
        out = out[:st_total]
    lo, hi = -(1 << (st_bps - 1)), (1 << (st_bps - 1)) - 1
    if out.min() < lo or out.max() > hi:
        raise ValueError("flac: decoded sample exceeds bit depth")
    return out.astype(np.int32), st_rate, st_bps


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _zigzag(r: np.ndarray) -> np.ndarray:
    return (r << 1) ^ (r >> 63)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> int:
    if not len(u):
        return 0
    mean = float(u.mean())
    k = min(30, max(0, int(mean).bit_length() - 1))
    best_k, best_c = 0, _rice_cost(u, 0)
    for kk in range(max(0, k - 1), min(31, k + 3)):
        c = _rice_cost(u, kk)
        if c < best_c:
            best_k, best_c = kk, c
    return best_k


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int = 0,
                    force_escape: bool = False):
    po = partition_order
    while blocksize % (1 << po) or (blocksize >> po) <= order and po:
        po -= 1
    # split into partitions, pick per-partition rice params first: if any
    # needs k >= 15 (the 4-bit escape code), the whole residual must use
    # method 1 (5-bit params, escape 31)
    parts, pos = [], 0
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        part = res[pos:pos + n].astype(np.int64)
        pos += n
        parts.append((part, _best_rice_k(_zigzag(part))))
    method = 1 if any(k >= 15 for _, k in parts) else 0
    plen, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    bw.write(method, 2)
    bw.write(po, 4)
    for part, k in parts:
        if force_escape:
            nb = max(2, int(np.abs(part).max()).bit_length() + 1) \
                if len(part) else 2
            bw.write(escape, plen)
            bw.write(nb, 5)
            for v in part.tolist():
                bw.write(int(v), nb)
            continue
        bw.write(k, plen)
        u = _zigzag(part)
        for uu in u.tolist():
            q = uu >> k
            bw.write(1, q + 1)      # q zeros then a 1
            if k:
                bw.write(uu & ((1 << k) - 1), k)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int,
                     method: str, partition_order: int,
                     force_escape: bool, lpc_order: int,
                     detect_wasted: bool):
    x = x.astype(np.int64)
    wasted = 0
    if detect_wasted and len(x) and np.any(x):
        # trailing-zero count common to every nonzero sample
        w = 64
        for v in x[x != 0].tolist():
            t = (v & -v).bit_length() - 1
            if t < w:
                w = t
            if w == 0:
                break
        wasted = min(w, bps - 1)
        if wasted:
            x = x >> wasted
    eff = bps - wasted
    bw.write(0, 1)

    if method == "constant" or (method == "auto" and len(x)
                                and np.all(x == x[0])):
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write(int(x[0]), eff)
        return
    if method == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for v in x.tolist():
            bw.write(int(v), eff)
        return
    if method == "lpc":
        order = lpc_order
        if len(x) <= order:
            raise ValueError("flac encode: block shorter than lpc order")
        # simple fixed integer predictor: deterministic, exactly invertible
        coefs = ([3, -1] + [0] * (order - 2))[:order] if order >= 2 else [1]
        prec, shift = 5, 1
        pred = np.zeros(len(x) - order, dtype=np.int64)
        for j, c in enumerate(coefs):
            pred += c * x[order - 1 - j:len(x) - 1 - j]
        res = x[order:] - (pred >> shift)
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        for v in x[:order].tolist():
            bw.write(int(v), eff)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        _write_residual(bw, res, len(x), order, partition_order, force_escape)
        return

    # fixed predictor: pick the order (0-2) minimizing |residual| sum
    best = None
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        res = np.diff(x, n=order) if order else x.copy()
        cost = int(np.abs(res).sum())
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, _ = best
    bw.write(8 + order, 6)
    _write_wasted(bw, wasted)
    for v in x[:order].tolist():
        bw.write(int(v), eff)
    _write_residual(bw, res, len(x), order, partition_order, force_escape)


def _write_wasted(bw: _BitWriter, wasted: int):
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)   # unary: (wasted-1) zeros then 1
    else:
        bw.write(0, 1)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                blocksize: int = 4096, method: str = "auto",
                stereo: str = "independent", partition_order: int = 0,
                force_escape: bool = False, lpc_order: int = 2,
                detect_wasted: bool = False) -> bytes:
    """Integer samples (n,) or (n, channels) -> FLAC bytes.

    ``method``: auto (constant/fixed per frame) | verbatim | lpc;
    ``stereo``: independent | left-side | right-side | mid-side (2ch
    only).  The switches exist so every decoder branch is producible
    and testable; defaults give a compact, spec-conformant stream."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if ch > 8:
        raise ValueError("flac: at most 8 channels")
    if bps not in _BPS_TO_CODE:
        raise ValueError(f"flac: bps must be one of {sorted(_BPS_TO_CODE)}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    xi = x.astype(np.int64)
    if xi.min() < lo or xi.max() > hi:
        raise ValueError("flac: samples exceed bit depth")
    if stereo != "independent" and ch != 2:
        raise ValueError("flac: stereo decorrelation needs 2 channels")

    out = bytearray(b"fLaC")
    if n == 0:
        mn = mx = 0
    elif n <= blocksize:
        mn = mx = n
    else:
        mx = blocksize
        mn = (n % blocksize) or blocksize
    si = bytearray(34)
    struct.pack_into(">HH", si, 0, mn or 16, mx or 16)
    # min/max frame size unknown -> 0
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    struct.pack_into(">I", si, 14, n & 0xFFFFFFFF)
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si)

    frame_idx = 0
    for start in range(0, max(n, 1), blocksize):
        blk = xi[start:start + blocksize]
        bs = len(blk)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)            # fixed-blocksize strategy
        bw.write(7, 4)            # explicit 16-bit blocksize-1
        bw.write(0, 4)            # rate: from STREAMINFO
        if stereo == "independent":
            ch_code = ch - 1
        else:
            ch_code = {"left-side": 8, "right-side": 9, "mid-side": 10}[stereo]
        bw.write(ch_code, 4)
        bw.write(_BPS_TO_CODE[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, frame_idx)
        bw.write(bs - 1, 16)
        # header is byte-aligned here by construction (14+1+1+4+4+4+3+1 = 32
        # bits + whole-byte utf8 + 16) -> CRC-8 over the emitted bytes
        assert bw.n == 0
        bw.write(_crc8(bytes(bw.out)), 8)

        if stereo == "independent":
            for c in range(ch):
                _encode_subframe(bw, blk[:, c], bps, method, partition_order,
                                 force_escape, lpc_order, detect_wasted)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo == "left-side":
                pairs = [(left, bps), (side, bps + 1)]
            elif stereo == "right-side":
                pairs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                pairs = [(mid, bps), (side, bps + 1)]
            for arr, b in pairs:
                _encode_subframe(bw, arr, b, method, partition_order,
                                 force_escape, lpc_order, detect_wasted)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_idx += 1
    return bytes(out)
