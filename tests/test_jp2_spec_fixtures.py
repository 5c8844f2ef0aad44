"""Hand-assembled JPEG 2000 (ITU-T T.800) spec-math fixtures.

VERDICT r8 #2: the r8 JP2 mode-switch machinery (BYPASS / RESET /
TERMALL / VSC / SEGSYM, ROI, packed headers, subsampling) was verified
by an own-encoder <-> own-decoder loop — a complementary spec
misreading shared by both sides could not be caught.  This file breaks
that loop the same way tests/test_video_container_fixtures.py broke the
MP4/WebM one: the bytes fed to the production decoder are produced by
an INDEPENDENT, flowchart-literal transcription of T.800 Annex C (MQ
arithmetic coder) and Annex D (EBCOT bit modeling) written in this test
file, sharing no code with rasterframes_spark/sources/jp2.py — plus one
micro code-block whose every coding decision and MQ register transition
is written out BY HAND in comments and whose segment bytes are pinned
as literals.

Structural independence notes:
- The Qe table and context tables are normative DATA (Tables C.2, D.1,
  D.3, D.4 of the spec) — both implementations must contain the same
  numbers; independence lives in the PROCEDURES (interval arithmetic,
  byte-out/carry, scan order, pass membership, run-length mode).
- This encoder keeps per-coefficient state in plain Python sets/dicts
  and (y, x) tuples; the production decoder uses flat numpy arrays with
  border cells, exec-generated unrolled kernels, and fused passes.  A
  shared bug would have to be a shared misreading of the prose itself.
- The parity direction is spec-encoder bytes -> production decoder.
  Decisions differ per mode bit (raw segments, context resets, stripe-
  causal masking, termination points), so each mode's decode path is
  pinned against independently produced bytes.

Spec references by section, e.g. [C.2.5] = ITU-T T.800 (08/2002)
Annex C section C.2.5 / flowchart figure named there.
"""
from __future__ import annotations

import numpy as np
import pytest

from rasterframes_spark.sources.jp2 import (
    CBSTYLE_BYPASS, CBSTYLE_RESET, CBSTYLE_SEGSYM, CBSTYLE_TERMALL,
    CBSTYLE_VSC, t1_decode_segmented)

# ---------------------------------------------------------------------------
# Annex C — the MQ arithmetic ENCODER, transcribed from the flowcharts.
# ---------------------------------------------------------------------------

# Table C.2 — the 47-state probability estimation table:
# (Qe, NMPS, NLPS, SWITCH)
QE_TABLE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

# Context labels used by this encoder (numbering is internal — only the
# per-context state sequences matter to the MQ bytes).  Initial index
# assignments per Table D.7: everything starts at state 0 with MPS=0,
# except significance-context 0 (state 4), run-length (state 3) and
# uniform (state 46).
CX_UNI = "uni"
CX_RL = "rl"


def initial_mq_states() -> dict:
    st = {CX_UNI: [46, 0], CX_RL: [3, 0], ("sig", 0): [4, 0]}
    for c in range(1, 9):
        st[("sig", c)] = [0, 0]
    for c in range(9, 14):
        st[("sign", c)] = [0, 0]
    for c in range(14, 17):
        st[("mag", c)] = [0, 0]
    return st


class SpecMQEncoder:
    """Flowchart-literal MQ encoder.

    Registers per [C.2.3]: A = interval (16 bit), C = code register
    (bits 27..19 form the partial byte b, bit 27 is the carry into the
    completed byte), CT = renorm shift counter, B = the byte pointed to
    by BP (modeled as ``out[-1]``; INITENC starts ``out`` with one
    sentinel byte standing for B(BP0-1), removed when the segment is
    taken)."""

    def __init__(self, states: dict):
        self.states = states
        # INITENC [C.2.8]: A = 0x8000, C = 0, CT = 12 (13 only if the
        # byte before the stream were 0xFF, which it never is here)
        self.A = 0x8000
        self.C = 0
        self.CT = 12
        self.out = bytearray([0])

    def encode(self, cx, d: int):
        """ENCODE [C.2.5]: CODE1/CODE0 dispatch to CODEMPS/CODELPS."""
        st = self.states[cx]
        qe, nmps, nlps, switch = QE_TABLE[st[0]]
        if d == st[1]:
            # CODEMPS [Figure C-8]
            self.A -= qe
            if (self.A & 0x8000) == 0:
                if self.A < qe:
                    self.A = qe
                else:
                    self.C += qe
                st[0] = nmps
                self._renorme()
            else:
                self.C += qe
        else:
            # CODELPS [Figure C-7]
            self.A -= qe
            if self.A < qe:
                self.C += qe
            else:
                self.A = qe
            if switch:
                st[1] = 1 - st[1]
            st[0] = nlps
            self._renorme()

    def _renorme(self):
        # RENORME [Figure C-9]
        while True:
            self.A = (self.A << 1) & 0xFFFF
            self.C <<= 1
            self.CT -= 1
            if self.CT == 0:
                self._byteout()
            if self.A & 0x8000:
                break

    def _byteout(self):
        # BYTEOUT [Figure C-10]: bit-stuffing after 0xFF (7-bit byte),
        # carry resolution into the completed byte otherwise
        o = self.out
        if o[-1] == 0xFF:
            o.append((self.C >> 20) & 0xFF)
            self.C &= 0xFFFFF
            self.CT = 7
        elif self.C < 0x8000000:
            o.append((self.C >> 19) & 0xFF)
            self.C &= 0x7FFFF
            self.CT = 8
        else:
            o[-1] += 1              # propagate the carry into B
            if o[-1] == 0xFF:
                self.C &= 0x7FFFFFF
                o.append((self.C >> 20) & 0xFF)
                self.C &= 0xFFFFF
                self.CT = 7
            else:
                o.append((self.C >> 19) & 0xFF)
                self.C &= 0x7FFFF
                self.CT = 8

    def flush(self) -> bytes:
        """FLUSH [Figure C-11] with SETBITS: pick the largest-suffix-of-
        ones value inside the final interval [C, C+A), push the last two
        partial bytes out, and drop a trailing 0xFF (the decoder
        resynthesizes 1-bits past the segment end)."""
        tempc = self.C + self.A
        self.C |= 0xFFFF
        if self.C >= tempc:
            self.C -= 0x8000
        self.C <<= self.CT
        self._byteout()
        self.C <<= self.CT
        self._byteout()
        seg = bytes(self.out[1:])
        while seg and seg[-1] == 0xFF:
            seg = seg[:-1]
        return seg


class SpecRawWriter:
    """Raw (lazy) codeword segment writer [D.6]: bits pack MSB-first;
    after a byte equal to 0xFF the next byte carries 7 payload bits (its
    MSB is a stuffed 0).  A terminated segment must not end on 0xFF."""

    def __init__(self):
        self.bits: list[int] = []

    def encode(self, _cx, bit: int):        # same emit signature as MQ
        self.bits.append(bit & 1)

    def flush(self) -> bytes:
        out = bytearray()
        cap, acc, n = 8, 0, 0
        for b in self.bits:
            acc = (acc << 1) | b
            n += 1
            if n == cap:
                out.append(acc)
                cap = 7 if acc == 0xFF else 8
                acc, n = 0, 0
        if n:
            out.append(acc << (cap - n))
        if out and out[-1] == 0xFF:
            out.append(0)
        return bytes(out)


# ---------------------------------------------------------------------------
# Annex D — EBCOT coefficient bit modeling (independent transcription).
# ---------------------------------------------------------------------------


def sig_context(orient: str, h: int, v: int, d: int) -> int:
    """Table D.1, transcribed row by row.  h/v = count of significant
    horizontal/vertical neighbors (0..2), d = diagonal (0..4)."""
    if orient == "HH":
        hv = h + v
        if d >= 3:
            return 8
        if d == 2:
            return 7 if hv >= 1 else 6
        if d == 1:
            return 5 if hv >= 2 else 4 if hv == 1 else 3
        return 2 if hv >= 2 else 1 if hv == 1 else 0
    if orient == "HL":                 # Table D.1: swap H and V for HL
        h, v = v, h
    if h == 2:
        return 8
    if h == 1:
        return 7 if v >= 1 else 6 if d >= 1 else 5
    if v == 2:
        return 4
    if v == 1:
        return 3
    return 2 if d >= 2 else 1 if d == 1 else 0


# Table D.3: (H contribution, V contribution) -> (context, XORbit),
# contributions in {-1, 0, +1}
SIGN_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class SpecT1Encoder:
    """Independent EBCOT encoder for one code-block.

    Keeps all state in (y, x)-keyed Python sets — deliberately nothing
    like the production decoder's flat bordered arrays.  Supports the
    five decoder-visible SPcod mode bits."""

    def __init__(self, coeffs: np.ndarray, orient: str, cbstyle: int):
        self.h, self.w = coeffs.shape
        self.mag = np.abs(coeffs).astype(np.int64)
        self.neg = coeffs < 0
        self.orient = orient
        self.cb = cbstyle
        self.nbp = int(self.mag.max()).bit_length()
        self.sig: set = set()          # significant coefficients
        self.became: set = set()       # became significant this plane
        self.visited: set = set()      # coded by this plane's sigprop
        self.refined: set = set()      # had >= 1 magnitude refinement

    # -- neighborhood with vertical-stripe-causal masking [D.3.1/D.4] --
    def _nb_sig(self, y, x):
        """(h, v, d) significant-neighbor counts.  With VSC, samples in
        the NEXT stripe (the row below a stripe's last row) read as
        insignificant."""
        vsc_cut = (self.cb & CBSTYLE_VSC) and (y % 4 == 3)

        def s(yy, xx):
            if not (0 <= yy < self.h and 0 <= xx < self.w):
                return 0
            if vsc_cut and yy == y + 1:
                return 0
            return 1 if (yy, xx) in self.sig else 0

        h = s(y, x - 1) + s(y, x + 1)
        v = s(y - 1, x) + s(y + 1, x)
        d = (s(y - 1, x - 1) + s(y - 1, x + 1)
             + s(y + 1, x - 1) + s(y + 1, x + 1))
        return h, v, d

    def _sign_ctx(self, y, x):
        """[D.3.2] H/V contributions: +1 if any significant-positive and
        no significant-negative neighbor on that axis, -1 mirrored, 0
        when none or both."""
        vsc_cut = (self.cb & CBSTYLE_VSC) and (y % 4 == 3)

        def c(yy, xx):
            if not (0 <= yy < self.h and 0 <= xx < self.w):
                return 0
            if vsc_cut and yy == y + 1:
                return 0
            if (yy, xx) not in self.sig:
                return 0
            return -1 if self.neg[yy, xx] else 1

        def axis(a, b):
            t = a + b
            return (t > 0) - (t < 0)

        hc = axis(c(y, x - 1), c(y, x + 1))
        vc = axis(c(y - 1, x), c(y + 1, x))
        return SIGN_TABLE[(hc, vc)]

    def _emit_sign(self, coder, y, x):
        ctx, xor = self._sign_ctx(y, x)
        bit = 1 if self.neg[y, x] else 0
        coder.encode(("sign", ctx), bit ^ xor)

    # -- scan order [D.2]: stripes of 4 rows, columns left-to-right --
    def _scan(self):
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    yield y, x

    # -- the three coding passes --
    def _sigprop(self, coder, plane, raw):
        """[D.3.1] codes the current plane's bit of every not-yet-
        significant coefficient with a non-zero significance context;
        raw variant [D.6] writes the bit (and sign) uncoded."""
        for y, x in self._scan():
            if (y, x) in self.sig:
                continue
            ctx = sig_context(self.orient, *self._nb_sig(y, x))
            if ctx == 0:
                continue
            bit = int(self.mag[y, x] >> plane) & 1
            if raw:
                coder.encode(None, bit)
            else:
                coder.encode(("sig", ctx), bit)
            if bit:
                self.sig.add((y, x))
                self.became.add((y, x))
                if raw:
                    coder.encode(None, 1 if self.neg[y, x] else 0)
                else:
                    self._emit_sign(coder, y, x)
            self.visited.add((y, x))

    def _magref(self, coder, plane, raw):
        """[D.3.3] refines every coefficient significant BEFORE this
        plane (those that became significant in this plane's sigprop or
        will in its cleanup are excluded).  Context (Table D.4): first
        refinement uses 15 when any neighbor is significant else 14;
        later refinements 16."""
        for y, x in self._scan():
            if (y, x) not in self.sig or (y, x) in self.became:
                continue
            bit = int(self.mag[y, x] >> plane) & 1
            if raw:
                coder.encode(None, bit)
            else:
                if (y, x) in self.refined:
                    ctx = 16
                else:
                    h, v, d = self._nb_sig(y, x)
                    ctx = 15 if h + v + d > 0 else 14
                coder.encode(("mag", ctx), bit)
            self.refined.add((y, x))

    def _cleanup(self, coder, plane):
        """[D.3.4] codes everything sigprop skipped; a full 4-sample
        column whose samples are all insignificant, unvisited and all in
        zero contexts enters run-length mode: one RL decision, then on a
        hit two UNIFORM bits locate the first newly-significant sample."""
        for y0 in range(0, self.h, 4):
            hs = min(4, self.h - y0)
            for x in range(self.w):
                y = y0
                if hs == 4:
                    col = [(y0 + i, x) for i in range(4)]
                    rl_ok = all(
                        p not in self.sig and p not in self.visited
                        and sig_context(self.orient, *self._nb_sig(*p)) == 0
                        for p in col)
                    if rl_ok:
                        bits = [int(self.mag[yy, xx] >> plane) & 1
                                for yy, xx in col]
                        if not any(bits):
                            coder.encode(CX_RL, 0)
                            continue              # whole column done
                        coder.encode(CX_RL, 1)
                        r = bits.index(1)
                        coder.encode(CX_UNI, (r >> 1) & 1)
                        coder.encode(CX_UNI, r & 1)
                        yy, xx = col[r]
                        self.sig.add((yy, xx))
                        self.became.add((yy, xx))
                        self._emit_sign(coder, yy, xx)
                        y = yy + 1               # rest of column: normal
                for y in range(y, y0 + hs):
                    p = (y, x)
                    if p in self.sig or p in self.visited:
                        continue
                    ctx = sig_context(self.orient, *self._nb_sig(y, x))
                    bit = int(self.mag[y, x] >> plane) & 1
                    coder.encode(("sig", ctx), bit)
                    if bit:
                        self.sig.add(p)
                        self.became.add(p)
                        self._emit_sign(coder, y, x)
        if self.cb & CBSTYLE_SEGSYM:
            for b in (1, 0, 1, 0):               # [D.5] 0b1010
                coder.encode(CX_UNI, b)
        self.visited = set()
        self.became = set()

    # -- pass sequencing, raw/MQ segmentation [D.4.1, D.6] --
    def encode(self):
        """Returns ([(segment bytes, n_passes)], total_passes, nbp)."""
        if self.nbp == 0:
            return [], 0, 0
        total = 3 * self.nbp - 2

        def is_raw(k):
            # the first 10 passes are always MQ; from pass 11 sigprop
            # and magref are raw under BYPASS, cleanup stays MQ
            if not (self.cb & CBSTYLE_BYPASS) or k < 11:
                return False
            return self._kind(k) != "cl"

        def terminates(k):
            if k >= total:
                return True
            if self.cb & CBSTYLE_TERMALL:
                return True
            if self.cb & CBSTYLE_BYPASS:
                # segment boundaries around each raw run: after the last
                # all-MQ cleanup (pass 10) and then after every magref
                # and cleanup
                return k >= 10 and self._kind(k) in ("mr", "cl")
            return False

        states = initial_mq_states()
        segs: list[tuple[bytes, int]] = []
        coder = None
        seg_np = 0
        k = 0
        for plane in range(self.nbp - 1, -1, -1):
            kinds = ("cl",) if plane == self.nbp - 1 else ("sp", "mr", "cl")
            for kind in kinds:
                k += 1
                raw = is_raw(k)
                if coder is None:
                    coder = SpecRawWriter() if raw else SpecMQEncoder(states)
                if self.cb & CBSTYLE_RESET:
                    fresh = initial_mq_states()
                    for key, val in fresh.items():
                        states[key][:] = val
                if kind == "sp":
                    self._sigprop(coder, plane, raw)
                elif kind == "mr":
                    self._magref(coder, plane, raw)
                else:
                    self._cleanup(coder, plane)
                seg_np += 1
                if terminates(k):
                    segs.append((coder.flush(), seg_np))
                    coder = None
                    seg_np = 0
        return segs, total, self.nbp

    @staticmethod
    def _kind(k):
        return "cl" if k == 1 else ("sp", "mr", "cl")[(k - 2) % 3]


def spec_encode(coeffs, orient="LL", cbstyle=0):
    return SpecT1Encoder(np.asarray(coeffs, dtype=np.int64), orient,
                         cbstyle).encode()


# ---------------------------------------------------------------------------
# Parity: spec-encoder bytes -> PRODUCTION decoder, across the mode matrix
# ---------------------------------------------------------------------------

MODES = [
    0,
    CBSTYLE_BYPASS,
    CBSTYLE_RESET,
    CBSTYLE_TERMALL,
    CBSTYLE_VSC,
    CBSTYLE_SEGSYM,
    CBSTYLE_BYPASS | CBSTYLE_TERMALL,
    CBSTYLE_BYPASS | CBSTYLE_RESET | CBSTYLE_TERMALL,
    CBSTYLE_RESET | CBSTYLE_TERMALL | CBSTYLE_VSC | CBSTYLE_SEGSYM,
    CBSTYLE_BYPASS | CBSTYLE_RESET | CBSTYLE_TERMALL | CBSTYLE_VSC
    | CBSTYLE_SEGSYM,
]


def _roundtrip(coeffs, orient, cb):
    coeffs = np.asarray(coeffs, dtype=np.int64)
    segs, _total, nbp = spec_encode(coeffs, orient, cb)
    got = t1_decode_segmented(segs, coeffs.shape[1], coeffs.shape[0],
                              nbp, orient, cb)
    np.testing.assert_array_equal(got, coeffs)


@pytest.mark.parametrize("cb", MODES)
@pytest.mark.parametrize("orient", ["LL", "HL", "LH", "HH"])
def test_mode_matrix_spec_bytes_decode(cb, orient):
    """Every mode combination x subband: randomized blocks encoded by
    the INDEPENDENT spec encoder must decode exactly on the production
    path.  Blocks use >= 5 bitplanes so BYPASS's raw passes (from pass
    11) actually engage, plus negatives, zeros and a saturated corner."""
    rng = np.random.default_rng(hash((cb, orient)) & 0xFFFF)
    for shape in ((4, 4), (8, 8), (7, 5), (16, 16)):
        c = rng.integers(-31, 32, shape)
        c[0, 0] = 31                       # 5 bitplanes guaranteed
        c[-1, -1] = -31
        mask = rng.random(shape) < 0.4     # plenty of zeros
        c = np.where(mask, 0, c)
        c[0, 0], c[-1, -1] = 31, -31
        _roundtrip(c, orient, cb)


def test_deep_bitplanes_bypass_long_raw_run():
    """9 bitplanes -> 25 passes, 15 of them raw: long raw runs cross
    byte boundaries and exercise 0xFF stuffing in the raw writer."""
    rng = np.random.default_rng(99)
    c = rng.integers(-255, 256, (12, 12))
    c[0, 0] = 255
    for cb in (CBSTYLE_BYPASS, CBSTYLE_BYPASS | CBSTYLE_TERMALL,
               CBSTYLE_BYPASS | CBSTYLE_SEGSYM):
        _roundtrip(c, "LL", cb)


def test_single_column_and_row_blocks():
    """Degenerate shapes: 1-wide and 1-tall blocks (no run-length mode,
    partial stripes) across the segmented modes."""
    for coeffs in ([[5], [0], [-3], [2], [0], [7]],
                   [[5, 0, -3, 2, 0, 7]]):
        for cb in (0, CBSTYLE_TERMALL, CBSTYLE_RESET | CBSTYLE_SEGSYM):
            _roundtrip(coeffs, "HH", cb)


# ---------------------------------------------------------------------------
# Pinned micro fixtures — every coding decision and MQ register
# transition derived BY HAND in the comments; the segment bytes are
# literals (not produced by any encoder at test time).
# ---------------------------------------------------------------------------


def test_pinned_micro_cleanup_bytes():
    """2x2 LL block, coefficients [[+1,0],[0,0]], 1 bitplane -> exactly
    one cleanup pass, mode 0.  Stripe height 2 < 4, so no run-length
    mode; scan order (0,0) (1,0) (0,1) (1,1).

    Coding decisions (Annex D):
      d1 (0,0): no significant neighbor -> sig ctx 0 [Table D.1 row
         h=v=d=0]; bit 1.  ctx-0 initial state I=4, MPS=0 [D.7] ->
         Qe=0x0521, LPS path.
      d2 sign(0,0): H=V=0 -> ctx 9, XOR 0 [Table D.3]; '+' codes bit 0.
         I=0, MPS=0 -> MPS path, Qe=0x5601.
      d3 (1,0): vertical neighbor significant -> (h0,v1,d0) -> ctx 3;
         bit 0, MPS, Qe=0x5601.
      d4 (0,1): horizontal neighbor -> (h1,v0,d0) -> ctx 5; bit 0.
      d5 (1,1): diagonal neighbor -> (h0,v0,d1) -> ctx 1; bit 0.

    MQ register walk (Annex C; A interval, C code, CT counter; INITENC:
    A=8000 C=0 CT=12):
      d1 CODELPS ctx0: A=8000-0521=7ADF; 7ADF>=Qe -> A=Qe=0521;
         I(ctx0)<-NLPS=29.  RENORME x5: A 0521->0A42->1484->2908->5210
         ->A420; C stays 0; CT 12-5=7.
      d2 CODEMPS ctx9: A=A420-5601=4E1F, no MSB; 4E1F<Qe -> A=Qe=5601,
         C unchanged; I<-1.  RENORME x1: A=AC02, C=0, CT 6.
      d3 CODEMPS ctx3: A=AC02-5601=5601, no MSB; 5601==Qe not < ->
         C+=Qe -> C=5601; I<-1.  RENORME x1: A=AC02, C=AC02, CT 5.
      d4 CODEMPS ctx5: A->5601; C=AC02+5601=10203.  RENORME: A=AC02,
         C=20406, CT 4.
      d5 CODEMPS ctx1: A->5601; C=20406+5601=25A07.  RENORME: A=AC02,
         C=4B40E, CT 3.
    FLUSH [C.2.9]: tempc=C+A=4B40E+AC02=56010; C|=FFFF -> 4FFFF, which
    is < tempc so no -8000.  C<<=CT(3) -> 27FFF8.  BYTEOUT: C<8000000
    -> emit C>>19 = 27FFF8>>19 = 0x04; C&=7FFFF -> 7FFF8; CT=8.
    C<<=8 -> 7FFF800.  BYTEOUT: emit 7FFF800>>19 = 0xFF.  The trailing
    0xFF is discarded (the decoder resynthesizes 1-bits past the end).

    Segment = 0x04.  One byte of arithmetic-coded data carrying five
    decisions — derived entirely from the published tables."""
    segs = [(bytes([0x04]), 1)]
    got = t1_decode_segmented(segs, 2, 2, 1, "LL", 0)
    np.testing.assert_array_equal(got, [[1, 0], [0, 0]])


def test_pinned_termall_reset_segments():
    """2x2 LL block, coefficients [[+2,0],[0,+1]], 2 bitplanes, mode
    TERMALL|RESET -> 4 passes, each its own terminated segment, each
    starting from FRESH context states (RESET), so every segment's MQ
    walk is independently hand-derivable:

    Pass 1 cleanup, plane 1 (bits: (0,0)->1 others 0): the decision and
    register sequence is IDENTICAL to test_pinned_micro_cleanup_bytes
    (same contexts, same bits) -> segment 04.

    Pass 2 sigprop, plane 0 (fresh states): (0,0) significant -> skip.
      d1 (1,0) ctx3 bit0: A=8000-5601=29FF<Qe -> A=5601, C=0;
         RENORME -> A=AC02, CT 11.
      d2 (0,1) ctx5 bit0: A->5601; C=0+5601; RENORME -> A=AC02,
         C=AC02, CT 10.
      d3 (1,1) ctx1 bit1 (the +1 becomes significant): CODELPS:
         A=AC02-5601=5601, not <Qe -> A=Qe=5601, C unchanged;
         SWITCH(I=0)=1 flips MPS(ctx1) to 1; I<-NLPS=1.
         RENORME -> A=AC02, C=15804, CT 9.
      d4 sign(1,1): its H and V neighbors are both insignificant ((0,0)
         is diagonal) -> ctx 9, XOR 0, '+' -> bit 0: A->5601,
         C=15804+5601=1AE05; RENORME -> A=AC02, C=35C0A, CT 8.
    FLUSH: tempc=35C0A+AC02=4080C; C|=FFFF=3FFFF < tempc; C<<=8 ->
    3FFFF00; emit >>19 = 0x7F; C&=7FFFF -> 7FF00; C<<=8 -> 7FF0000;
    emit >>19 = 0xFF -> discarded.  Segment = 7F.

    Pass 3 magref, plane 0 (fresh states): refines only (0,0) ((1,1)
    became significant THIS plane and is excluded [D.3.3]).  First
    refinement with a significant (diagonal) neighbor -> ctx 15
    [Table D.4]; bit = plane-0 bit of 2 = 0, MPS:
      A=8000-5601=29FF<Qe -> A=5601, C=0; RENORME -> CT 11.
    FLUSH: tempc=0+AC02; C|=FFFF=FFFF >= AC02 -> C-=8000 -> 7FFF;
    C<<=11 -> 3FFF800; emit >>19 = 0x7F; C&=7FFFF=7F800; C<<=8 ->
    7F80000; emit >>19 = 0xFF -> discarded.  Segment = 7F.

    Pass 4 cleanup, plane 0: every sample is significant or was visited
    by pass 2's sigprop -> ZERO decisions; the segment is a bare flush
    of the initial registers: tempc=0+8000; C|=FFFF=FFFF>=8000 ->
    C=7FFF; C<<=12 -> 7FFF000; emit >>19 = 0xFF (kept: not trailing);
    C&=7FFFF=7F000; C<<=8 -> 7F00000; BYTEOUT sees B==FF -> stuffed
    7-bit byte: emit (C>>20)&FF = 0x7F.  Segment = FF 7F — the pinned
    shape of an empty terminated MQ segment."""
    cb = CBSTYLE_TERMALL | CBSTYLE_RESET
    segs = [(bytes([0x04]), 1), (bytes([0x7F]), 1),
            (bytes([0x7F]), 1), (bytes([0xFF, 0x7F]), 1)]
    got = t1_decode_segmented(segs, 2, 2, 2, "LL", cb)
    np.testing.assert_array_equal(got, [[2, 0], [0, 1]])


def test_pinned_bypass_raw_segments():
    """2x2 LL block, coefficients [[+16,0],[0,+1]], 5 bitplanes, mode
    BYPASS|TERMALL -> 13 passes/segments; passes 11 (sigprop) and 12
    (magref) are RAW [D.6] — their bytes are plain bit-packing,
    hand-derivable without any arithmetic:

    Pass 11 raw sigprop, plane 0: (0,0) significant since plane 4 ->
    skip; (1,0) ctx3 -> bit 0; (0,1) ctx5 -> bit 0; (1,1) ctx1 -> the
    +1's plane-0 bit = 1, then its sign as one raw bit, '+' -> 0.
    Bit string 0,0,1,0 packed MSB-first, zero-padded: 0010 0000 = 0x20.

    Pass 12 raw magref, plane 0: refines only (0,0) (the +1 became
    significant this plane): plane-0 bit of 16 = 0 -> one 0 bit,
    padded: 0x00.

    Pass 13 cleanup (always MQ): nothing left uncoded -> the empty
    terminated MQ segment FF 7F derived in the TERMALL|RESET fixture.

    The ten MQ segments for passes 1-10 are pinned literals produced by
    this file's independent Annex C/D transcription (pass 1 carries the
    same five decisions as the micro fixture -> 04; sigprop/magref
    passes over already-coded or zero planes flush near-empty); their
    correctness across mode combinations is established by the
    mode-matrix parity tests above."""
    cb = CBSTYLE_BYPASS | CBSTYLE_TERMALL
    segs = [
        (bytes([0x04]), 1),         # p1  cl  plane4: the micro trace
        (bytes([0xFF, 0x7F]), 1),   # p2  sp  plane3
        (bytes([0x7F]), 1),         # p3  mr  plane3
        (bytes([0xFF, 0x7F]), 1),   # p4  cl  plane3
        (bytes([0xFF, 0x7F]), 1),   # p5  sp  plane2
        (bytes([0x7F]), 1),         # p6  mr  plane2
        (bytes([0xFF, 0x7F]), 1),   # p7  cl  plane2
        (bytes([0xFF, 0x7F]), 1),   # p8  sp  plane1
        (bytes([0xFF, 0x7F]), 1),   # p9  mr  plane1
        (bytes([0xFF, 0x7F]), 1),   # p10 cl  plane1
        (bytes([0x20]), 1),         # p11 sp  plane0 RAW (hand-packed)
        (bytes([0x00]), 1),         # p12 mr  plane0 RAW (hand-packed)
        (bytes([0xFF, 0x7F]), 1),   # p13 cl  plane0: empty MQ flush
    ]
    got = t1_decode_segmented(segs, 2, 2, 5, "LL", cb)
    np.testing.assert_array_equal(got, [[16, 0], [0, 1]])


def test_pinned_bytes_match_spec_encoder():
    """The pinned literals above must stay exactly what the independent
    spec transcription produces — a drift alarm for both sides."""
    assert spec_encode([[1, 0], [0, 0]], "LL", 0)[0] == [(b"\x04", 1)]
    assert spec_encode([[2, 0], [0, 1]], "LL",
                       CBSTYLE_TERMALL | CBSTYLE_RESET)[0] == [
        (b"\x04", 1), (b"\x7f", 1), (b"\x7f", 1), (b"\xff\x7f", 1)]
    segs, _, nbp = spec_encode([[16, 0], [0, 1]], "LL",
                               CBSTYLE_BYPASS | CBSTYLE_TERMALL)
    assert nbp == 5 and segs[0] == (b"\x04", 1)
    assert segs[10] == (b"\x20", 1) and segs[11] == (b"\x00", 1)
    assert segs[12] == (b"\xff\x7f", 1)


def test_all_zero_column_runlength_only():
    """A block whose cleanup is pure run-length decisions (everything
    insignificant except one corner) — pins RL + UNIFORM coding."""
    c = np.zeros((8, 8), dtype=np.int64)
    c[5, 3] = 1                            # single 1-bitplane coefficient
    for cb in (0, CBSTYLE_SEGSYM, CBSTYLE_VSC):
        _roundtrip(c, "LH", cb)


# ---------------------------------------------------------------------------
# Hand-assembled COMPLETE codestreams: marker segments (Annex A), packet
# headers (Annex B.10) and TERMALL length fields built in this file from
# the published field layouts, wrapped around spec-encoder block bytes,
# then decoded by the production full-codestream reader.
# ---------------------------------------------------------------------------

import struct  # noqa: E402


def _u16(v):
    return struct.pack(">H", v)


def _u32(v):
    return struct.pack(">I", v)


def pack_header_bits(bits) -> bytes:
    """[B.10.1] packet-header bit packing: MSB-first; after a 0xFF byte
    the next byte carries 7 bits (stuffed 0 MSB); may not end on 0xFF."""
    out = bytearray()
    acc, n, cap = 0, 0, 8
    for b in bits:
        acc = (acc << 1) | b
        n += 1
        if n == cap:
            out.append(acc)
            cap = 7 if acc == 0xFF else 8
            acc, n = 0, 0
    if n:
        out.append(acc << (cap - n))
    if out and out[-1] == 0xFF:
        out.append(0)
    return bytes(out)


def npass_bits(n) -> list:
    """[Table B.4] number-of-coding-passes codewords."""
    if n == 1:
        return [0]
    if n == 2:
        return [1, 0]
    if n in (3, 4, 5):
        return [1, 1] + [[0, 0], [0, 1], [1, 0]][n - 3]
    if n <= 36:
        return [1, 1, 1, 1] + [(n - 6 >> i) & 1 for i in range(4, -1, -1)]
    return [1] * 9 + [(n - 37 >> i) & 1 for i in range(6, -1, -1)]


def single_cb_packet_header(zbp: int, segs) -> list:
    """Packet header bits for a 1-layer, 1-precinct, single-code-block
    packet [B.10]:
      1                 packet non-empty
      1                 inclusion tag tree (single node, value 0 < 1)
      0*zbp 1           zero-bitplanes tag tree (single node, value zbp)
      <Table B.4>       total new passes
      1*k 0             Lblock += k  (3 + k must fit every length below)
      per SEGMENT       its byte length in Lblock + floor(log2(np_seg))
                        bits [B.10.7.1: one length per terminated
                        codeword segment — the TERMALL case]"""
    bits = [1, 1] + [0] * zbp + [1]
    bits += npass_bits(sum(n for _, n in segs))

    def fl(n):
        return n.bit_length() - 1

    k = max(max(1, len(s).bit_length()) - fl(np_) - 3 for s, np_ in segs)
    k = max(k, 0)
    bits += [1] * k + [0]
    for s, np_ in segs:
        nb = 3 + k + fl(np_)
        bits += [(len(s) >> i) & 1 for i in range(nb - 1, -1, -1)]
    return bits


# the guard-bit/exponent choice for all fixture streams: reversible
# (no-quantization) QCD with 2 guard bits and exponent 8 -> the decoder
# must derive Mb = G + eps - 1 = 9 magnitude bitplanes [E.1]
_GUARD, _EXPO, _MB = 2, 8, 9


def _siz(w, h, comps):
    """SIZ [A.5.1]: capability 0, image = tile = (w, h) at origin 0,
    8-bit unsigned components; ``comps`` = [(XRsiz, YRsiz), ...]."""
    return (b"\xff\x51" + _u16(38 + 3 * len(comps)) + _u16(0)
            + _u32(w) + _u32(h) + _u32(0) + _u32(0)
            + _u32(w) + _u32(h) + _u32(0) + _u32(0) + _u16(len(comps))
            + b"".join(bytes([7, dx, dy]) for dx, dy in comps))


def _cod(cbstyle):
    """COD [A.6.1]: LRCP, 1 layer, no MCT; SPcod: 0 decomposition
    levels (the LL band IS the image), 64x64 code-blocks (exponent
    bytes 4 = log2(64)-2), the given style byte, 5/3 reversible."""
    return (b"\xff\x52" + _u16(12) + bytes([0]) + bytes([0]) + _u16(1)
            + bytes([0]) + bytes([0, 4, 4, cbstyle, 1]))


_QCD = (b"\xff\x5c" + _u16(4) + bytes([_GUARD << 5])
        + bytes([_EXPO << 3]))      # Sqcd style 0 | G<<5; SPqcd eps<<3


def _sot(tile_data_len, extra=0):
    """SOT [A.4.2]: tile 0, part 0 of 1; Psot spans SOT..tile end."""
    return (b"\xff\x90" + _u16(10) + _u16(0)
            + _u32(12 + extra + 2 + tile_data_len) + bytes([0, 1]))


_TERMALL_COEFFS = np.array([[7, 0, -3, 1], [0, 5, 0, 0],
                            [-2, 0, 4, 0], [1, 0, 0, -6]], dtype=np.int64)


def test_hand_assembled_termall_codestream():
    """A complete 4x4 8-bit codestream with TERMALL: 3 bitplanes -> 7
    passes -> SEVEN codeword segments whose lengths (3,2,1,2,2,2,2
    bytes) are each signaled in the packet header with their own
    3-bit length field (Lblock 3 + floor(log2(1)) = 3) — the exact
    length-field arithmetic VERDICT r8 flagged as verified only by the
    own-encoder loop.

    Pinned header bytes c0 f8 4d 14 92 decompose bit-by-bit as:
      1                non-empty
      1                inclusion (tag tree value 0 < layer threshold 1)
      000000 1         zero bitplanes = Mb - nbp = 9 - 3 = 6
      1111 00001       7 passes (Table B.4: '1111' + 5 bits of 7-6)
      0                Lblock unchanged (every length < 8)
      011 010 001 010 010 010 010    the seven lengths
      + 2 pad bits (0) closing the final byte."""
    segs, _, nbp = spec_encode(_TERMALL_COEFFS, "LL", CBSTYLE_TERMALL)
    assert [len(s) for s, _ in segs] == [3, 2, 1, 2, 2, 2, 2]
    header = pack_header_bits(single_cb_packet_header(_MB - nbp, segs))
    assert header == bytes.fromhex("c0f84d1492")
    tile = header + b"".join(s for s, _ in segs)
    stream = (b"\xff\x4f" + _siz(4, 4, [(1, 1)]) + _cod(CBSTYLE_TERMALL)
              + _QCD + _sot(len(tile)) + b"\xff\x93" + tile + b"\xff\xd9")
    from rasterframes_spark.sources.jp2 import decode_jp2
    img = decode_jp2(stream)
    # 8-bit unsigned -> DC level shift adds 2^(8-1) [G.1.2]
    np.testing.assert_array_equal(img.astype(np.int64) - 128,
                                  _TERMALL_COEFFS)


def test_hand_assembled_ppt_codestream():
    """The same tile with its packet header MOVED into a PPT marker
    segment in the tile header [A.7.5]: Lppt = 3 + header bytes,
    Zppt = 0; the bitstream after SOD is then the bare codeword
    segments.  Pins that the production reader takes header bits from
    the Zppt-ordered PPT stream and bodies from the in-stream data."""
    segs, _, nbp = spec_encode(_TERMALL_COEFFS, "LL", CBSTYLE_TERMALL)
    header = pack_header_bits(single_cb_packet_header(_MB - nbp, segs))
    body = b"".join(s for s, _ in segs)
    ppt = b"\xff\x61" + _u16(3 + len(header)) + bytes([0]) + header
    stream = (b"\xff\x4f" + _siz(4, 4, [(1, 1)]) + _cod(CBSTYLE_TERMALL)
              + _QCD + _sot(len(body), extra=len(ppt)) + ppt
              + b"\xff\x93" + body + b"\xff\xd9")
    from rasterframes_spark.sources.jp2 import decode_jp2
    np.testing.assert_array_equal(
        decode_jp2(stream).astype(np.int64) - 128, _TERMALL_COEFFS)


def test_hand_assembled_420_two_component_codestream():
    """A two-component 8x8 codestream with 4:2:0 chroma subsampling:
    component 1 has XRsiz = YRsiz = 2, so its sample grid is
    ceil(8/2) x ceil(8/2) = 4x4 [A.5.1].  LRCP iterates packets over
    components, so the tile data is component 0's packet followed by
    component 1's; each is a single-code-block packet built by this
    file's independent header grammar.  Pins the per-component
    geometry math (the r8 subsampling feature) against non-own-encoder
    bytes."""
    c0 = (np.arange(64).reshape(8, 8) % 23 - 11).astype(np.int64)
    c1 = np.random.default_rng(5).integers(-9, 10, (4, 4))
    packets = []
    for c in (c0, c1):
        segs, _, nbp = spec_encode(c, "LL", 0)
        packets.append(
            pack_header_bits(single_cb_packet_header(_MB - nbp, segs))
            + b"".join(s for s, _ in segs))
    tile = b"".join(packets)
    stream = (b"\xff\x4f" + _siz(8, 8, [(1, 1), (2, 2)]) + _cod(0)
              + _QCD + _sot(len(tile)) + b"\xff\x93" + tile + b"\xff\xd9")
    from rasterframes_spark.sources.jp2 import decode_jp2
    a0 = decode_jp2(stream, component=0)
    a1 = decode_jp2(stream, component=1)
    assert a0.shape == (8, 8) and a1.shape == (4, 4)
    np.testing.assert_array_equal(a0.astype(np.int64) - 128, c0)
    np.testing.assert_array_equal(a1.astype(np.int64) - 128, c1)
    # the subsampled component upsamples 2x through the band API used
    # by read_raster (nearest): spot-check the mapping via jp2_info
    from rasterframes_spark.sources.jp2 import jp2_info
    info = jp2_info(stream)
    assert info["n_components"] == 2 and info["width"] == 8


def _single_cb_packet(coeffs) -> bytes:
    segs, _, nbp = spec_encode(np.asarray(coeffs, dtype=np.int64), "LL", 0)
    return (pack_header_bits(single_cb_packet_header(_MB - nbp, segs))
            + b"".join(s for s, _ in segs))


def _pos_order_stream(prog_code: int, tile: bytes) -> bytes:
    """8x8 two-component 4:2:0 codestream with precincts: COD Scod=1,
    the given progression, NL=0, one precinct-size byte 0x22 (PPx=PPy=2:
    4x4 precincts on each component's grid [A.6.1])."""
    cod = (b"\xff\x52" + _u16(13) + bytes([1]) + bytes([prog_code])
           + _u16(1) + bytes([0]) + bytes([0, 4, 4, 0, 1]) + bytes([0x22]))
    return (b"\xff\x4f" + _siz(8, 8, [(1, 1), (2, 2)]) + cod + _QCD
            + _sot(len(tile)) + b"\xff\x93" + tile + b"\xff\xd9")


def test_hand_assembled_subsampled_position_ordered():
    """Position-ordered progressions UNDER subsampling (the r8 'no
    fixture to verify the interleave' hatch, closed r9): component 0 is
    8x8 with four 4x4 precincts (reference anchors (0,0) (4,0) (0,4)
    (4,4)); component 1 is 4x4 at XRsiz=YRsiz=2 with ONE precinct whose
    reference anchor is its component anchor x 2 = (0,0) [B.12.1.3-5].

    PCRL sorts packets by (y, x, component, resolution), so the packet
    stream must interleave component 1's packet into the middle of
    component 0's:  c0@(0,0)  c1@(0,0)  c0@(4,0)  c0@(0,4)  c0@(4,4).
    CPRL sorts by (component, y, x, resolution): all of component 0's
    precincts first, then component 1.  RPCL at NL=0 degenerates to the
    PCRL order (single resolution).  Each stream is hand-assembled in
    exactly its spec order and must decode both components exactly."""
    rng = np.random.default_rng(11)
    c0 = rng.integers(-13, 14, (8, 8))
    c1 = rng.integers(-9, 10, (4, 4))
    # comp0's precinct sub-blocks are independent code-blocks
    p = {(j, i): _single_cb_packet(c0[4 * j:4 * j + 4, 4 * i:4 * i + 4])
         for j in (0, 1) for i in (0, 1)}
    pk1 = _single_cb_packet(c1)
    pcrl_tile = p[0, 0] + pk1 + p[0, 1] + p[1, 0] + p[1, 1]
    cprl_tile = p[0, 0] + p[0, 1] + p[1, 0] + p[1, 1] + pk1
    from rasterframes_spark.sources.jp2 import decode_jp2
    for prog_code, tile in ((3, pcrl_tile), (2, pcrl_tile),
                            (4, cprl_tile)):
        stream = _pos_order_stream(prog_code, tile)
        np.testing.assert_array_equal(
            decode_jp2(stream, component=0).astype(np.int64) - 128, c0,
            err_msg=f"prog {prog_code}")
        np.testing.assert_array_equal(
            decode_jp2(stream, component=1).astype(np.int64) - 128, c1,
            err_msg=f"prog {prog_code}")
    # negative control: the decoder must actually FOLLOW the declared
    # order — a PCRL stream assembled in component-major (CPRL) order
    # reads the wrong bytes as packet headers and cannot reproduce both
    # components (it may also reject the stream outright)
    try:
        wrong = _pos_order_stream(3, cprl_tile)
        ok0 = (decode_jp2(wrong, component=0)
               .astype(np.int64) - 128 == c0).all()
        ok1 = (decode_jp2(wrong, component=1)
               .astype(np.int64) - 128 == c1).all()
        assert not (ok0 and ok1)
    except ValueError:
        pass


def test_hand_assembled_two_layer_codestream():
    """Quality layers from non-own-encoder bytes: mode 0 yields ONE
    codeword segment (7 passes, bytes 14 6b 8c ed 7a 5a fd from this
    file's spec encoder); a two-layer stream splits it at an arbitrary
    byte boundary (the decoder concatenates layer contributions before
    decoding) and the packet-header grammar differs per layer [B.10]:

    Layer 0 header (pinned c0 e1 40):
      1                non-empty
      1                inclusion tag tree, first inclusion (value 0 < 1)
      000000 1         zero bitplanes = 6 (only at FIRST inclusion)
      1100             3 passes (Table B.4)
      0                Lblock stays 3
      00101            5 bytes in 3 + floor(log2(3)) = 4... see below
    Layer 1 header (pinned f4 20):
      1                non-empty
      1                already-included code block: a PLAIN bit [B.10.4]
      1101             4 passes
      0                Lblock unchanged
      00010            2 bytes in 3 + floor(log2(4)) = 5 bits
    (exact bit widths follow Lblock + floor(log2(new passes)); the
    pinned bytes are the normative encoding of exactly these fields)"""
    cod = (b"\xff\x52" + _u16(12) + bytes([0]) + bytes([0]) + _u16(2)
           + bytes([0]) + bytes([0, 4, 4, 0, 1]))
    tile = (bytes.fromhex("c0e140") + bytes.fromhex("146b8ced7a")
            + bytes.fromhex("f420") + bytes.fromhex("5afd"))
    stream = (b"\xff\x4f" + _siz(4, 4, [(1, 1)]) + cod + _QCD
              + _sot(len(tile)) + b"\xff\x93" + tile + b"\xff\xd9")
    from rasterframes_spark.sources.jp2 import decode_jp2
    np.testing.assert_array_equal(
        decode_jp2(stream).astype(np.int64) - 128, _TERMALL_COEFFS)
    # drift alarm: the split segment halves must stay what the spec
    # encoder produces for these coefficients in mode 0
    segs, total, nbp = spec_encode(_TERMALL_COEFFS, "LL", 0)
    assert total == 7 and nbp == 3
    assert segs == [(bytes.fromhex("146b8ced7a5afd"), 7)]


def _poc_marker(records) -> bytes:
    """POC [A.6.6]: per record RSpoc(1) CSpoc(1) LYEpoc(2) REpoc(1)
    CEpoc(1) Ppoc(1) — the < 257-component narrow form."""
    seg = b"".join(bytes([rs, cs]) + _u16(lye) + bytes([re, ce, pp])
                   for rs, cs, lye, re, ce, pp in records)
    return b"\xff\x5f" + _u16(2 + len(seg)) + seg


def test_hand_assembled_poc_codestreams():
    """POC progression-order changes (the r8 'tile-header POC' hatch,
    closed r9), on the subsampled two-component precinct layout:

    Stream A carries a MAIN-header POC with two records:
      record 1: components [1,2), layers [0,1), res [0,1), Ppoc LRCP
                -> component 1's single packet FIRST
      record 2: components [0,2), Ppoc CPRL -> the remaining packets:
                component 0's four precincts in (y, x) anchor order
    No single progression can put component 1 before component 0, so a
    decoder that ignored the POC volumes would misparse the stream.

    Stream B adds a TILE-header POC that contradicts the main-header
    one (main says component 0 first; tile says component 1 first) with
    the tile bytes in TILE order — pinning the A.6.1-style precedence
    (tile-header POC governs its tile).

    Stream C is the negative control: the same c1-first tile bytes with
    ONLY the main-header c0-first POC — the packets misparse, so the
    decode cannot reproduce both components (or rejects outright)."""
    rng = np.random.default_rng(11)
    c0 = rng.integers(-13, 14, (8, 8))
    c1 = rng.integers(-9, 10, (4, 4))
    p = {(j, i): _single_cb_packet(c0[4 * j:4 * j + 4, 4 * i:4 * i + 4])
         for j in (0, 1) for i in (0, 1)}
    tile = (_single_cb_packet(c1)
            + p[0, 0] + p[0, 1] + p[1, 0] + p[1, 1])
    cod = (b"\xff\x52" + _u16(13) + bytes([1]) + bytes([0]) + _u16(1)
           + bytes([0]) + bytes([0, 4, 4, 0, 1]) + bytes([0x22]))
    head = b"\xff\x4f" + _siz(8, 8, [(1, 1), (2, 2)]) + cod + _QCD
    poc_c1_first = _poc_marker([(0, 1, 1, 1, 2, 0), (0, 0, 1, 1, 2, 4)])
    poc_c0_first = _poc_marker([(0, 0, 1, 1, 1, 0), (0, 0, 1, 1, 2, 0)])

    from rasterframes_spark.sources.jp2 import decode_jp2

    def check(stream):
        np.testing.assert_array_equal(
            decode_jp2(stream, component=0).astype(np.int64) - 128, c0)
        np.testing.assert_array_equal(
            decode_jp2(stream, component=1).astype(np.int64) - 128, c1)

    # A: main-header POC
    check(head + poc_c1_first + _sot(len(tile)) + b"\xff\x93" + tile
          + b"\xff\xd9")
    # B: contradictory main POC overridden by the tile-header POC
    sot_b = (b"\xff\x90" + _u16(10) + _u16(0)
             + _u32(12 + len(poc_c1_first) + 2 + len(tile))
             + bytes([0, 1]))
    check(head + poc_c0_first + sot_b + poc_c1_first + b"\xff\x93"
          + tile + b"\xff\xd9")
    # C: negative control — main POC alone, wrong order for these bytes
    try:
        bad = (head + poc_c0_first + _sot(len(tile)) + b"\xff\x93"
               + tile + b"\xff\xd9")
        ok0 = (decode_jp2(bad, component=0)
               .astype(np.int64) - 128 == c0).all()
        ok1 = (decode_jp2(bad, component=1)
               .astype(np.int64) - 128 == c1).all()
        assert not (ok0 and ok1)
    except ValueError:
        pass
