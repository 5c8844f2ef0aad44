"""Pure-python JPEG2000 codec (sources/jp2.py).

Verification strategy (no independent JP2 decoder exists in this
container):
1. Layered kernel round-trips — MQ coder, tag trees, EBCOT T1, 5/3 DWT —
   each encoder<->decoder pair is asymmetric enough that shared-bug
   cancellation is implausible.
2. Full encode->decode bit-exact round-trips across sizes / tiles /
   levels / depths / code-block shapes.
3. The reference's Kakadu-encoded Sentinel-2 fixture
   (``/root/reference/core/src/test/resources/B01.jp2``, read-only):
   byte-exact packet-header consumption on real tiles (any parse drift
   desynchronizes instantly on a 39 kB tile), plausible reflectance
   statistics, and seam continuity between independently decoded tiles.
"""
import os

import numpy as np
import pytest

from rasterframes_spark.sources import jp2

B01 = "/root/reference/core/src/test/resources/B01.jp2"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_mq_roundtrip():
    rng = np.random.default_rng(42)
    for _ in range(8):
        n = int(rng.integers(1, 1500))
        cxs = rng.integers(0, jp2.N_CTX, n)
        bits = (rng.random(n) < rng.uniform(0.02, 0.5)).astype(int)
        enc = jp2.MQEncoder()
        for c, b in zip(cxs, bits):
            enc.encode(int(c), int(b))
        dec = jp2.MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in cxs] == list(bits)


def test_tagtree_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(10):
        w, h = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        vals = rng.integers(0, 8, (h, w))
        te = jp2.TagTree(w, h)
        for y in range(h):
            for x in range(w):
                te.set(x, y, int(vals[y, x]))
        te.finalize()
        wtr = jp2.HeaderWriter()
        q = []
        for t in range(1, 10):
            for y in range(h):
                for x in range(w):
                    te.encode(wtr, x, y, t)
                    q.append((x, y, t, vals[y, x] < t))
        rdr = jp2.HeaderReader(wtr.flush() + b"\x00\x00")
        td = jp2.TagTree(w, h)
        for x, y, t, expect in q:
            assert td.decode(rdr, x, y, t) == expect


def test_t1_roundtrip():
    rng = np.random.default_rng(3)
    for trial in range(16):
        w, h = int(rng.integers(1, 17)), int(rng.integers(1, 17))
        orient = ("LL", "LH", "HL", "HH")[trial % 4]
        mag = rng.integers(0, 2 ** int(rng.integers(1, 12)), (h, w))
        sgn = rng.integers(0, 2, (h, w)) * 2 - 1
        coeffs = (mag * sgn).astype(np.int64)
        data, npass, nbp = jp2.t1_encode(coeffs, orient)
        out = jp2.t1_decode(data, w, h, npass, nbp, orient)
        assert (out == coeffs).all()


def test_dwt_roundtrip_multilevel():
    rng = np.random.default_rng(9)
    for _ in range(10):
        w, h = int(rng.integers(1, 120)), int(rng.integers(1, 120))
        u0, v0 = int(rng.integers(0, 7)), int(rng.integers(0, 7))
        a = rng.integers(-5000, 5000, (h, w)).astype(np.int64)
        cur, bands = a.copy(), []
        uu, vv = u0, v0
        for _ in range(int(rng.integers(1, 6))):
            ll, hl, lh, hh = jp2.dwt53_forward(cur, uu, vv)
            bands.append((hl, lh, hh, (uu, vv, uu + cur.shape[1],
                                       vv + cur.shape[0])))
            cur, uu, vv = ll, (uu + 1) // 2, (vv + 1) // 2
        for hl, lh, hh, (x0, y0, x1, y1) in reversed(bands):
            cur = jp2.dwt53_inverse(cur, hl, lh, hh, x0, y0, x1, y1)
        assert (cur == a).all()


# ---------------------------------------------------------------------------
# full codec round-trips
# ---------------------------------------------------------------------------

def test_encode_decode_roundtrip_matrix():
    rng = np.random.default_rng(5)
    cases = [
        ((1, 1), None, 0, (2, 2)), ((8, 8), None, 1, (4, 4)),
        ((37, 53), None, 3, (3, 5)), ((100, 64), (32, 32), 2, (6, 6)),
        ((65, 129), (33, 40), 5, (4, 4)), ((200, 3), (64, 2), 4, (2, 2)),
    ]
    for shape, tile, levels, cb in cases:
        a = rng.integers(0, 1 << 15, shape).astype(np.uint16)
        data = jp2.encode_jp2(a, tile_size=tile, levels=levels, cb_exp=cb)
        out = jp2.decode_jp2(data)
        assert out.shape == a.shape
        assert (out.astype(int) == a.astype(int)).all(), (shape, tile,
                                                          levels, cb)


def test_roundtrip_precincts_and_rpcl():
    """Custom precincts split each resolution into multiple packets, and
    RPCL exercises the decoder's position-ordered progression path — the
    exact encoding shape of Sentinel-2 products (RPCL, 64x64 precincts,
    tiny code-blocks)."""
    rng = np.random.default_rng(21)
    for prog in ("LRCP", "RPCL"):
        a = rng.integers(0, 1 << 14, (130, 170)).astype(np.uint16)
        data = jp2.encode_jp2(a, tile_size=(96, 96), levels=3,
                              cb_exp=(2, 2), precinct=5, prog=prog)
        out = jp2.decode_jp2(data)
        assert (out.astype(int) == a.astype(int)).all(), prog
        # window decode through the precinct grid
        win = jp2.decode_jp2(data, window=(90, 60, 60, 50))
        assert (win.astype(int) == a[60:110, 90:150].astype(int)).all()


def test_roundtrip_signed_and_smooth():
    rng = np.random.default_rng(6)
    a = rng.integers(-900, 900, (70, 45)).astype(np.int32)
    data = jp2.encode_jp2(a, levels=3)
    assert (jp2.decode_jp2(data) == a).all()
    y, x = np.mgrid[0:80, 0:90]
    sm = (2000 + 700 * np.sin(x / 9) * np.cos(y / 13)).astype(np.uint16)
    data = jp2.encode_jp2(sm, levels=4)
    assert (jp2.decode_jp2(data).astype(int) == sm.astype(int)).all()
    # smooth image should compress well (sanity on entropy coding)
    assert len(data) < sm.size * 2 * 0.8


def test_window_and_tile_decode():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 4096, (150, 140)).astype(np.uint16)
    data = jp2.encode_jp2(a, tile_size=(48, 52), levels=2)
    win = jp2.decode_jp2(data, window=(30, 40, 60, 70))
    assert (win.astype(int) == a[40:110, 30:90].astype(int)).all()
    arr, (x0, y0, x1, y1) = jp2.decode_jp2_tile(data, 3)
    assert (arr.astype(int) == a[y0:y1, x0:x1].astype(int)).all()


def test_review_pins_coc_multicomp_depth_dtype():
    """Round-6 self-review pins: (1) a main-header COC (no SGcod) parses
    with the COC layout and inherits SGcod from COD; (2) per-component
    SUBSAMPLING raises at read_info so the reader's dispatch falls
    through to the rasterio hatch instead of failing at task time
    (uniform-grid multi-component is natively supported); (3) depth
    inference uses int64 magnitude (np.abs(INT16_MIN) overflows on the
    native dtype); (4) depth-17..32 unsigned decodes as uint32 on the
    read_window path instead of silently wrapping at uint16."""
    import struct as _s

    rng = np.random.default_rng(9)
    a = rng.integers(0, 250, (20, 24)).astype(np.uint8)
    data = bytearray(jp2.encode_jp2(a, levels=1, cb_exp=(4, 4)))
    i = bytes(data).find(b"\xFF\x52")
    lcod = _s.unpack(">H", data[i + 2:i + 4])[0]
    coc = bytes([0, 0, 1, 2, 2, 0, 1])  # Ccoc=0, Scoc=0, SPcoc == COD's
    data[i + 2 + lcod:i + 2 + lcod] = (
        b"\xFF\x53" + _s.pack(">H", 2 + len(coc)) + coc)
    assert (jp2.decode_jp2(bytes(data)) == a).all()

    mc = bytearray(jp2.encode_jp2(a, levels=1))
    j = bytes(mc).find(b"\xFF\x51")
    lsiz = _s.unpack(">H", mc[j + 2:j + 4])[0]
    mc[j + 4 + 34:j + 4 + 36] = _s.pack(">H", 2)
    mc[j + 2 + lsiz:j + 2 + lsiz] = bytes([7, 2, 2])  # 2x2-subsampled comp
    mc[j + 2:j + 4] = _s.pack(">H", lsiz + 3)
    # r8: subsampled grids PARSE and decode natively now (the original
    # pin asserted parse-time rejection); the hand-edited stream here
    # declares a phantom second component with no packets, so only the
    # parse is meaningful — real subsampled decode is covered by
    # TestCodingModes.test_per_component_subsampling
    info2 = jp2.read_info(bytes(mc))
    assert info2.bands == 2

    arr = np.full((30, 30), 50, dtype=np.int16)
    arr[0, 0] = -32768
    assert (jp2.decode_jp2(jp2.encode_jp2(arr)).astype(int)
            == arr.astype(int)).all()

    big = np.array([[1048576, 70000], [3, 2097151]], dtype=np.uint32)
    enc = jp2.encode_jp2(big, levels=0, depth=21)
    info = jp2.read_info(enc)
    assert info.dtype == "uint32"
    assert (jp2.read_window(enc, info, 0, 0, 2, 2) == big).all()


def test_reduced_resolution_decode_exact():
    """decode_jp2(reduce=n) returns the 5/3 LL at that level exactly:
    for a single-tile image it equals our own forward DWT's LL (DC shift
    re-applied) — the overview path costs ~1/4^n of a full decode and is
    the pyramid-building primitive over JP2 archives."""
    rng = np.random.default_rng(31)
    a = rng.integers(0, 5000, (90, 120)).astype(np.uint16)
    depth = 13
    data = jp2.encode_jp2(a, levels=3, cb_exp=(4, 4), depth=depth)
    red = jp2.decode_jp2(data, reduce=1)
    ll, _, _, _ = jp2.dwt53_forward(
        a.astype(np.int64) - (1 << (depth - 1)), 0, 0)
    exp = np.clip(ll + (1 << (depth - 1)), 0, (1 << depth) - 1)
    assert red.shape == exp.shape
    assert (red.astype(np.int64) == exp).all()
    # two levels: forward twice
    ll2, _, _, _ = jp2.dwt53_forward(ll, 0, 0)
    exp2 = np.clip(ll2 + (1 << (depth - 1)), 0, (1 << depth) - 1)
    assert (jp2.decode_jp2(data, reduce=2).astype(np.int64) == exp2).all()
    # multi-tile assembly: seams divide exactly, shape halves per level
    data = jp2.encode_jp2(a, tile_size=(40, 50), levels=3, cb_exp=(4, 4))
    red = jp2.decode_jp2(data, reduce=1)
    assert red.shape == (45, 60)
    with pytest.raises(ValueError):
        jp2.decode_jp2(data, window=(0, 0, 10, 10), reduce=1)


def test_malformed_input_raises_valueerror():
    """Truncated / corrupted inputs surface as ValueError (or the honest
    NotImplementedError), never a bare struct/index crash — the reader's
    format-dispatch chain catches ValueError to try the next codec."""
    rng = np.random.default_rng(12)
    a = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    good = jp2.encode_jp2(a, levels=2)
    for bad in (b"", b"\x00" * 40, good[:9], good[:60],
                good[:len(good) // 2]):
        try:
            jp2.read_info(bad)
        except (ValueError, NotImplementedError):
            pass
    # random byte corruption in the main header region
    for seed in range(5):
        r = np.random.default_rng(seed)
        buf = bytearray(good)
        for _ in range(4):
            buf[int(r.integers(2, min(80, len(buf))))] = int(
                r.integers(0, 256))
        try:
            jp2.decode_jp2(bytes(buf))
        except (ValueError, NotImplementedError, AssertionError):
            pass  # structured failure is acceptable; silent garbage is not
        except Exception as e:  # noqa: BLE001 — the pin IS the exception type
            raise AssertionError(
                f"seed {seed}: unstructured {type(e).__name__}: {e}")


def test_unsupported_features_raise():
    a = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(jp2.encode_jp2(a, levels=1))
    # flip the COD transform byte to 9/7 (irreversible): parsing is fine
    # (9/7 is supported since r7) but decoding must reject the illegal
    # 9/7 + unquantized-QCD combination instead of producing wrong pixels
    i = bytes(data).find(b"\xFF\x52")
    data[i + 4 + 9] = 0
    cs = jp2.JP2Codestream(bytes(data))
    with pytest.raises(ValueError):
        jp2._decode_tile(cs, 0, 0)
    # an unknown transform code still raises at parse
    data[i + 4 + 9] = 7
    with pytest.raises(NotImplementedError):
        jp2.JP2Codestream(bytes(data))


def test_unknown_cbstyle_bits_rejected():
    """All six DEFINED code-block style bits are supported (r8); only
    bits beyond the spec-defined 0x3F must still raise (routing the
    file to the rasterio fallback) — an undefined style would
    desynchronize the T1 decoder into garbled pixels."""
    a = np.zeros((8, 8), dtype=np.uint8)
    base = jp2.encode_jp2(a, levels=1)
    i = base.find(b"\xFF\x52")
    data = bytearray(base)
    data[i + 12] |= 0x40
    with pytest.raises(NotImplementedError):
        jp2.JP2Codestream(bytes(data))


class TestCodingModes:
    """r8: the T.800 code-block mode switches — BYPASS (raw sigprop/
    magref from pass 11, own segments), RESET (contexts re-init each
    pass), TERMALL (one codeword segment per pass), VSC (stripe-causal
    contexts), SEGSYM (verified 1010 after each cleanup) — plus RGN
    maxshift ROI. Own-writer round-trips + structural property checks
    (no external mode-bearing fixture exists in this container; the
    segment-structure asserts pin the D.4/D.6 rules independently of
    the decoder)."""

    def test_t1_mode_matrix_roundtrip(self):
        rng = np.random.default_rng(17)
        shapes = [(4, 4), (8, 8), (16, 13), (3, 9)]
        for i, cb in enumerate([0x01, 0x02, 0x04, 0x08, 0x20,
                                0x05, 0x0E, 0x2F]):
            h, w = shapes[i % len(shapes)]
            coeffs = np.where(rng.random((h, w)) < 0.5,
                              rng.integers(-400, 400, (h, w)), 0)
            for orient in ("LL", "HL", "LH", "HH"):
                segs, np_, nbp = jp2.t1_encode_modes(coeffs, orient, cb)
                out = jp2.t1_decode_segmented(segs, w, h, nbp, orient, cb)
                assert (out == coeffs).all(), (hex(cb), orient)

    def test_style0_modes_encoder_matches_plain_encoder(self):
        # cbstyle=0 through the segmented encoder must be byte-identical
        # to the production single-segment encoder
        rng = np.random.default_rng(3)
        for _ in range(10):
            coeffs = rng.integers(-100, 100, (8, 8))
            d0, n0, b0 = jp2.t1_encode(coeffs, "HL")
            segs, n1, b1 = jp2.t1_encode_modes(coeffs, "HL", 0)
            assert (n0, b0) == (n1, b1)
            assert [s for s, _ in segs] == ([d0] if n0 else [])

    def test_segment_structure_rules(self):
        rng = np.random.default_rng(5)
        coeffs = rng.integers(-2000, 2000, (8, 8))
        # TERMALL: exactly one segment per pass
        segs, np_, _ = jp2.t1_encode_modes(coeffs, "HH", 0x04)
        assert len(segs) == np_ and all(s[1] == 1 for s in segs)
        # BYPASS: one MQ segment for passes 1-10, then alternating raw
        # (sigprop+magref) pairs and single-pass MQ cleanups
        segs, np_, _ = jp2.t1_encode_modes(coeffs, "HH", 0x01)
        spans = [s[1] for s in segs]
        assert spans[0] == 10
        assert all(s in (1, 2) for s in spans[1:])
        # raw segments never end on 0xFF (stuffing invariant)
        for data, _ in segs:
            assert not data or data[-1] != 0xFF

    def test_segsym_detects_corruption(self):
        rng = np.random.default_rng(7)
        coeffs = rng.integers(-500, 500, (8, 8))
        segs, np_, nbp = jp2.t1_encode_modes(coeffs, "LH", 0x20)
        jp2.t1_decode_segmented(segs, 8, 8, nbp, "LH", 0x20)  # clean ok
        data = bytearray(segs[0][0])
        data[len(data) // 3] ^= 0x08
        with pytest.raises(ValueError):
            jp2.t1_decode_segmented([(bytes(data), segs[0][1])],
                                    8, 8, nbp, "LH", 0x20)

    def test_full_codestream_mode_matrix(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 4000, (96, 80)).astype(np.uint16)
        for modes in (0x01, 0x04, 0x0E, 0x2F):
            cs = jp2.encode_jp2(img, levels=3, cb_exp=(4, 4), modes=modes)
            assert (jp2.decode_jp2(cs) == img).all(), hex(modes)
        # multi-tile RGB + MCT + mode combo
        rgb = rng.integers(0, 255, (70, 66, 3)).astype(np.uint8)
        cs = jp2.encode_jp2(rgb, tile_size=(40, 40), levels=2,
                            cb_exp=(5, 5), modes=0x2D)
        for c in range(3):
            assert (jp2.decode_jp2(cs, component=c) == rgb[:, :, c]).all()

    def test_full_codestream_modes_with_lossy(self):
        x, y = np.meshgrid(np.arange(64), np.arange(64))
        img = (500 + 300 * np.sin(x / 7.0) * np.cos(y / 5.0)) \
            .astype(np.uint16)
        cs = jp2.encode_jp2(img, levels=2, cb_exp=(4, 4), lossy=True,
                            frac_bits=6, modes=0x05)
        assert (jp2.decode_jp2(cs).astype(int) == img.astype(int)).all()

    def test_rgn_maxshift_roundtrip(self):
        rng = np.random.default_rng(13)
        img = rng.integers(0, 1000, (64, 64)).astype(np.uint16)
        cs = jp2.encode_jp2(img, levels=2, cb_exp=(4, 4), roi_shift=14)
        assert b"\xFF\x5E" in cs            # RGN marker present
        assert (jp2.decode_jp2(cs) == img).all()
        # combined with mode switches
        cs = jp2.encode_jp2(img, levels=2, cb_exp=(4, 4), roi_shift=14,
                            modes=0x05)
        assert (jp2.decode_jp2(cs) == img).all()
        # a shift too small for the background must refuse, not corrupt
        with pytest.raises(ValueError):
            jp2.encode_jp2(img, levels=2, roi_shift=2)

    def test_mode_streams_survive_windows_and_reduce(self):
        rng = np.random.default_rng(19)
        img = rng.integers(0, 255, (96, 96)).astype(np.uint8)
        cs = jp2.encode_jp2(img, tile_size=(48, 48), levels=2,
                            cb_exp=(4, 4), modes=0x2F)
        win = jp2.decode_jp2(cs, window=(20, 30, 40, 33))
        assert (win == img[30:63, 20:60]).all()
        ov = jp2.decode_jp2(cs, reduce=5)     # clamps to levels=2
        assert ov.shape == (24, 24)

    def test_packed_packet_headers_ppt_ppm(self):
        """PPM (main header) / PPT (tile header) packed packet headers:
        header bits come from the Zppm/Zppt-sequenced marker stream
        while bodies stay in the bitstream — round-tripped across
        multi-tile, mode-switch, RPCL+precinct and MCT shapes, plus
        windows/overviews on packed streams."""
        rng = np.random.default_rng(29)
        img = rng.integers(0, 4000, (96, 80)).astype(np.uint16)
        for ph, marker in (("ppt", b"\xFF\x61"), ("ppm", b"\xFF\x60")):
            for extra in ({}, {"modes": 0x05}, {"tile_size": (40, 48)},
                          {"prog": "RPCL", "precinct": 5},
                          {"tile_size": (48, 48), "modes": 0x2F}):
                cs = jp2.encode_jp2(img, levels=3, cb_exp=(4, 4),
                                    packed_headers=ph, **extra)
                assert marker in cs
                assert (jp2.decode_jp2(cs) == img).all(), (ph, extra)
        rgb = rng.integers(0, 255, (70, 66, 3)).astype(np.uint8)
        cs = jp2.encode_jp2(rgb, tile_size=(40, 40), levels=2,
                            packed_headers="ppm")
        for c in range(3):
            assert (jp2.decode_jp2(cs, component=c) == rgb[:, :, c]).all()
        cs = jp2.encode_jp2(img, tile_size=(48, 48), levels=2,
                            cb_exp=(4, 4), packed_headers="ppt")
        win = jp2.decode_jp2(cs, window=(10, 20, 30, 40))
        assert (win == img[20:60, 10:40]).all()
        assert jp2.decode_jp2(cs, reduce=2).shape == (24, 20)

    def test_tile_header_rgn_overrides_main(self):
        """RGN relocated into the tile header (A.6.3 precedence) is
        honored: the marker is moved from the main header into the tile
        header byte-for-byte and the ROI round-trip stays exact."""
        import struct as _struct

        rng = np.random.default_rng(43)
        img = rng.integers(0, 1000, (64, 64)).astype(np.uint16)
        cs = jp2.encode_jp2(img, levels=2, cb_exp=(4, 4), roi_shift=14)
        raw = bytearray(cs)
        i = raw.find(b"\xFF\x5E")
        rgn_seg = bytes(raw[i:i + 7])
        del raw[i:i + 7]
        j = bytes(raw).find(b"\xFF\x93")
        raw[j:j] = rgn_seg
        k = bytes(raw).find(b"\xFF\x90")
        psot = _struct.unpack(">I", raw[k + 6:k + 10])[0]
        raw[k + 6:k + 10] = _struct.pack(">I", psot + 7)
        assert (jp2.decode_jp2(bytes(raw)) == img).all()
        csobj = jp2.JP2Codestream(bytes(raw))
        assert csobj.rgn == {} and csobj.tile_rgn(0, 0) == 14

    def test_per_component_subsampling(self):
        """4:2:0 / 4:2:2 chroma grids (r8): per-component geometry
        decodes each component at its own ceil(ref/d) grid, windows map
        through reference coordinates, and the uniform read_window API
        serves subsampled bands by GDAL-style nearest upsample."""
        rng = np.random.default_rng(53)
        h, w = 90, 78
        cd = jp2._ceil_div
        y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        cb = rng.integers(0, 255, (cd(h, 2), cd(w, 2))).astype(np.uint8)
        cr = rng.integers(0, 255, (cd(h, 2), cd(w, 2))).astype(np.uint8)
        cs = jp2.encode_jp2([y, cb, cr], tile_size=(48, 48), levels=2,
                            cb_exp=(4, 4),
                            subsampling=[(1, 1), (2, 2), (2, 2)],
                            mct=False)
        assert (jp2.decode_jp2(cs, component=0) == y).all()
        assert (jp2.decode_jp2(cs, component=1) == cb).all()
        assert (jp2.decode_jp2(cs, component=2) == cr).all()
        # reference-coord window on the half-res component
        win = jp2.decode_jp2(cs, component=1, window=(10, 20, 30, 40))
        assert (win == cb[10:30, 5:20]).all()
        # overview on the component grid
        assert jp2.decode_jp2(cs, component=1, reduce=1).shape == \
            (cd(cd(h, 2), 2), cd(cd(w, 2), 2))
        # 4:2:2 + mode switches compose
        cb2 = rng.integers(0, 255, (h, cd(w, 2))).astype(np.uint8)
        cs2 = jp2.encode_jp2([y, cb2, cb2], levels=2, cb_exp=(4, 4),
                             subsampling=[(1, 1), (2, 1), (2, 1)],
                             mct=False, modes=0x05)
        assert (jp2.decode_jp2(cs2, component=1) == cb2).all()
        # uniform band API: nearest upsample to the reference grid
        info = jp2.read_info(cs)
        assert (info.width, info.height) == (w, h)
        up = jp2.read_window(cs, info, 0, 0, w, h, band=1)
        exp = cb[(np.arange(h) // 2)[:, None], (np.arange(w) // 2)]
        assert (up == exp).all()
        winu = jp2.read_window(cs, info, 11, 23, 33, 21, band=1)
        assert (winu == exp[23:44, 11:44]).all()
        # r9: position-ordered progressions compose with subsampled
        # grids (reference-grid anchors; interleave pinned against
        # hand-assembled fixtures in test_jp2_spec_fixtures.py) —
        # multi-tile RPCL/PCRL round-trips exactly
        for prg in ("RPCL", "PCRL"):
            cs3 = jp2.encode_jp2([y, cb, cr], tile_size=(48, 48),
                                 levels=2, cb_exp=(4, 4), prog=prg,
                                 subsampling=[(1, 1), (2, 2), (2, 2)],
                                 mct=False)
            assert (jp2.decode_jp2(cs3, component=0) == y).all(), prg
            assert (jp2.decode_jp2(cs3, component=1) == cb).all(), prg
            assert (jp2.decode_jp2(cs3, component=2) == cr).all(), prg

    def test_poc_roundtrip(self):
        """POC progression-order changes (r9): the encoder writes a POC
        marker and orders packets per record; the decoder follows it.
        Volume split by resolution (res 0 PCRL-first, rest RPCL) across
        tiles, subsampling, and the reduce path."""
        rng = np.random.default_rng(29)
        img = rng.integers(0, 200, (40, 56)).astype(np.uint8)
        cbp = rng.integers(0, 99, (20, 28)).astype(np.uint8)
        cs = jp2.encode_jp2([img, cbp], levels=2, cb_exp=(4, 4),
                            precinct=5, subsampling=[(1, 1), (2, 2)],
                            mct=False,
                            poc=[(0, 0, 1, 1, 2, 3), (0, 0, 1, 3, 2, 2)])
        assert (jp2.decode_jp2(cs, component=0) == img).all()
        assert (jp2.decode_jp2(cs, component=1) == cbp).all()
        cs2 = jp2.encode_jp2(img, tile_size=(24, 24), levels=2,
                             cb_exp=(4, 4), precinct=5,
                             poc=[(0, 0, 1, 2, 1, 4), (0, 0, 1, 3, 1, 0)])
        assert (jp2.decode_jp2(cs2) == img).all()
        assert jp2.decode_jp2(cs2, reduce=1).shape == (20, 28)
        # POC records must cover every packet
        with pytest.raises(ValueError, match="cover"):
            jp2.encode_jp2(img, levels=2, cb_exp=(4, 4),
                           poc=[(0, 0, 1, 1, 1, 0)])

    def test_poc_noncovering_continues_in_last_progression(self):
        """ADVICE r9: a third-party stream whose POC records do NOT
        cover every packet completes the remainder in the LAST record's
        progression (B.12.2) instead of silently returning a desynced
        partial decode. Fixture: encode with two same-progression
        records split by resolution (their concatenation == 'record 1
        then remainder in the same progression' byte-for-byte), then
        patch the main-header POC marker down to just record 1 — the
        packet bytes are unchanged, so a correct continuation decodes
        bit-exactly."""
        import struct as _st

        rng = np.random.default_rng(31)
        img = rng.integers(0, 255, (40, 56)).astype(np.uint8)
        for pp in (0, 2, 4):
            cs = jp2.encode_jp2(img, levels=2, cb_exp=(4, 4), precinct=5,
                                poc=[(0, 0, 1, 2, 1, pp),
                                     (0, 0, 1, 3, 1, pp)])
            i = cs.index(b"\xFF\x5F")
            assert i < cs.index(b"\xFF\x90")  # main-header POC
            lpoc = _st.unpack(">H", cs[i + 2:i + 4])[0]
            assert lpoc == 2 + 14  # two 7-byte records
            patched = (cs[:i + 2] + _st.pack(">H", 2 + 7)
                       + cs[i + 4:i + 11] + cs[i + 4 + 14:])
            assert (jp2.decode_jp2(patched) == img).all(), pp

    def test_poc_marker_residue_rejected(self):
        """ADVICE r9: a POC payload that is not a whole number of
        records is a truncated marker, not a shorter record list."""
        with pytest.raises(ValueError, match="multiple"):
            jp2._parse_poc(b"\x00" * 8, ncomp=1)
        with pytest.raises(ValueError, match="multiple"):
            jp2._parse_poc(b"\x00" * 17, ncomp=300)

    def test_packed_header_corruption_fuzz(self):
        rng = np.random.default_rng(37)
        img = rng.integers(0, 255, (32, 32)).astype(np.uint8)
        for ph in ("ppt", "ppm"):
            base = jp2.encode_jp2(img, levels=1, cb_exp=(4, 4),
                                  packed_headers=ph)
            for _ in range(40):
                data = bytearray(base)
                k = rng.integers(0, len(data))
                data[k] ^= 1 << rng.integers(0, 8)
                try:
                    jp2.decode_jp2(bytes(data))
                except (ValueError, NotImplementedError):
                    pass

    def test_mode_corruption_fuzz(self):
        rng = np.random.default_rng(23)
        img = rng.integers(0, 255, (32, 32)).astype(np.uint8)
        base = jp2.encode_jp2(img, levels=1, cb_exp=(4, 4), modes=0x25)
        for _ in range(60):
            data = bytearray(base)
            k = rng.integers(0, len(data))
            data[k] ^= 1 << rng.integers(0, 8)
            try:
                jp2.decode_jp2(bytes(data))
            except (ValueError, NotImplementedError):
                pass   # structured failures only — never hangs/crashes


def test_cs_cache_invalidated_on_overwrite(tmp_path):
    """Overwriting a .jp2 in place must not serve stale parsed offsets /
    cached tiles from the previous file at the same URI."""
    from rasterframes_spark.sources.rangeio import open_source

    p = str(tmp_path / "prod.jp2")
    for fill in (7, 200):
        arr = np.full((32, 32), fill, dtype=np.uint8)
        code = jp2.encode_jp2(arr, levels=2)
        open(p, "wb").write(jp2.wrap_jp2(code, 32, 32, 8))
        os.utime(p, (1e9, 1e9 + fill))  # distinct mtime even on coarse fs
        src = open_source(p)
        info = jp2.read_info(src)
        win = jp2.read_window(src, info, 0, 0, 32, 32)
        assert (win == fill).all()


def test_wrap_jp2_nodata_and_signed_depth_roundtrip():
    """nodata survives the container (GDAL-PAM xml box) and int16 reads
    back as int16, not int32."""
    a = (np.arange(32 * 32).reshape(32, 32) % 100 - 50).astype(np.int16)
    code = jp2.encode_jp2(a, depth=16, signed=True)
    data = jp2.wrap_jp2(code, 32, 32, 16, signed=True,
                        crs="EPSG:32631", extent=(0.0, 0.0, 320.0, 320.0),
                        nodata=-50)
    info = jp2.read_info(data)
    assert info.dtype == "int16"
    assert info.nodata == -50
    assert info.crs == "EPSG:32631"
    assert np.array_equal(jp2.read_window(data, info, 0, 0, 32, 32), a)


def test_decode_jp2_tile_reduce_beyond_levels_raises():
    a = np.zeros((16, 16), dtype=np.uint8)
    data = jp2.encode_jp2(a, levels=2)
    with pytest.raises(ValueError):
        jp2.decode_jp2_tile(data, 0, reduce=3)


def test_gmljp2_found_past_64k():
    """A large box before the GML association must not lose
    georeferencing (the old 64 KiB scan window)."""
    a = np.zeros((8, 8), dtype=np.uint8)
    code = jp2.encode_jp2(a, levels=1)
    full = jp2.wrap_jp2(code, 8, 8, 8, crs="EPSG:4326",
                        extent=(1.0, 2.0, 3.0, 4.0))
    # splice a 100 KiB xml box in front of the GML asoc box
    # box layout: [4-byte length][4-byte type][payload]; find(b"asoc")
    # lands on the type field, so the box boundary is 4 bytes earlier
    insert_at = full.find(b"asoc") - 4
    import struct as _s
    big = _s.pack(">I", 8 + 100_000) + b"xml " + b"<pad/>" * 0 + b"x" * 100_000
    spliced = full[:insert_at] + big + full[insert_at:]
    info = jp2.read_info(spliced)
    assert info.crs == "EPSG:4326"
    assert info.extent == (1.0, 2.0, 3.0, 4.0)


# ---------------------------------------------------------------------------
# multi-component (Sentinel-2 TCI shape: 3 components, RCT, uniform grid)
# ---------------------------------------------------------------------------

def test_multicomponent_roundtrips():
    """RGB encode<->decode bit-exact across MCT on/off, both
    progressions, precincts, multiple tiles, odd sizes, and signed data
    — the packet stream interleaves every component's packets, so any
    ordering drift desynchronizes immediately."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (70, 53, 3)).astype(np.uint8)
    for kwargs in (
        dict(tile_size=(32, 32), levels=3, cb_exp=(4, 4)),        # MCT LRCP
        dict(tile_size=(32, 32), levels=3, cb_exp=(4, 4),
             precinct=5, prog="RPCL"),                             # MCT RPCL
        dict(tile_size=(32, 32), levels=2, cb_exp=(4, 4),
             mct=False),                                           # no MCT
    ):
        code = jp2.encode_jp2(rgb, **kwargs)
        for c in range(3):
            assert np.array_equal(jp2.decode_jp2(code, component=c),
                                  rgb[:, :, c]), (kwargs, c)
    # 2 components (MCT impossible), signed values
    two = rng.integers(-100, 100, (33, 41, 2)).astype(np.int16)
    code = jp2.encode_jp2(two, levels=2)
    for c in range(2):
        assert np.array_equal(jp2.decode_jp2(code, component=c),
                              two[:, :, c])


def test_multicomponent_reduce_and_window():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 4096, (96, 128, 3)).astype(np.uint16)
    code = jp2.encode_jp2(rgb, tile_size=(64, 64), levels=3)
    # reduced-resolution decode per component has the overview shape
    red = jp2.decode_jp2(code, component=1, reduce=2)
    assert red.shape == (24, 32)
    # window read straddling a tile boundary, non-zero band
    data = jp2.wrap_jp2(code, 128, 96, 12)
    info = jp2.read_info(data)
    assert info.bands == 3
    win = jp2.read_window(data, info, 48, 32, 40, 30, band=2)
    assert np.array_equal(win, rgb[32:62, 48:88, 2].astype(win.dtype))


def test_write_jp2_rgb_roundtrip(spark, tmp_path):
    """write_jp2 with three tile columns exports one true-color .jp2
    (RCT, sRGB colorspace) whose bands decode bit-exactly."""
    from pyspark.sql import functions as F
    from rasterframes_spark.sources import raster_reader as S
    from rasterframes_spark.sources import sinks

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    code = jp2.encode_jp2(rgb, tile_size=(64, 64), levels=3)
    src = str(tmp_path / "src.jp2")
    open(src, "wb").write(jp2.wrap_jp2(code, 128, 96, 8, crs="EPSG:32631",
                                       extent=(0.0, 0.0, 1280.0, 960.0),
                                       ncomp=3))
    df = S.read_raster(spark, [src], band_indexes=(0, 1, 2),
                       tile_dimensions=(64, 64))
    df = df.select(*[S.realize_tiles(f"tile_b{b}").alias(f"t{b}")
                     for b in range(3)], "extent", "crs")
    out = str(tmp_path / "tci.jp2")
    sinks.write_jp2(df, out, tile_col=["t0", "t1", "t2"],
                    tile_size=(64, 64), levels=3)
    raw = open(out, "rb").read()
    info = jp2.read_info(raw)
    assert info.bands == 3 and info.crs == "EPSG:32631"
    for c in range(3):
        assert np.array_equal(jp2.decode_jp2(raw, component=c),
                              rgb[:, :, c])


def test_multicomponent_corruption_fuzz():
    """Random byte corruption of a multi-component file either decodes
    (bit flips in entropy-coded data are inherently undetectable) or
    raises a clean ValueError/NotImplementedError — never a hang or a
    raw internal exception. Pins three found-by-fuzz classes: a tiny
    corrupted Xtsiz declaring millions of phantom tiles (per-tile loop
    DoS), a destroyed SIZ leaving component metadata unset, and a
    corrupted Ssiz claiming up to 128-bit depth (int64 overflow)."""
    import random
    import signal

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    code = jp2.encode_jp2(rgb, tile_size=(32, 32), levels=2, cb_exp=(4, 4))
    data = jp2.wrap_jp2(code, 40, 40, 8, ncomp=3)
    info = jp2.read_info(data)

    def on_alarm(sig, frm):
        raise AssertionError("decoder hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(1)
        for trial in range(200):
            b = bytearray(data)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(8, len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                jp2.read_window(bytes(b), info, 0, 0, 40, 40,
                                band=random.randrange(3))
            except (ValueError, NotImplementedError):
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_multicomponent_read_raster(spark, tmp_path):
    """Distributed 3-band read: read_raster(band_indexes=(0,1,2)) on a
    georeferenced MCT JP2 reproduces every band exactly."""
    import rasterframes_spark as rf
    from pyspark.sql import functions as F
    from rasterframes_spark.sources import raster_reader as S

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    code = jp2.encode_jp2(rgb, tile_size=(64, 64), levels=3)
    p = str(tmp_path / "tci.jp2")
    open(p, "wb").write(jp2.wrap_jp2(code, 128, 96, 8, crs="EPSG:32631",
                                     extent=(0.0, 0.0, 1280.0, 960.0)))
    df = S.read_raster(spark, [p], band_indexes=(0, 1, 2),
                       tile_dimensions=(64, 64))
    cols = ["tile_b0", "tile_b1", "tile_b2"]
    out = df.select(*[S.realize_tiles(c).alias(c) for c in cols])
    sums = out.agg(*[F.sum(rf.rf_tile_sum(c)).alias(c) for c in cols]).head()
    for b, c in enumerate(cols):
        assert sums[c] == float(rgb[:, :, b].sum())


# ---------------------------------------------------------------------------
# reference fixture (Kakadu-encoded Sentinel-2)
# ---------------------------------------------------------------------------

needs_b01 = pytest.mark.skipif(not os.path.exists(B01),
                               reason="reference fixture not present")


@needs_b01
def test_b01_info_and_georeferencing():
    raw = open(B01, "rb").read()
    info = jp2.jp2_info(raw)
    assert info == {
        "width": 1830, "height": 1830, "tile_width": 192,
        "tile_height": 192, "n_tiles": 100, "n_components": 1,
        "depth": 15, "signed": False, "levels": 4, "layers": 1,
        "codeblock": (4, 4), "reversible": True,
    }
    gi = jp2.read_info(raw)
    assert gi.crs == "EPSG:32615"
    assert gi.extent == (499980.0, 4190220.0, 609780.0, 4300020.0)
    assert gi.via == "jp2"


@needs_b01
def test_b01_tiles_decode_byte_exact_and_coherent():
    """Three non-adjacent Kakadu tiles: packet parse must consume the
    tile body byte-exactly, values must be plausible reflectances, and
    the shared edge of two adjacent tiles must be as continuous as the
    tile interiors (a systematic decode error cannot survive this)."""
    raw = open(B01, "rb").read()
    cs = jp2.JP2Codestream(jp2._strip_container(raw))

    endpos = {}
    orig = jp2._read_packet

    def spy(cs_, cod_, rd, *a, **kw):
        orig(cs_, cod_, rd, *a, **kw)
        endpos["p"] = rd.pos

    jp2._read_packet = spy
    try:
        tiles = {}
        for t in (0, 1, 55):
            body_len = sum(b - a for a, b in cs.tile_parts[t])
            tiles[t] = jp2._decode_tile(cs, t, 0)
            assert endpos["p"] == body_len, (t, endpos["p"], body_len)
    finally:
        jp2._read_packet = orig

    for t, arr in tiles.items():
        assert 900 < arr.mean() < 6000, (t, arr.mean())
        assert arr.min() >= 0 and arr.max() < (1 << 15)
    # seam continuity between tiles 0 and 1 (x = 191 | 192)
    seam = np.abs(tiles[0][:, -1].astype(int) - tiles[1][:, 0].astype(int))
    interior = np.abs(tiles[0][:, -1].astype(int)
                      - tiles[0][:, -2].astype(int))
    assert seam.mean() < 3 * interior.mean() + 5


@needs_b01
def test_b01_read_raster_distributed(spark):
    """The chunked reader dispatches .jp2 scenes to the native codec:
    chunk grid + GMLJP2 georeferencing + distributed window decode, with
    the aggregate over all chunks matching a driver-side full decode."""
    import rasterframes_spark as rf
    from pyspark.sql import functions as F
    from rasterframes_spark.sources import raster_reader as S

    df = S.read_raster(spark, [B01], tile_dimensions=(640, 640))
    assert df.count() == 9  # 1830/640 -> 3x3 chunks
    row = df.select("extent", "crs").first()
    assert row["crs"] == "EPSG:32615"
    assert row["extent"]["xmin"] == 499980.0
    t = df.select(S.realize_tiles("tile_ref").alias("tile"))
    s = t.agg(rf.rf_agg_stats("tile").alias("s")).first()["s"]
    assert s["data_cells"] == 1830 * 1830
    raw = open(B01, "rb").read()
    full = jp2.decode_jp2(raw, window=(0, 0, 1830, 128))  # spot strip
    strip = jp2.read_window(raw, jp2.read_info(raw), 0, 0, 1830, 128)
    assert (full == strip).all()
    assert s["min"] >= 900 and s["max"] < (1 << 15)


def test_write_jp2_sink_roundtrip(spark, tmp_path):
    """write_jp2 exports a tile DataFrame as one lossless .jp2 with
    GMLJP2 georeferencing; pixels, CRS and extent all round-trip through
    read_raster — the reference has no JP2 write at all."""
    import rasterframes_spark as rf
    from pyspark.sql import functions as F
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.sources import raster_reader as S
    from rasterframes_spark.sources import sinks

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 3000, (96, 128)).astype(np.uint16)
    src_p = str(tmp_path / "src.tif")
    open(src_p, "wb").write(GT.write_geotiff(
        arr, (10.0, 40.0, 11.28, 40.96), "EPSG:4326"))
    df = S.read_raster(spark, [src_p], tile_dimensions=(64, 64))
    df = df.select(S.realize_tiles("tile_ref").alias("tile"),
                   "extent", "crs")
    out_p = str(tmp_path / "out.jp2")
    sinks.write_jp2(df, out_p, tile_size=(64, 64), levels=3)
    raw = open(out_p, "rb").read()
    info = jp2.read_info(raw)
    assert info.crs == "EPSG:4326" and info.via == "jp2"
    assert all(abs(a - b) < 1e-9 for a, b in
               zip(info.extent, (10.0, 40.0, 11.28, 40.96)))
    assert (jp2.decode_jp2(raw).astype(int) == arr.astype(int)).all()
    back = S.read_raster(spark, [out_p], tile_dimensions=(64, 64))
    s = back.select(S.realize_tiles("tile_ref").alias("t")).agg(
        F.sum(rf.rf_tile_sum("t"))).head()[0]
    assert s == float(arr.sum())
    # float cell types are rejected (reversible JP2 = exact integers)
    fdf = df.select(rf.rf_convert_cell_type("tile", "float64").alias("tile"),
                    "extent", "crs")
    with pytest.raises(ValueError):
        sinks.write_jp2(fdf, str(tmp_path / "bad.jp2"))


@needs_b01
def test_b01_window_read_and_reencode_roundtrip():
    raw = open(B01, "rb").read()
    info = jp2.read_info(raw)
    win = jp2.read_window(raw, info, 100, 150, 120, 80)
    assert win.shape == (80, 120) and win.dtype == np.uint16
    # re-encode the decoded window with our encoder: bit-exact round-trip
    re = jp2.encode_jp2(win, levels=3)
    assert (jp2.decode_jp2(re).astype(int) == win.astype(int)).all()


def test_t1_fused_decoder_parity_with_reference_impl():
    """The exec-generated fused T1 decoder (r7 throughput pass) must be
    bit-identical to the readable class-based reference implementation
    on a randomized matrix covering every subband, magnitude range,
    sparsity (RLC-heavy) and saturation (skip-shortcut) regime."""
    import numpy as np

    from rasterframes_spark.sources import jp2

    rng = np.random.default_rng(42)
    for trial in range(80):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        orient = ["LL", "LH", "HL", "HH"][trial % 4]
        scale = int(rng.choice([3, 100, 30000]))
        co = rng.integers(-scale, scale, (h, w)).astype(np.int64)
        if trial % 5 == 0:
            co[rng.random((h, w)) < 0.8] = 0        # sparse: RLC path
        if trial % 7 == 0:
            co = np.abs(co) + 1                     # saturated: skip path
        data, npass, nbp = jp2.t1_encode(co, orient)
        ref = jp2.t1_decode(data, w, h, npass, nbp, orient)
        fast = jp2._t1_decode_fast(data, w, h, npass, nbp, orient)
        assert np.array_equal(ref, fast), (trial, w, h, orient)
        assert np.array_equal(ref, co)


class TestLossy97:
    """Irreversible 9/7 path (r7): float lifting DWT, scalar
    quantization with midpoint reconstruction, ICT color transform.
    No external lossy fixture exists in-container (no GDAL/openjpeg to
    produce one); the anchors are (a) analysis<->synthesis invertibility
    of the 9/7 lifting to 1e-9, (b) the quantization error bound — at
    frac_bits=6 the reconstruction error is < 0.5 LSB for 8/12-bit
    data, so round-trips are exactly integer-identical, (c) realistic
    rate/PSNR behavior at coarse quantization, and (d) the skipif'd
    rasterio parity test in test_sources.py when GDAL is present."""

    def test_dwt97_invertibility(self):
        import numpy as np

        from rasterframes_spark.sources import jp2

        rng = np.random.default_rng(0)
        for (h, w, u0, v0) in [(16, 16, 0, 0), (17, 23, 1, 0), (5, 9, 3, 7),
                               (1, 8, 0, 1), (8, 1, 1, 0), (31, 17, 5, 2),
                               (2, 2, 1, 1), (1, 1, 0, 0), (1, 1, 1, 1)]:
            a = rng.normal(0, 100, (h, w))
            ll, hl, lh, hh = jp2.dwt97_forward(a, u0, v0)
            back = jp2.dwt97_inverse(ll, hl, lh, hh, u0, v0, u0 + w, v0 + h)
            assert np.abs(back - a).max() < 1e-9, (h, w, u0, v0)

    def test_fine_quantization_roundtrip_exact(self):
        import numpy as np

        from rasterframes_spark.sources import jp2

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (100, 130)).astype(np.uint16)
        dec = jp2.decode_jp2(jp2.encode_jp2(img, levels=3, lossy=True,
                                            frac_bits=6))
        np.testing.assert_array_equal(dec, img)
        img12 = rng.integers(0, 4096, (80, 70)).astype(np.uint16)
        dec = jp2.decode_jp2(jp2.encode_jp2(img12, levels=4, lossy=True,
                                            frac_bits=6))
        np.testing.assert_array_equal(dec, img12)

    def test_rgb_ict_roundtrip(self):
        import numpy as np

        from rasterframes_spark.sources import jp2

        rng = np.random.default_rng(2)
        rgb = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
        b = jp2.encode_jp2(rgb, levels=3, lossy=True, frac_bits=6)
        for c in range(3):
            np.testing.assert_array_equal(jp2.decode_jp2(b, component=c),
                                          rgb[:, :, c])

    def test_rate_distortion_behaves(self):
        import numpy as np

        from rasterframes_spark.sources import jp2

        x, y = np.meshgrid(np.arange(128), np.arange(96))
        img = (128 + 100 * np.sin(x / 9.0) * np.cos(y / 11.0)).astype("uint8")
        sizes, psnrs = [], []
        for fb in (0, 2, 4):
            b = jp2.encode_jp2(img, levels=4, lossy=True, frac_bits=fb)
            e = jp2.decode_jp2(b).astype(float) - img
            sizes.append(len(b))
            psnrs.append(10 * np.log10(255 ** 2 / max((e * e).mean(), 1e-12)))
        assert sizes[0] < sizes[1] < sizes[2]      # rate grows with quality
        assert psnrs[0] < psnrs[1] < psnrs[2]      # distortion shrinks
        assert psnrs[0] > 40                       # coarse is still decent
        assert sizes[0] < 0.06 * img.size          # and strongly compressed

    def test_tiled_windows_overview_and_reader(self, tmp_path):
        import numpy as np

        from rasterframes_spark.sources import jp2
        from rasterframes_spark.sources.rangeio import RangeSource

        rng = np.random.default_rng(3)
        img = rng.integers(0, 4096, (200, 300)).astype(np.uint16)
        b = jp2.encode_jp2(img, tile_size=(64, 64), levels=3, lossy=True,
                           frac_bits=6, prog="RPCL", precinct=6)
        dec = jp2.decode_jp2(b)
        np.testing.assert_array_equal(dec, img)
        wdec = jp2.decode_jp2(b, window=(70, 50, 100, 90))
        np.testing.assert_array_equal(wdec, dec[50:140, 70:170])
        assert jp2.decode_jp2(b, reduce=2).shape == (50, 75)
        p = tmp_path / "lossy.jp2"
        p.write_bytes(b)
        info = jp2.read_info(RangeSource(str(p)))
        assert (info.width, info.height) == (300, 200)
        arr = jp2.read_window(RangeSource(str(p)), info, 30, 20, 60, 70, 0)
        np.testing.assert_array_equal(arr, img[20:90, 30:90])

    def test_mixed_transform_quantization_rejected(self):
        import numpy as np
        import pytest as _pytest

        from rasterframes_spark.sources import jp2

        img = np.zeros((16, 16), dtype=np.uint8)
        b = bytearray(jp2.encode_jp2(img, levels=2, lossy=True, frac_bits=4))
        # flip the COD transform byte to 5/3 while QCD stays quantized
        i = bytes(b).find(b"\xFF\x52")
        ln = int.from_bytes(b[i + 2:i + 4], "big")
        b[i + 4 + ln - 1 - (0)] = 1  # last COD byte = transform
        with _pytest.raises(ValueError):
            jp2.decode_jp2(bytes(b))


def test_write_jp2_lossy_sink(spark, tmp_path):
    """write_jp2(lossy=True): the 9/7 export path — at frac_bits=6 the
    round-trip is still integer-exact for 12-bit data, and the lossy
    file is smaller than the lossless one on smooth content."""
    import rasterframes_spark as rf  # noqa: F401 - registers SQL fns
    from pyspark.sql import functions as F
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.sources import raster_reader as S
    from rasterframes_spark.sources import sinks

    x, y = np.meshgrid(np.arange(128), np.arange(96))
    arr = (1000 + 800 * np.sin(x / 11.0) * np.cos(y / 9.0)).astype("uint16")
    src_p = str(tmp_path / "src.tif")
    open(src_p, "wb").write(GT.write_geotiff(
        arr, (0.0, 0.0, 1.28, 0.96), "EPSG:4326"))
    df = S.read_raster(spark, [src_p], tile_dimensions=(64, 64))
    df = df.select(S.realize_tiles("tile_ref").alias("tile"),
                   "extent", "crs")
    lossless_p = str(tmp_path / "ll.jp2")
    lossy_p = str(tmp_path / "ly.jp2")
    sinks.write_jp2(df, lossless_p, tile_size=(64, 64), levels=3)
    sinks.write_jp2(df, lossy_p, tile_size=(64, 64), levels=3,
                    lossy=True, frac_bits=6)
    assert (jp2.decode_jp2(open(lossy_p, "rb").read()).astype(int)
            == arr.astype(int)).all()
    # coarse quantization: visibly smaller file, bounded error
    small_p = str(tmp_path / "small.jp2")
    sinks.write_jp2(df, small_p, tile_size=(64, 64), levels=3,
                    lossy=True, frac_bits=0)
    import os
    assert os.path.getsize(small_p) < 0.6 * os.path.getsize(lossless_p)
    dec = jp2.decode_jp2(open(small_p, "rb").read()).astype(float)
    assert np.abs(dec - arr).max() < 16
