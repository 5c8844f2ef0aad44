"""Progressive (SOF2) JPEG decode — ITU-T T.81 Annex G.

Oracle: entropy framing is lossless, so the progressive re-encoding of
the SAME quantized coefficients must decode BIT-IDENTICALLY to the
baseline encoding (the jpegtran transcode identity).  The encoder's scan
script (DC first Al=1, DC refine, per-component AC first Al=1, AC
refine) exercises all four progressive scan kinds, EOB runs across
blocks, ZRL-in-refinement, and optimized (Annex K.2) Huffman tables with
EOBn symbols.  No externally-encoded progressive fixture exists in this
container (no libjpeg); the external baseline fixtures in
tests/fixtures/ pin the shared coefficient/IDCT machinery.
"""
import numpy as np
import pytest

from rasterframes_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _rand(h, w, nc, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, nc)).astype(np.uint8)
    return img[:, :, 0] if nc == 1 else img


@pytest.mark.parametrize("h,w,nc,sub,q", [
    (8, 8, 1, "444", 85),        # single block, grayscale
    (16, 24, 3, "444", 85),
    (17, 23, 3, "420", 70),      # partial MCUs both axes
    (64, 48, 3, "422", 90),
    (33, 31, 1, "444", 50),
    (128, 96, 3, "420", 85),
    (9, 9, 3, "420", 95),        # single partial MCU
    (40, 40, 3, "444", 30),      # coarse quant: sparse bands, long EOBs
])
def test_progressive_equals_baseline(h, w, nc, sub, q):
    img = _rand(h, w, nc, seed=h * w + q)
    sub = sub if nc == 3 else "444"
    base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                   progressive=True))
    np.testing.assert_array_equal(base, prog)


def test_progressive_smooth_gradient_eob_runs():
    """Smooth content drives long cross-block EOB runs (EOBn symbols)."""
    yy, xx = np.mgrid[0:96, 0:128]
    img = np.stack([(yy * 2) % 256, (xx * 2) % 256, (xx + yy) % 256],
                   -1).astype(np.uint8)
    for sub in ("444", "420", "422"):
        b = decode_jpeg(encode_jpeg(img, 75, sub))
        p = decode_jpeg(encode_jpeg(img, 75, sub, progressive=True))
        np.testing.assert_array_equal(b, p)


def test_progressive_flat_image():
    """All-zero AC bands: pure EOB-run scans."""
    img = np.full((24, 24, 3), 130, np.uint8)
    b = decode_jpeg(encode_jpeg(img, 85))
    p = decode_jpeg(encode_jpeg(img, 85, progressive=True))
    np.testing.assert_array_equal(b, p)


def test_progressive_quality_sweep():
    img = _rand(31, 47, 3, seed=1)
    for q in (10, 50, 75, 95, 100):
        b = decode_jpeg(encode_jpeg(img, q))
        p = decode_jpeg(encode_jpeg(img, q, progressive=True))
        np.testing.assert_array_equal(b, p)


def test_progressive_closeness_to_source():
    """Progressive decode is a real image, not just self-consistent."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([(yy * 3) % 256] * 3, -1).astype(np.uint8)
    p = decode_jpeg(encode_jpeg(img, 92, progressive=True))
    assert p.shape == (64, 64, 3)
    assert np.abs(p.astype(int) - img.astype(int)).mean() < 6.0


def test_progressive_truncated_raises_or_degrades():
    img = _rand(32, 32, 3, seed=2)
    data = encode_jpeg(img, 85, progressive=True)
    # cutting into the scan data must not crash with a non-ValueError
    for cut in (len(data) // 2, len(data) - 20):
        try:
            out = decode_jpeg(data[:cut])
            assert out.shape == (32, 32, 3)    # partial render is fine
        except ValueError:
            pass


def test_progressive_decode_image_dispatch(spark):
    """The multimodal pipeline path sniffs and decodes SOF2 payloads."""
    from rasterframes_spark.pipeline.multimodal import decode_image

    img = _rand(24, 40, 3, seed=5)
    payload = encode_jpeg(img, 80, progressive=True)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    row = decode_image(df, decode="jpeg").first()
    assert (row.height, row.width, row.channels) == (24, 40, 3)
    got = np.frombuffer(bytes(row.pixels), dtype=np.uint8).reshape(24, 40, 3)
    ref = decode_jpeg(payload)
    np.testing.assert_array_equal(got, ref)


def test_optimized_table_validity():
    """Annex K.2 optimizer output must be a canonical prefix-free table
    (code space never overflows, all-ones max-length code unused)."""
    from rasterframes_spark.sources.jpeg import _optimize_huffman

    for freq in ({0: 1}, {0: 1000, 0xF0: 3, 0x11: 500, 0x21: 2},
                 {s: (s % 7) + 1 for s in range(256)},
                 {s: 2 ** (s % 20) for s in range(0, 256, 3)}):
        bits, hv = _optimize_huffman(freq)
        assert len(hv) == sum(bits) and set(freq) <= set(hv)
        code = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                assert code < (1 << length), "code space overflow"
                assert not (length == 16 and code == 0xFFFF), \
                    "reserved all-ones code used"
                code += 1
            code <<= 1


def test_fill_bytes_before_marker_decode_identical():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes; a
    conforming stream with fill padding must decode to the same pixels
    (regression: the marker loop used to read the fill byte as the
    marker code and silently skip the real scan)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    data = encode_jpeg(img, progressive=True)
    ref = decode_jpeg(data)
    # pad every SOS marker except the first with fill bytes
    first = data.index(b"\xff\xda")
    padded = data[:first + 2] + data[first + 2:].replace(
        b"\xff\xda", b"\xff\xff\xff\xda")
    assert len(padded) > len(data)
    np.testing.assert_array_equal(decode_jpeg(padded), ref)


@pytest.mark.parametrize("progressive", [False, True])
def test_sampling_factor_zero_raises(progressive):
    """A one-byte flip zeroing a component's H/V sampling factors must
    surface as ValueError, not ZeroDivisionError (task-crash class)."""
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_jpeg(img, progressive=progressive))
    sof = data.index(b"\xff\xc2" if progressive else b"\xff\xc0")
    hv = sof + 11  # marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1)
    assert data[hv] == 0x11
    data[hv] = 0x00
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


@pytest.mark.parametrize("progressive", [False, True])
def test_huge_declared_dims_raise(progressive):
    """Header-declared 65535x65535 dims from a tiny stream must raise,
    not allocate a multi-GB coefficient store / output plane."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_jpeg(img, progressive=progressive))
    sof = data.index(b"\xff\xc2" if progressive else b"\xff\xc0")
    data[sof + 5:sof + 9] = b"\xff\xff\xff\xff"   # h=w=65535
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_progressive_omits_baseline_tables():
    """The progressive scan script carries its own optimized DHTs; the
    Annex K baseline tables must not also be emitted (dead bytes)."""
    from rasterframes_spark.sources.jpeg import _DC_L

    rng = np.random.default_rng(24)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    annexk_dc_bits = bytes(_DC_L[0])
    assert annexk_dc_bits in encode_jpeg(img, progressive=False)
    prog = encode_jpeg(img, progressive=True)
    assert annexk_dc_bits not in prog
    np.testing.assert_array_equal(
        decode_jpeg(prog), decode_jpeg(encode_jpeg(img, progressive=False)))
