"""WebP lossless (VP8L) codec tests.

Verification posture mirrors test_jp2.py: encoder round-trips, hand-built
bitstream vectors for the decoder-only paths (LZ77 backward references,
color cache, color-indexing with packed pixels, predictor and color
transforms), and corruption fuzzing. No independent WebP decoder exists
in this container to diff against.
"""
from __future__ import annotations

import random
import signal

import numpy as np
import pytest

from rasterframes_spark.sources import webp as W


# ---------------------------------------------------------------------------
# stream-builder helpers (hand-built decoder vectors)
# ---------------------------------------------------------------------------


def _header(bw, w, h, alpha=0):
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, alpha)
    bw.write(3, 0)


def _codes_for(bw, streams):
    """streams: [(alphabet_size, [used symbols...])] in g,r,b,a,d order.
    Writes the five prefix codes; returns per-channel emitters."""
    chans = []
    for n, syms in streams:
        f = [0] * n
        for s in syms:
            f[s] += 1
        if not any(f):
            f[0] = 1          # unused alphabet: 0-bit single-symbol code
        lens = W._huffman_lengths(f)
        W._write_prefix_code(bw, lens)
        multi = sum(1 for x in lens if x) > 1
        chans.append((lens, W._canonical_codes(lens) if multi else None))
    return chans


def _emit(bw, chan, sym):
    lens, codes = chan
    if codes is not None:
        bw.write_code(lens[sym], codes[sym])


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (40, 40, 3),
                                   (33, 17, 4), (128, 1, 3), (1, 200, 3)])
def test_roundtrip_exact(shape):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    buf = W.encode_webp(a)
    back = W.decode_webp(buf)
    exp = a if (shape[2] == 4 and (a[:, :, 3] != 255).any()) else a[:, :, :3]
    assert back.shape == exp.shape
    assert np.array_equal(back, exp)


def test_roundtrip_compresses_structured():
    x = np.linspace(0, 255, 128).astype(np.uint8)
    grad = np.stack([np.tile(x, (128, 1))] * 3, axis=2)
    buf = W.encode_webp(grad)
    assert len(buf) < grad.nbytes // 2
    assert np.array_equal(W.decode_webp(buf), grad)


def test_read_info():
    a = np.zeros((17, 33, 4), np.uint8)
    a[:, :, 3] = 128                      # real alpha
    w, h, alpha = W.read_info(W.encode_webp(a))
    assert (w, h, alpha) == (33, 17, True)


def test_header_bit_layout_pinned():
    """Pins the bit conventions: RIFF wrap, 0x2F signature, LSB-first
    14-bit dims. A 3x2 all-zero image: first VP8L payload bytes are
    signature then (w-1)=2 in 14 bits then (h-1)=1."""
    buf = W.encode_webp(np.zeros((2, 3, 3), np.uint8))
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP" and buf[12:16] == b"VP8L"
    payload = buf[20:]
    assert payload[0] == 0x2F
    br = W._BitReader(payload)
    br.bits(8)
    assert br.bits(14) == 2 and br.bits(14) == 1
    assert br.bit() == 0                  # alpha unused
    assert br.bits(3) == 0                # version


# ---------------------------------------------------------------------------
# decoder-only paths: hand-built streams
# ---------------------------------------------------------------------------


def test_lz77_backward_reference():
    """Literal pixel then a length-3 copy at distance 1 -> 4 identical
    pixels. Length prefix code 2 => value 3; distance prefix code 1 =>
    dist_code 2 => 2D map entry (1,0) => distance 1."""
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 0)                        # no transforms
    bw.write(1, 0)                        # no color cache
    bw.write(1, 0)                        # no meta prefix
    g, r, b, a, d = _codes_for(bw, [
        (280, [42, 256 + 2]), (256, [10]), (256, [20]), (256, [255]),
        (40, [1]),
    ])
    _emit(bw, g, 42)                      # literal: g then r,b,a
    _emit(bw, r, 10)
    _emit(bw, b, 20)
    _emit(bw, a, 255)
    _emit(bw, g, 256 + 2)                 # length symbol
    _emit(bw, d, 1)                       # distance symbol
    out = W.decode_vp8l(bw.bytes())
    assert out.shape == (1, 4, 3)
    assert np.array_equal(out, np.tile([10, 42, 20], (1, 4, 1)))


def test_color_cache():
    """Literal then a color-cache hit reproduces the same pixel."""
    px = (255 << 24) | (1 << 16) | (2 << 8) | 3
    cache_bits = 4
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 0)                        # no transforms
    bw.write(1, 1)                        # color cache present
    bw.write(4, cache_bits)
    bw.write(1, 0)                        # no meta prefix
    nsym = 256 + 24 + (1 << cache_bits)
    g, r, b, a, d = _codes_for(bw, [
        (nsym, [2, 280 + idx]), (256, [1]), (256, [3]), (256, [255]),
        (40, []),
    ])
    _emit(bw, g, 2)
    _emit(bw, r, 1)
    _emit(bw, b, 3)
    _emit(bw, a, 255)
    _emit(bw, g, 280 + idx)               # cache hit
    out = W.decode_vp8l(bw.bytes())
    assert np.array_equal(out, np.tile([1, 2, 3], (1, 2, 1)))


def _subimage(bw, pixels, main=False):
    """Write an entropy-coded (sub)image: cache bit, meta bit (main image
    only), codes, literals."""
    bw.write(1, 0)                        # no color cache
    if main:
        bw.write(1, 0)                    # no meta prefix codes
    used_g = sorted({p[2] for p in pixels})
    used_r = sorted({p[1] for p in pixels})
    used_b = sorted({p[3] for p in pixels})
    used_a = sorted({p[0] for p in pixels})
    g, r, b, a, d = _codes_for(bw, [
        (280, used_g), (256, used_r), (256, used_b), (256, used_a),
        (40, []),
    ])
    for (pa, pr, pg, pb) in pixels:
        _emit(bw, g, pg)
        _emit(bw, r, pr)
        _emit(bw, b, pb)
        _emit(bw, a, pa)


def test_color_indexing_packed_real():
    bw = W._BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 1)                        # transform present
    bw.write(2, 3)                        # color indexing
    bw.write(8, 3)                        # n_colors - 1
    # palette subimage (4x1), delta-coded (a,r,g,b):
    # C0=(255,10,20,30), then +(0,1,2,3) each step
    _subimage(bw, [(255, 10, 20, 30), (0, 1, 2, 3), (0, 1, 2, 3),
                   (0, 1, 2, 3)])
    bw.write(1, 0)                        # main image: no more transforms
    bw.write(1, 0)                        # no color cache
    bw.write(1, 0)                        # no meta prefix
    # packed width 1: indices [0,1,2,3] LSB-first, 2 bits each -> 0xE4
    g, r, b, a, d = _codes_for(bw, [
        (280, [0xE4]), (256, [0]), (256, [0]), (256, [0]), (40, []),
    ])
    _emit(bw, g, 0xE4)
    out = W.decode_vp8l(bw.bytes())
    exp = np.array([[[10, 20, 30], [11, 22, 33], [12, 24, 36],
                     [13, 26, 39]]], np.uint8)
    assert np.array_equal(out, exp)


def test_predictor_transform():
    """One 4x4 block, mode 2 (Top). Residuals of (a0,r1,g1,b1) accumulate
    down the prediction chain; (0,0) predicts opaque black."""
    bw = W._BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)                        # transform present
    bw.write(2, 0)                        # predictor
    bw.write(3, 0)                        # size_bits = 2 (4x4 blocks)
    _subimage(bw, [(0, 0, 2, 0)])         # 1x1 predictor image: mode 2
    bw.write(1, 0)                        # no more transforms
    _subimage(bw, [(0, 1, 1, 1)] * 4, main=True)  # main: residuals (a,r,g,b)
    out = W.decode_vp8l(bw.bytes())
    exp = np.array([[[1, 1, 1], [2, 2, 2]],
                    [[2, 2, 2], [3, 3, 3]]], np.uint8)
    assert np.array_equal(out, exp)


def test_color_transform():
    """green_to_red=2 (blue channel of the element): red' + (2*g >> 5)."""
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)                        # transform present
    bw.write(2, 1)                        # color transform
    bw.write(3, 0)                        # size_bits = 2
    _subimage(bw, [(0, 0, 0, 2)])         # element: g2r=2 in blue channel
    bw.write(1, 0)                        # no more transforms
    _subimage(bw, [(255, 10, 64, 5)] * 2, main=True)
    out = W.decode_vp8l(bw.bytes())
    # delta = (int8)2 * (int8)64 >> 5 = 4 -> red = 14
    assert np.array_equal(out, np.tile([14, 64, 5], (1, 2, 1)))


def test_subtract_green_via_roundtrip():
    # encoder always applies subtract-green; structured colors pin it
    a = np.zeros((8, 8, 3), np.uint8)
    a[:, :, 0] = 200
    a[:, :, 1] = 100
    a[:, :, 2] = 50
    assert np.array_equal(W.decode_webp(W.encode_webp(a)), a)


# ---------------------------------------------------------------------------
# hostile input
# ---------------------------------------------------------------------------


def test_lossy_vp8_rejected():
    import struct

    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        W.decode_webp(buf)


def test_oversized_dims_capped():
    bw = W._BitWriter()
    _header(bw, 1 << 14, 1 << 14)         # 16k x 16k claim
    with pytest.raises(ValueError, match="max_pixels"):
        W.decode_vp8l(bw.bytes() + b"\x00" * 64)


def test_corruption_fuzz():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    data = W.encode_webp(a)

    def on_alarm(sig, frm):
        raise AssertionError("decoder hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(1)
        for _ in range(200):
            b = bytearray(data)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                W.decode_webp(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_decode_image_webp_and_auto(spark):
    from rasterframes_spark.pipeline.multimodal import decode_image
    from rasterframes_spark.sources.png import encode_png

    rng = np.random.default_rng(5)
    img_w = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    img_p = rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
    rows = [(1, bytearray(W.encode_webp(img_w))),
            (2, bytearray(encode_png(img_p))),
            (3, bytearray(b"garbage-payload"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           decode_image(df, decode="auto").collect()}
    assert set(out) == {1, 2}             # garbage row dropped
    got = np.frombuffer(out[1]["pixels"], np.uint8).reshape(9, 11, 3)
    assert np.array_equal(got, img_w)
    webp_only = decode_image(df, decode="webp").collect()
    assert [r["media_id"] for r in webp_only] == [1]
