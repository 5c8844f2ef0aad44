"""Property-based tests (hypothesis) for the tile codec and geometry core —
randomized robustness beyond the reference's fixed-fixture strategy."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rasterframes_spark.tile import CELL_TYPES, CellType, Tile
from rasterframes_spark.geom import core as G
from rasterframes_spark.geom import sfc


@st.composite
def tile_arrays(draw):
    ct_name = draw(st.sampled_from(CELL_TYPES))
    ct = CellType.parse(ct_name)
    rows = draw(st.integers(1, 12))
    cols = draw(st.integers(1, 12))
    if ct.dtype.kind == "f":
        vals = draw(st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=rows * cols,
            max_size=rows * cols))
        arr = np.array(vals, dtype=ct.dtype).reshape(rows, cols)
    else:
        info = np.iinfo(ct.dtype)
        vals = draw(st.lists(st.integers(int(info.min), int(info.max)),
                             min_size=rows * cols, max_size=rows * cols))
        arr = np.array(vals, dtype=ct.dtype).reshape(rows, cols)
    return ct, arr


@given(tile_arrays())
@settings(max_examples=150, deadline=None)
def test_codec_roundtrip_property(ct_arr):
    ct, arr = ct_arr
    t = Tile(arr, ct)
    row = t.to_row()
    t2 = Tile.from_parts(row["cell_type"], row["cols"], row["rows"], row["cells"])
    # round trip preserves mask and data-cell values exactly
    assert np.array_equal(np.ma.getmaskarray(t.masked()), np.ma.getmaskarray(t2.masked()))
    assert np.ma.allequal(t.masked(), t2.masked())


@given(tile_arrays(), st.integers(-1000, 1000))
@settings(max_examples=80, deadline=None)
def test_add_subtract_inverse_property(ct_arr, k):
    ct, arr = ct_arr
    t = Tile(arr, ct)
    a = t.masked().astype("float64")
    back = (a + k) - k
    if ct.dtype.kind == "f":
        # float absorption makes exact inverse impossible near denormals
        assert np.ma.allclose(back, a, atol=max(abs(k), 1) * 1e-12)
    else:
        assert np.ma.allequal(back, a)


@given(st.lists(st.tuples(st.floats(-179, 179), st.floats(-89, 89)),
                min_size=3, max_size=12))
@settings(max_examples=100, deadline=None)
def test_wkb_roundtrip_property(pts):
    geoms = [
        ("MultiPoint", [tuple(p) for p in pts]),
        ("LineString", [tuple(p) for p in pts]),
    ]
    for g in geoms:
        assert G.wkb_loads(G.wkb_dumps(g)) == g


@given(st.floats(-179, 179), st.floats(-89, 89),
       st.floats(0.01, 5), st.floats(0.01, 5))
@settings(max_examples=100, deadline=None)
def test_z2_ranges_cover_property(x, y, w, h):
    bbox = (x, y, min(x + w, 180), min(y + h, 90))
    ranges = sfc.z2_ranges(*bbox, max_depth=7)
    cx = (bbox[0] + bbox[2]) / 2
    cy = (bbox[1] + bbox[3]) / 2
    z = int(sfc.z2_index(np.array([cx]), np.array([cy]))[0])
    assert any(lo <= z <= hi for lo, hi in ranges)


@given(st.floats(-170, 160), st.floats(-80, 70),
       st.floats(0.1, 9), st.floats(0.1, 9))
@settings(max_examples=60, deadline=None)
def test_bbox_intersects_consistency(x, y, w, h):
    a = G.box_polygon(x, y, x + w, y + h)
    b = G.box_polygon(x + w / 2, y + h / 2, x + w / 2 + 1, y + h / 2 + 1)
    c = G.box_polygon(x + w + 5, y + h + 5, x + w + 6, y + h + 6)
    assert G.intersects(a, b)
    assert not G.intersects(a, c)
    assert G.distance(a, b) == 0.0
    assert G.area(a) > 0


@given(st.integers(1, 3), st.integers(1, 2000),
       st.sampled_from([(8, "pcm"), (16, "pcm"), (24, "pcm"), (32, "pcm"),
                        (32, "float"), (64, "float")]),
       st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(channels, n, bits_fmt, seed):
    """Any signal, any depth: decode(encode(x)) within quantization err."""
    from rasterframes_spark.pipeline.audio import decode_wav, encode_wav

    bits, fmt = bits_fmt
    rng = np.random.default_rng(seed)
    x = np.clip(rng.normal(0, 0.4, (n, channels)), -1, 1)
    a, rate = decode_wav(encode_wav(x, 22050, bits=bits, fmt=fmt))
    assert rate == 22050 and a.shape == (n, channels)
    tol = {("pcm", 8): 1 / 127, ("pcm", 16): 1 / 32767,
           ("pcm", 24): 1 / 8388607, ("pcm", 32): 1e-9,
           ("float", 32): 1e-7, ("float", 64): 0.0}[(fmt, bits)]
    assert np.allclose(a, x, atol=tol * 1.01)


@given(st.integers(1, 4), st.integers(1, 24), st.integers(1, 24),
       st.integers(1, 32), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_property(n_frames, h, w, n_colors, seed):
    """Any frame stack under 256 colors: decode(encode(f)) is exact."""
    from rasterframes_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, n_colors, (h, w))] for _ in range(n_frames)]
    dec = decode_gif(encode_gif(frames, delay_ms=50))
    assert len(dec) == n_frames
    for (d, f), orig in zip(dec, frames):
        assert d == 50 and np.array_equal(f, orig)


@given(st.integers(8, 40), st.integers(8, 40), st.integers(1, 3).map(lambda c: 1 if c == 1 else 3),
       st.sampled_from(["444", "420"]), st.integers(0, 4),
       st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_jpeg_roundtrip_property(h, w, nc, sub, ri, seed):
    """Smooth images survive encode/decode at high PSNR for every
    size/sampling/restart combination (gray forces 444)."""
    from rasterframes_spark.sources.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 70 * np.sin(xx / rng.uniform(5, 15)) \
        + 50 * np.cos(yy / rng.uniform(5, 15))
    if nc == 1:
        img = np.clip(base, 0, 255).astype(np.uint8)
    else:
        img = np.clip(np.stack([base, base / 2 + 50, 255 - base / 3], axis=-1),
                      0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub,
                                restart_interval=ri))
    ref = img if nc == 3 else img[:, :, None]
    assert d.shape == ref.shape
    err = d.astype(float) - ref.astype(float)
    psnr = 10 * np.log10(255**2 / max((err**2).mean(), 1e-9))
    assert psnr > 33


@given(st.integers(0, 2**32 - 1), st.integers(0, 400))
@settings(max_examples=60, deadline=None)
def test_codec_fuzz_valueerror_only(seed, size):
    """Arbitrary bytes into any decoder raise ValueError (or decode) —
    never an unhandled struct/zlib/iteration error. This is the contract
    the corrupt-row-drop paths in decode_image/decode_audio/
    sample_video_frames rely on."""
    from rasterframes_spark.pipeline.audio import decode_wav
    from rasterframes_spark.sources import geotiff as GT
    from rasterframes_spark.sources.gif import decode_gif
    from rasterframes_spark.sources.jpeg import decode_jpeg
    from rasterframes_spark.sources.netcdf import read_netcdf_info
    from rasterframes_spark.sources.png import decode_png

    rng = np.random.default_rng(seed)
    blob = bytes(rng.integers(0, 256, size).astype(np.uint8))
    for fn in (decode_png, decode_gif, decode_jpeg, decode_wav, GT.read_info,
               read_netcdf_info):
        try:
            fn(blob)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# scrub / repetition properties (one Spark job per example, few examples)

_WORDS = ["the", "cat", "sat", "mat", "on", "a", "dog", "ran"]
_PII = ["bob@x.io", "123-45-6789", "10.0.0.1", "4111 1111 1111 1111",
        "555-867-5309"]


@given(st.lists(st.lists(
    st.sampled_from(_WORDS + _PII), min_size=1, max_size=30),
    min_size=1, max_size=12), st.integers(0, 3))
@settings(max_examples=8, deadline=None)
def test_pii_scrub_idempotent_and_complete(spark, docs_tokens, nl_every):
    """scrub is idempotent and leaves no matchable PII behind, for any
    interleaving of prose and PII tokens (incl. newlines)."""
    import re as _re

    from pyspark.sql import functions as F
    from rasterframes_spark import pipeline as P
    from rasterframes_spark.pipeline.scrub import PII_PATTERNS

    texts = []
    for i, toks in enumerate(docs_tokens):
        sep = "\n" if nl_every and i % (nl_every + 1) == 0 else " "
        texts.append(sep.join(toks))
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    once = df.select(P.pii_scrub("text").alias("t"))
    twice = once.select(P.pii_scrub("t").alias("t"))
    a = [r["t"] for r in once.collect()]
    b = [r["t"] for r in twice.collect()]
    assert a == b  # idempotent
    for t in a:
        for _, pat, _tok in PII_PATTERNS:
            assert not _re.search(pat, t), (t, pat)


@given(st.lists(st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=40),
    min_size=1, max_size=15), st.integers(2, 3))
@settings(max_examples=8, deadline=None)
def test_repetition_metrics_match_python_oracle(spark, docs_tokens, n):
    """Engine repetition fractions == python oracle for random token
    sequences (single-line docs: engine lines == whole doc)."""
    import collections

    import pytest as _pytest

    from rasterframes_spark import pipeline as P

    texts = [" ".join(toks) for toks in docs_tokens]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"])
    out = {r["id"]: r for r in P.repetition_metrics(
        df, "text", top_ns=(n,), dup_ns=(n,)).collect()}
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
        dup_frac = ((len(grams) - len(set(grams))) / len(grams)
                    if grams else 0.0)
        assert out[i][f"dup_{n}gram_frac"] == _pytest.approx(
            dup_frac, abs=1e-6), t
        if grams:
            cnt = collections.Counter(grams)
            mx = max(cnt.values())
            g = min(x for x, k in cnt.items() if k == mx)
            exp = mx * len(g) / max(len(t), 1)
        else:
            exp = 0.0
        assert out[i][f"top_{n}gram_char_frac"] == _pytest.approx(
            exp, abs=1e-6), t


@given(st.lists(st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=40),
    min_size=1, max_size=12), st.integers(1, 6))
@settings(max_examples=8, deadline=None)
def test_shingles_and_ngrams_match_python_oracle(spark, docs_tokens, n):
    """The r9 zip_with-fold n-gram builders (shingles, _word_ngrams,
    the staged gram fingerprints) must equal a brute-force python
    reference for arbitrary token sequences and every n — guards the
    interpreted-HOF -> fold rewrite against off-by-one and short-doc
    edge cases."""
    from pyspark.sql import functions as F
    from rasterframes_spark.pipeline.dedup import (
        _gram_fingerprint_rows, shingles, token_gram_hashes)
    from rasterframes_spark.pipeline.text import _word_ngrams

    texts = [" ".join(toks) for toks in docs_tokens]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    def py_grams(t):
        toks = [w for w in t.split(" ") if w]  # _word_ngrams drops empties
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    got = {r["doc_id"]: sorted(r["g"]) for r in df.select(
        "doc_id", F.array_sort(shingles("text", n)).alias("g")).collect()}
    for i, t in enumerate(texts):
        # shingles splits on single spaces (keeps empty tokens) per its
        # historical contract — rebuild the same token rule
        toks = t.split(" ")
        exp = sorted({" ".join(toks[j:j + n])
                      for j in range(len(toks) - n + 1)}) if len(
                          toks) >= n else []
        assert got[i] == exp, (t, n)

    got2 = {r["doc_id"]: sorted(r["g"]) for r in df.select(
        "doc_id", F.array_sort(_word_ngrams("text", n)).alias("g"))
        .collect()}
    for i, t in enumerate(texts):
        assert got2[i] == sorted(py_grams(t)), (t, n)

    # staged fingerprint rows == Column-API fingerprints (same values)
    col_fp = {(r["doc_id"], r["w"]) for r in df.select(
        "doc_id", F.explode(token_gram_hashes("text", n)).alias("w"))
        .collect()}
    staged_fp = {(r["__id"], r["__w"]) for r in _gram_fingerprint_rows(
        df, "doc_id", "text", n, 1).collect()}
    assert col_fp == staged_fp


@given(st.lists(st.lists(
    st.sampled_from(_WORDS), min_size=6, max_size=40),
    min_size=1, max_size=8), st.integers(2, 4), st.integers(2, 4))
@settings(max_examples=6, deadline=None)
def test_winnowed_fingerprints_staged_equals_column(spark, docs_tokens,
                                                    n, stride):
    """Winnowed selection depends on hash ORDER, so the staged path
    must pick exactly the same fingerprints as the Column API."""
    from pyspark.sql import functions as F
    from rasterframes_spark.pipeline.dedup import (
        _gram_fingerprint_rows, token_gram_hashes)

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs_tokens)],
        ["doc_id", "text"])
    col_fp = {(r["doc_id"], r["w"]) for r in df.select(
        "doc_id", F.explode(token_gram_hashes("text", n, stride))
        .alias("w")).collect()}
    staged_fp = {(r["__id"], r["__w"]) for r in _gram_fingerprint_rows(
        df, "doc_id", "text", n, stride).collect()}
    assert col_fp == staged_fp
