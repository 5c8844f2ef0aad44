"""Char n-gram LM quality (pipeline/lm_quality.py): numpy-exact scoring
oracle, distributed-training parity, and the quality-signal sanity the
CCNet filter depends on."""

import math

import numpy as np
import pytest

from rasterframes_spark.pipeline import lm_quality as L


def _py_train(texts, order, alpha):
    grams, ctxs, chars = {}, {}, set()
    for t in texts:
        for i in range(len(t)):
            chars.add(t[i])
        for i in range(len(t) - order + 1):
            g = t[i:i + order]
            grams[g] = grams.get(g, 0) + 1
        for i in range(len(t) - order + 2):
            c = t[i:i + order - 1]
            if len(c) == order - 1:
                ctxs[c] = ctxs.get(c, 0) + 1
    return grams, ctxs, len(chars)


def _py_score(t, grams, ctxs, v, order, alpha):
    m = len(t) - order + 1
    tot = 0.0
    for i in range(m):
        g = t[i:i + order]
        p = (grams.get(g, 0) + alpha) / (ctxs.get(g[:-1], 0) + alpha * v)
        tot -= math.log2(p)
    return tot / m


def test_training_counts_match_reference(spark):
    texts = ["abcabc", "the cat sat", "aaa", "b", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    model = L.train_char_lm(df, order=2, alpha=0.5)
    grams, ctxs, v = _py_train(texts, 2, 0.5)
    assert model["grams"] == grams
    assert model["contexts"] == ctxs
    assert model["vocab_size"] == v


def test_scoring_matches_reference(spark):
    texts = ["the quick brown fox", "the the the", "zzzqqq", "ab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    model = L.train_char_lm(df, order=3, alpha=0.1)
    out = {r["id"]: r["lm_bits_per_char"] for r in
           L.lm_bits_per_char(df, model).collect()}
    grams, ctxs, v = _py_train(texts, 3, 0.1)
    for i, t in enumerate(texts):
        if len(t) < 3:
            assert out[i] is None
        else:
            assert out[i] == pytest.approx(
                _py_score(t, grams, ctxs, v, 3, 0.1), rel=1e-12)


def test_quality_signal_orders_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    model = L.train_char_lm(docs, order=3, alpha=0.1)
    natural = docs.limit(1)
    gibberish = spark.createDataFrame(
        [(999999, "xq7#zj9@kw2%vb8&mn4!")], "doc_id long, text string")
    both = L.lm_bits_per_char(natural.unionByName(gibberish), model)
    rows = {r["doc_id"]: r["lm_bits_per_char"] for r in both.collect()}
    nat = [v for k, v in rows.items() if k != 999999][0]
    assert rows[999999] > nat + 2.0   # gibberish is far more surprising


def test_top_grams_cap(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("text").limit(50)
    full = L.train_char_lm(docs, order=2, top_grams=None)
    capped = L.train_char_lm(docs, order=2, top_grams=20)
    assert len(capped["grams"]) == 20
    assert set(capped["grams"]) <= set(full["grams"])
    # the cap keeps the most frequent grams
    kept_min = min(capped["grams"].values())
    dropped = {g: n for g, n in full["grams"].items()
               if g not in capped["grams"]}
    assert all(n <= kept_min for n in dropped.values())


def test_default_cap_matches_exact_when_not_truncating(spark):
    # The bounded default (2**20) must be value-identical to uncapped
    # training whenever the corpus has fewer distinct grams than the cap.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(80)
    assert L.DEFAULT_TOP_GRAMS == 1 << 20
    exact = L.train_char_lm(docs, order=2, top_grams=None)
    dflt = L.train_char_lm(docs, order=2)          # default cap path
    assert len(exact["grams"]) < L.DEFAULT_TOP_GRAMS
    assert dflt == exact
    s_exact = {r["doc_id"]: r["lm_bits_per_char"] for r in
               L.lm_bits_per_char(docs, exact).collect()}
    s_dflt = {r["doc_id"]: r["lm_bits_per_char"] for r in
              L.lm_bits_per_char(docs, dflt).collect()}
    assert s_exact == s_dflt


def test_truncating_cap_keeps_probabilities_below_one(spark):
    # When the cap genuinely truncates, every kept gram's context count
    # must still be present (derived from the kept-gram set), so the
    # smoothed P(c|ctx) <= 1 and bits/char never go negative.  Before
    # the fix, grams and contexts were top-K'd INDEPENDENTLY, and a kept
    # gram whose context fell outside the context top-K scored p > 1.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(200)
    m = L.train_char_lm(docs, order=3, top_grams=25)
    for g, n in m["grams"].items():
        ctx = g[:-1]
        assert ctx in m["contexts"], f"kept gram {g!r} lost its context"
        assert m["contexts"][ctx] >= n
    scored = L.lm_bits_per_char(
        docs.where("length(text) >= 3"), m).collect()
    assert scored and all(r["lm_bits_per_char"] is not None
                          and r["lm_bits_per_char"] >= 0.0 for r in scored)
