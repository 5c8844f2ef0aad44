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
    full = L.train_char_lm(docs, order=2)
    capped = L.train_char_lm(docs, order=2, top_grams=20)
    assert len(capped["grams"]) == 20
    assert set(capped["grams"]) <= set(full["grams"])
    # the cap keeps the most frequent grams
    kept_min = min(capped["grams"].values())
    dropped = {g: n for g, n in full["grams"].items()
               if g not in capped["grams"]}
    assert all(n <= kept_min for n in dropped.values())
