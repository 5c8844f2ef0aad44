"""Gopher/MassiveText document-quality rules (Rae et al. 2021 Table A1)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rasterframes_spark.pipeline.text import (
    gopher_quality_filter, gopher_quality_metrics)


def _m(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_quality_metrics("text").alias("m")) \
        .collect()[0].m


def test_metrics_closed_form(spark):
    text = ("the cat and the hat sat\n"
            "• a bullet line here\n"
            "this one trails off...\n"
            "#tag plus #tag again ok")
    m = _m(spark, text)
    assert m.n_words == 20          # the bullet glyph is its own token
    # total chars = len(text without whitespace) = 72
    assert m.mean_word_len == pytest.approx(72 / 20)
    assert m.symbol_word_ratio == pytest.approx(3 / 20)  # 2 '#' + one '...'
    assert m.bullet_line_frac == pytest.approx(1 / 4)
    assert m.ellipsis_line_frac == pytest.approx(1 / 4)
    assert m.alpha_word_frac == pytest.approx(19 / 20)   # '•' has no letter
    assert m.stopword_count == 2  # 'the', 'and'


def test_alpha_and_unicode_ellipsis(spark):
    m = _m(spark, "42 7 pi and one…\nwords to keep going…")
    assert m.alpha_word_frac == pytest.approx(7 / 9)  # '42','7' non-alpha
    assert m.ellipsis_line_frac == pytest.approx(1.0)


def test_empty_doc(spark):
    m = _m(spark, "")
    assert (m.n_words, m.stopword_count) == (0, 0)
    assert m.mean_word_len == 0.0


def test_filter_rules(spark):
    good = " ".join(["the", "of", "and"] + ["word"] * 60) + "."
    docs = [
        (0, good),                                       # passes
        (1, "the of " + " ".join(["w"] * 60)),           # mean len < 3
        (2, " ".join(["word"] * 62)),                    # no stopwords
        (3, "the of " + " ".join(["word"] * 20)),        # too few words
        (4, good + " " + " ".join(["###"] * 12)),        # symbol ratio
        (5, "the of " + " ".join(["12345"] * 60)),       # alpha frac
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = [r.doc_id for r in gopher_quality_filter(df).collect()]
    assert kept == [0]


def test_metrics_col_kept(spark):
    df = spark.createDataFrame(
        [(0, "the of " + " ".join(["word"] * 60))], "doc_id long, text string")
    out = gopher_quality_filter(df, metrics_col="gq").collect()[0]
    assert out.gq.n_words == 62


def test_plan_is_scan_side(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = gopher_quality_filter(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
