"""C4 cleanup (Raffel et al. 2020 §2.2): line and page filter rules."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rasterframes_spark.pipeline.text import (
    c4_clean, c4_line_filter, c4_page_keep)


PAGE_OK = "\n".join(
    ["This sentence is long enough and ends well.",
     "too short!",                                   # < 3 words
     "this line has many words but no terminal punctuation",
     "Enable javascript to continue reading this.",  # banned word
     "  A padded line with terminal punctuation works fine.  ",
     'He said "stop right there!"',                  # end quote terminal
     "Another proper sentence sits here.",
     "And one more to cross the threshold.",
     "Fifth full sentence keeps the page alive."])

# rules evaluate on the TRIMMED line, but kept lines pass through
# verbatim (the filter drops, it does not rewrite)
KEPT_OK = ["This sentence is long enough and ends well.",
           "  A padded line with terminal punctuation works fine.  ",
           'He said "stop right there!"',
           "Another proper sentence sits here.",
           "And one more to cross the threshold.",
           "Fifth full sentence keeps the page alive."]


def _df(spark, pages):
    return spark.createDataFrame(list(enumerate(pages)),
                                 "doc_id long, text string")


def test_line_rules(spark):
    out = _df(spark, [PAGE_OK]).select(
        c4_line_filter("text").alias("c")).collect()[0].c
    assert out.split("\n") == KEPT_OK


def test_trim_before_terminal_check(spark):
    page = "Trailing spaces after the period still count.   \nnope"
    out = _df(spark, [page]).select(
        c4_line_filter("text").alias("c")).collect()[0].c
    assert out == "Trailing spaces after the period still count.   "


def test_page_rules(spark):
    pages = [
        PAGE_OK,                                              # kept
        "Just one good sentence survives the line pass.",     # < 5 sentences
        PAGE_OK + "\nSadly lorem ipsum appears right here.",  # placeholder
        PAGE_OK + "\nA config { brace } sneaks into prose.",  # curly brace
    ]
    out = c4_clean(_df(spark, pages))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0}
    assert rows[0].c4_text.split("\n") == KEPT_OK


def test_custom_knobs(spark):
    page = "One two.\nOne two three."
    got = _df(spark, [page]).select(
        c4_line_filter("text", min_words=2).alias("c")).collect()[0].c
    assert got == page  # both lines pass at min_words=2
    keep = _df(spark, [page]).select(
        c4_page_keep(c4_line_filter("text", min_words=2),
                     min_sentences=2).alias("k")).collect()[0].k
    assert keep is True


def test_ban_is_case_insensitive(spark):
    page = "Please enable JavaScript to see this content."
    got = _df(spark, [page]).select(
        c4_line_filter("text").alias("c")).collect()[0].c
    assert got == ""


def test_empty_and_all_dropped(spark):
    out = c4_clean(_df(spark, ["", "no terminal here at all"]))
    assert out.count() == 0


def test_plan_is_scan_side(spark):
    """The whole cleanup is one narrow projection + filter — no
    Exchange, no Python in the plan."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = c4_clean(df)._sc._jvm and c4_clean(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


class TestMarkdownToText:
    MD = """# Big Title

Some **bold** and _italic_ and `inline code` words.

- item one
- item two
1. numbered

> a quoted line

[anchor text](https://example.org/page) and ![alt words](img.png).

```python
def real_code(): pass
```

| col1 | col2 |
|------|------|
| a    | b    |

---

[ref]: https://example.org/ref
Last plain line."""

    def test_rendering(self, spark):
        from rasterframes_spark.pipeline.text import markdown_to_text

        df = spark.createDataFrame([(self.MD,)], "text string")
        out = df.select(markdown_to_text("text").alias("t")) \
            .collect()[0].t
        assert "Big Title" in out and "#" not in out
        assert "bold" in out and "**" not in out
        assert "inline code" in out and "`" not in out
        assert "item one" in out and "- item" not in out
        assert "a quoted line" in out and "> " not in out
        assert "anchor text" in out and "https://example.org/page" not in out
        assert "alt words" in out and "img.png" not in out
        assert "def real_code(): pass" in out and "```" not in out
        assert "col1 col2" in out.replace("  ", " ") and "|" not in out
        assert "https://example.org/ref" not in out  # ref definition line
        assert "Last plain line." in out

    def test_plain_text_untouched(self, spark):
        from rasterframes_spark.pipeline.text import markdown_to_text

        plain = "Just ordinary prose. Nothing to strip here."
        df = spark.createDataFrame([(plain,)], "text string")
        assert df.select(markdown_to_text("text").alias("t")) \
            .collect()[0].t == plain

    def test_plan_no_python(self, spark):
        from rasterframes_spark.pipeline.text import markdown_to_text

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = df.select(markdown_to_text("text"))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


def test_text_op_invariants_batch(spark):
    """Randomized invariants over one batched job: c4_line_filter and
    canonicalize_url are idempotent, gopher fractions stay in [0,1],
    markdown_to_text is identity on its own output class (no markers
    left to strip twice)."""
    import random

    from pyspark.sql import functions as F

    from rasterframes_spark.pipeline.scrub import canonicalize_url
    from rasterframes_spark.pipeline.text import (
        gopher_quality_metrics, markdown_to_text)

    rng = random.Random(11)
    words = ["alpha", "beta", "the", "#tag", "x", "...", "•", "O'Neil",
             "end.", "quote\"", "mid_snake_case", "*star*", "[l](u)"]
    texts = []
    for _ in range(80):
        lines = []
        for _ in range(rng.randint(1, 6)):
            lines.append(" ".join(rng.choice(words)
                                  for _ in range(rng.randint(0, 12))))
        texts.append("\n".join(lines))
    urls = [f"HTTP://H{rng.randint(0,9)}.ORG:{rng.choice([80, 81])}"
            f"/p{rng.randint(0,99)}?b={rng.randint(0,9)}&utm_x=1#f"
            for _ in range(40)]

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(c4_line_filter("text").alias("t1"))
    twice = once.select("t1", c4_line_filter(F.col("t1")).alias("t2"))
    assert twice.where("t1 != t2").count() == 0

    m = df.select(gopher_quality_metrics("text").alias("g")).select(
        "g.*").collect()
    for r in m:
        for frac in (r.symbol_word_ratio, r.bullet_line_frac,
                     r.ellipsis_line_frac, r.alpha_word_frac):
            assert 0.0 <= frac <= 9.0 or frac != frac  # ratios bounded-ish
        assert 0.0 <= r.bullet_line_frac <= 1.0
        assert 0.0 <= r.ellipsis_line_frac <= 1.0
        assert 0.0 <= r.alpha_word_frac <= 1.0
        assert r.n_words >= 0 and 0 <= r.stopword_count <= 8

    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    c1 = udf.select(canonicalize_url("url").alias("u1"))
    c2 = c1.select("u1", canonicalize_url(F.col("u1")).alias("u2"))
    assert c2.where("u1 != u2").count() == 0

    md = df.select(markdown_to_text("text").alias("m1"))
    md2 = md.select("m1", markdown_to_text(F.col("m1")).alias("m2"))
    # markdown render is idempotent modulo whitespace normalization
    changed = md2.where(
        F.regexp_replace("m1", r"\s+", " ")
        != F.regexp_replace("m2", r"\s+", " ")).count()
    assert changed == 0
