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
