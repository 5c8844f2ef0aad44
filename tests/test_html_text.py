"""HTML → text extraction (sources/html_text.py + pipeline operator).

Real OS-image HTML documents are the external fixtures; the strongest
check is cross-format: /usr/share/doc ships the shared-mime-info spec as
BOTH HTML and PDF, so two independent extractors over two real
toolchains' renderings of one source document must agree on content.
"""
from __future__ import annotations

import os

import pytest

from rasterframes_spark.sources.html_text import (
    extract_main_text, html_metadata, html_to_text)

MIME_HTML = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.html"  # dir of chunked pages
MIME_PDF = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
USERS = "/usr/share/doc/base-passwd/users-and-groups.html"


def test_entities_blocks_and_dropped_subtrees():
    h = ("<html><head><title> My   Page </title><style>p{}</style></head>"
         "<body><h1>A &amp; B</h1><p>one<br>two</p>"
         "<script>document.write('<p>fake</p>')</script>"
         "<!-- comment text --><pre>  keep   ws collapsed </pre></body>")
    t = html_to_text(h)
    assert t == "A & B\none\ntwo\nkeep ws collapsed"
    m = html_metadata(h)
    assert m["title"] == "My Page"


def test_main_content_prunes_boilerplate():
    h = ("<body><nav><a>Home</a><a>About</a></nav>"
         "<header>Site header text</header>"
         "<article><p>The real article body with many words.</p>"
         "<div><a>next</a> <a>prev</a> <a>index</a></div></article>"
         "<footer>copyright footer</footer></body>")
    main = extract_main_text(h)
    assert main == "The real article body with many words."
    full = html_to_text(h)
    assert "Home" in full and "copyright footer" in full


def test_malformed_html_is_tolerated():
    # unclosed tags, stray brackets, bad nesting — parser must not raise
    h = "<p>one<p>two<b>bold<i>both</b></i><div>three < four</div"
    t = html_to_text(h)
    assert "one" in t and "two" in t and "three" in t


def test_meta_lang_links():
    h = ('<html lang="de"><head>'
         '<meta property="og:description" content="og desc"></head>'
         '<body><p><a href=x>l1</a> <a href=y>l2</a> text</p></body>')
    m = html_metadata(h)
    assert m["lang"] == "de" and m["description"] == "og desc"
    assert m["n_links"] == 2


@pytest.mark.skipif(not os.path.exists(USERS), reason="OS doc not present")
def test_real_debian_document():
    html = open(USERS, "rb").read().decode("utf-8", "replace")
    text = html_to_text(html)
    assert "users and groups" in text.lower()
    m = html_metadata(html)
    assert m["title"] and m["n_chars"] > 1000


@pytest.mark.skipif(not (os.path.exists(MIME_HTML)
                         and os.path.exists(MIME_PDF)),
                    reason="OS docs not present")
def test_cross_format_html_vs_pdf_same_document():
    """The same spec ships as real-toolchain HTML and PDF: both
    extractors must recover the same content. Checked as shared
    phrases plus vocabulary overlap — a systematic extraction bug on
    either side collapses the overlap."""
    from rasterframes_spark.sources.pdf import pdf_extract_text

    import glob

    html_text = "\n".join(
        html_to_text(open(f, "rb").read().decode("utf-8", "replace"))
        for f in sorted(glob.glob(os.path.join(MIME_HTML, "*.html"))))
    pdf_text = "\n".join(pdf_extract_text(open(MIME_PDF, "rb").read()))
    for phrase in ("Shared MIME-info Database", "freedesktop.org",
                   "MIME types"):
        assert phrase in html_text and phrase in pdf_text, phrase

    def vocab(t):
        import re as _re

        return {w.lower() for w in _re.findall(r"[A-Za-z]{4,}", t)}

    hv, pv = vocab(html_text), vocab(pdf_text)
    jacc = len(hv & pv) / len(hv | pv)
    assert jacc > 0.55, jacc


def test_operator_over_spark(spark):
    from rasterframes_spark.pipeline.multimodal import extract_html_text
    from rasterframes_spark.pipeline.text import token_count

    h1 = ('<html lang="en"><head><title>T1</title></head><body>'
          "<nav><a>x</a></nav><p>five words of body text.</p></body>")
    rows = [(1, bytearray(h1.encode())), (2, None)]
    if os.path.exists(USERS):
        rows.append((3, bytearray(open(USERS, "rb").read())))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in extract_html_text(df).collect()}
    assert 2 not in out
    assert out[1].title == "T1" and out[1].lang == "en"
    assert out[1].text == "five words of body text."
    if os.path.exists(USERS):
        assert "users" in out[3].text.lower()
    # flows into the text operators
    n = extract_html_text(df).where("media_id = 1") \
        .select(token_count("text").alias("n")).collect()
    assert n[0].n == 5


def test_unclosed_anchor_does_not_eat_the_page():
    """Real-web HTML leaves anchors unclosed; browsers auto-close them.
    The link-density rule must not classify the whole remainder of the
    page as anchor text (found by review)."""
    h = ("<body><p><a href='/'>home<p>"
         "The actual article text with plenty of words to keep.</p>"
         "<p>And a second real paragraph follows here.</p></body>")
    main = extract_main_text(h)
    assert "actual article text" in main
    assert "second real paragraph" in main


def test_br_separated_nav_links_still_prune():
    """<br> is inline-legal inside <a>: a br-separated link menu stays
    anchor text and the link-density rule prunes it (review)."""
    h = ("<body><div><a href=x>Home<br>About<br>Contact</a></div>"
         "<p>The genuine article body with plenty of words.</p></body>")
    main = extract_main_text(h)
    assert main == "The genuine article body with plenty of words."
