"""DOCX/EPUB extraction + the unified extract_document_text dispatch."""
from __future__ import annotations

import io
import zipfile

import pytest

from rasterframes_spark.sources.office import (
    read_docx_text, read_epub_text, sniff_document_format, write_docx,
    write_epub)


def make_docx(paragraphs):
    return write_docx(paragraphs)


def make_epub(chapters, with_spine=True):
    if not with_spine:
        # spine-less archive: chapters only, no container/OPF
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("mimetype", "application/epub+zip")
            for i, html in enumerate(chapters):
                z.writestr(f"OEBPS/ch{i}.xhtml", html)
        return buf.getvalue()
    # spine deliberately reversed: reading order must follow it
    return write_epub(chapters, spine_order=range(len(chapters) - 1, -1, -1))


def test_docx_paragraphs_tabs_breaks():
    b = make_docx([["First para ", "joined runs."],
                   ["col1", "\t", "col2"],
                   ["line a", "\n", "line b"]])
    assert read_docx_text(b) == \
        "First para joined runs.\ncol1\tcol2\nline a\nline b"
    assert sniff_document_format(b) == "docx"


def test_epub_spine_order_and_html_pass():
    chapters = [
        "<html><body><h1>One</h1><p>first chapter text.</p></body></html>",
        "<html><body><p>second &amp; final.</p></body></html>"]
    b = make_epub(chapters)
    text = read_epub_text(b)
    # spine is reversed in the fixture: chapter 2 must come first
    assert text.index("second & final.") < text.index("first chapter text.")
    assert "One" in text
    assert sniff_document_format(b) == "epub"


def test_epub_fallback_without_spine():
    b = make_epub(["<html><body><p>only chapter.</p></body></html>"],
                  with_spine=False)
    assert "only chapter." in read_epub_text(b)


def test_malformed_raise():
    for bad in (b"PK\x03\x04junk", b"", b"PK"):
        with pytest.raises(ValueError):
            read_docx_text(bad)
    # zip without word/document.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.txt", "x")
    with pytest.raises(ValueError):
        read_docx_text(buf.getvalue())
    with pytest.raises(ValueError):
        read_epub_text(buf.getvalue())


def test_sniffer():
    assert sniff_document_format(b"%PDF-1.4\n") == "pdf"
    assert sniff_document_format(b"<!DOCTYPE html><html>") == "html"
    assert sniff_document_format(b"plain old words") == "text"
    assert sniff_document_format(b"\x00\x01\x02\xff") is None


def test_unified_dispatch(spark):
    from rasterframes_spark.pipeline.multimodal import extract_document_text
    from rasterframes_spark.sources.pdf import write_pdf

    rows = [
        (1, bytearray(write_pdf(["pdf body text here."]))),
        (2, bytearray(make_docx([["docx body text here."]]))),
        (3, bytearray(make_epub(
            ["<html><body><p>epub body text here.</p></body></html>"]))),
        (4, bytearray(b"<html><body><article><p>html body text here."
                      b"</p></article></body></html>")),
        (5, bytearray("plain text body here.".encode())),
        (6, bytearray(b"\x00\xff\x00\xff binary junk")),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in extract_document_text(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].format == "pdf" and "pdf body text" in out[1].text
    assert out[2].format == "docx" and out[2].text == "docx body text here."
    assert out[3].format == "epub" and "epub body text" in out[3].text
    assert out[4].format == "html" and out[4].text == "html body text here."
    assert out[5].format == "text"


def test_sniff_multibyte_straddling_probe_cut():
    """A UTF-8 char split across the 4096-byte sniff probe must still
    classify as text (review)."""
    b = (b"x" * 4095 + "é".encode() + b" more plain words after")
    assert len(b) > 4096 and b[4095:4097] == "é".encode()
    assert sniff_document_format(b) == "text"
    # a short doc genuinely ending mid-sequence stays binary
    assert sniff_document_format(b"ok " + "é".encode()[:1]) is None


def test_sniff_text_mentioning_html_tags_stays_text():
    assert sniff_document_format(
        b"use the <p> tag to open a paragraph in html") == "text"
    assert sniff_document_format(
        b"some prose <p>then real markup</p> follows") == "html"


def test_epub_unresolvable_spine_falls_back():
    """OPF parses but itemrefs match nothing: archive-order fallback,
    not a dropped document (review)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr("OEBPS/ch0.xhtml",
                   "<html><body><p>orphan chapter text.</p></body></html>")
        z.writestr("META-INF/container.xml",
                   '<container><rootfiles><rootfile '
                   'full-path="OEBPS/content.opf"/>'
                   "</rootfiles></container>")
        z.writestr("OEBPS/content.opf",
                   '<package xmlns="http://www.idpf.org/2007/opf">'
                   '<manifest><item id="c0" href="ch0.xhtml" '
                   'media-type="application/xhtml+xml"/></manifest>'
                   '<spine><itemref idref="NO_SUCH_ID"/></spine>'
                   "</package>")
    assert "orphan chapter text." in read_epub_text(buf.getvalue())


MAN_LS = "/usr/share/man/man1/ls.1.gz"


@pytest.mark.skipif(not __import__("os").path.exists(MAN_LS),
                    reason="man pages not present")
def test_man_page_real_fixtures():
    """Real groff/help2man-produced pages: section headers resolve,
    font escapes and dashes render, comments drop."""
    import glob
    import os

    from rasterframes_spark.sources.office import read_man_text

    t = read_man_text(open(MAN_LS, "rb").read())
    assert "list directory contents" in t
    assert "NAME" in t and "SYNOPSIS" in t and "DESCRIPTION" in t
    assert "--almost-all" in t          # \fB\-\-almost\-all\fR rendered
    assert "\\f" not in t and ".SH" not in t and ".TH" not in t
    # a broad sweep: 30 real pages must extract non-trivially and never
    # leak troff requests
    pages = sorted(glob.glob("/usr/share/man/man1/*.1.gz"))[:30]
    assert len(pages) >= 10
    substantive = 0
    for p in pages:
        try:
            txt = read_man_text(open(p, "rb").read())
        except ValueError:
            continue   # .so redirection stubs raise by contract
        assert ".TH" not in txt and "\\fB" not in txt, p
        if len(txt) > 200:
            substantive += 1
    # extraction must be non-trivial, not just troff-free
    assert substantive >= 10, substantive


def test_man_malformed_and_plain_text_raise():
    from rasterframes_spark.sources.office import read_man_text

    with pytest.raises(ValueError):
        read_man_text(b"\x1f\x8b broken gzip")
    with pytest.raises(ValueError):
        read_man_text(b"just plain prose with no requests at all")


def test_man_troff_corner_cases():
    """Findings from review: block bodies, mid-line comments, string
    registers, long-form fonts, multi-quoted args, bullet idiom,
    continuations and literal backslashes."""
    from rasterframes_spark.sources.office import read_man_text

    t = read_man_text(
        b".ig\nIGNORED DRAFT\n..\n"
        b".de XX\nmacro body\n..\n"
        b".SH NAME\n"
        b"some text \\\" hidden note\n"
        b"quote \\*(lqword\\*(rq dag \\(dg end\n"
        b"word \\f[B]bold\\f[R] end\n"
        b".BI \"foo\" \"bar\"\n"
        b".IP \\(bu 2\n"
        b"item text\n"
        b"broken\\\njoin\n"
        b"path C:\\e here\n")
    assert "IGNORED DRAFT" not in t and "macro body" not in t
    assert "some text" in t and "hidden note" not in t and '\\"' not in t
    assert "\u201cword\u201d" in t and "\\*(" not in t
    assert "word bold end" in t and "\\f" not in t
    assert "foo bar" in t and '"' not in t.replace("\u201c", "").replace(
        "\u201d", "")
    assert "•\nitem text" in t and "• 2" not in t
    assert "brokenjoin" in t
    assert "path C:\\ here" in t


def test_man_so_stub_raises():
    from rasterframes_spark.sources.office import read_man_text

    with pytest.raises(ValueError, match="redirection"):
        read_man_text(b".so man1/ls.1\n")
