"""PDF text extraction (sources/pdf.py + pipeline operators).

Two REAL toolchain-produced PDFs ship with the OS image (a pdfTeX
manual and a DocBook/FOP spec) — external fixtures covering xref
streams, object streams, Flate+predictors, ToUnicode CMaps and
/Differences encodings. The own writer covers the classic-xref
uncompressed path and round-trip exactness.
"""
from __future__ import annotations

import os

import pytest

from rasterframes_spark.sources.pdf import (
    pdf_extract_text, read_pdf_info, write_pdf)

TASN = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"
MIME = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"

needs_tasn = pytest.mark.skipif(not os.path.exists(TASN),
                                reason="OS doc PDF not present")
needs_mime = pytest.mark.skipif(not os.path.exists(MIME),
                                reason="OS doc PDF not present")


@needs_tasn
def test_real_pdftex_document():
    """pdfTeX output: xref stream + ObjStm + Type1 subsets with
    ToUnicode CMaps."""
    data = open(TASN, "rb").read()
    info = read_pdf_info(data)
    assert (info.version, info.n_pages) == ("1.5", 36)
    pages = pdf_extract_text(data, pages=[0, 3])
    assert "Abstract Syntax Notation One (ASN.1)" in pages[0]
    assert "Fabio Fiorina" in pages[0]
    # body page: TOC/intro content with intact punctuation
    joined = "\n".join(pdf_extract_text(data, pages=range(6)))
    for phrase in ("Introduction", "ASN.1", "libtasn1"):
        assert phrase in joined, phrase


@needs_mime
def test_real_docbook_document():
    data = open(MIME, "rb").read()
    info = read_pdf_info(data)
    assert (info.version, info.n_pages) == ("1.5", 17)
    p0 = pdf_extract_text(data, pages=[0])[0]
    assert "Shared MIME-info Database" in p0
    assert "http://www.freedesktop.org" in p0
    # /Differences fi/fl ligatures decode and normalize back to ascii
    assert "specification" in p0


def test_writer_roundtrip_exact():
    pages = ["Hello PDF world.\nSecond line here.",
             "Page two starts.\nWith (parens) and \\backslash\\ text.",
             "Symbols: #1 @2 [ok] 50% £9"]
    data = write_pdf(pages)
    assert data.startswith(b"%PDF-1.4")
    info = read_pdf_info(data)
    assert info.n_pages == 3
    got = pdf_extract_text(data)
    for want, g in zip(pages, got):
        assert g.strip() == want


def test_page_subset_and_bounds():
    data = write_pdf(["a one.", "b two.", "c three."])
    got = pdf_extract_text(data, pages=[2, 0, 99])
    assert [t.strip() for t in got] == ["c three.", "a one."]


def test_encrypted_raises():
    data = write_pdf(["secret text here."])
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 3 0 R")
    with pytest.raises(ValueError, match="encrypt"):
        pdf_extract_text(enc)


def test_not_a_pdf_raises():
    for bad in (b"", b"%PDF", b"hello world", b"%PDF-1.4\ngarbage"):
        with pytest.raises(ValueError):
            pdf_extract_text(bad)


def test_operators_over_spark(spark):
    from rasterframes_spark.pipeline.multimodal import (
        extract_pdf_text, pdf_metadata)

    own = write_pdf(["the quick brown fox jumps.", "over the lazy dog."])
    rows = [(1, bytearray(own)), (2, b"not a pdf at all")]
    if os.path.exists(MIME):
        rows.append((3, bytearray(open(MIME, "rb").read())))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r.media_id: r for r in pdf_metadata(df).collect()}
    assert meta[1].n_pages == 2 and 2 not in meta
    if os.path.exists(MIME):
        assert meta[3].n_pages == 17
    txt = extract_pdf_text(df, max_pages=2)
    got = {(r.media_id, r.page): r.text for r in txt.collect()}
    assert "quick brown fox" in got[(1, 0)]
    assert "lazy dog" in got[(1, 1)]
    if os.path.exists(MIME):
        assert "MIME" in got[(3, 0)]
        assert (3, 2) not in got  # max_pages honored


def test_extracted_text_feeds_text_pipeline(spark):
    """The whole point: PDF pages flow straight into the text operators."""
    from rasterframes_spark.pipeline.multimodal import extract_pdf_text
    from rasterframes_spark.pipeline.text import token_count

    own = write_pdf(["the quick brown fox jumps over the lazy dog."])
    df = spark.createDataFrame([(1, bytearray(own))],
                               "media_id long, payload binary")
    out = extract_pdf_text(df).select(token_count("text").alias("n")) \
        .collect()
    assert out[0].n == 9


def test_reference_cycle_raises_not_hangs():
    """'2 0 obj 2 0 R endobj' style self-reference must raise, not spin
    a Spark task forever (found by review)."""
    import signal

    data = write_pdf(["cycle test page."])
    # retarget the Pages ref (2 0 R) onto a new self-referential object:
    # replace object 2's body with an indirect ref to itself
    start = data.index(b"2 0 obj\n") + len(b"2 0 obj\n")
    end = data.index(b"\nendobj", start)
    body = b"2 0 R".ljust(end - start)
    mutated = data[:start] + body + data[start + len(body):]

    def on_alarm(sig, frm):
        raise AssertionError("resolver hung on reference cycle")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        signal.alarm(10)
        with pytest.raises(ValueError):
            pdf_extract_text(mutated)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _xref_stream_pdf(index: str) -> bytes:
    """Minimal hand-built PDF 1.5 whose cross-reference IS a stream,
    with the given /Index literal."""
    body = bytearray(b"%PDF-1.5\n")
    offs = {}

    def obj(num, payload):
        offs[num] = len(body)
        body.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")

    obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, b"<< /Type /Pages /Count 0 /Kids [] >>")
    xoff = len(body)
    # entries for objects 0..3: W=[1 2 1]
    import struct as _s

    ent = b"".join(
        _s.pack(">BHB", t, o, 0)
        for t, o in ((0, 0), (1, offs[1]), (1, offs[2]), (1, xoff)))
    body.extend(
        f"3 0 obj\n<< /Type /XRef /W [1 2 1] /Size 4 /Index {index} "
        f"/Length {len(ent)} /Root 1 0 R >>\nstream\n".encode()
        + ent + b"\nendstream\nendobj\n")
    body.extend(f"startxref\n{xoff}\n%%EOF\n".encode())
    return bytes(body)


def test_xref_stream_parses_and_odd_index_raises_valueerror():
    """The hand-built xref-STREAM document parses (0 pages); corrupting
    /Index to odd length is a clean ValueError, not IndexError
    (review)."""
    assert read_pdf_info(_xref_stream_pdf("[0 4]")).n_pages == 0
    with pytest.raises(ValueError):
        read_pdf_info(_xref_stream_pdf("[0 4 9]"))
    with pytest.raises(ValueError):
        read_pdf_info(_xref_stream_pdf("[/bogus 4]"))
