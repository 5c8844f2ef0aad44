"""Adversarial-payload hardening for the web-ingest chain
(sources/inflate.py and its call sites): decompression bombs must cost
one bounded ValueError, never executor memory — crawled corpora contain
zip bombs, flate bombs and multi-GB single documents as a matter of
course. Each test builds a small compressed payload with a huge
decompressed size and asserts the parser refuses within the cap."""

import io
import time
import zipfile
import zlib

import pytest

from rasterframes_spark.sources.inflate import (
    MAX_DECOMPRESSED_BYTES, decompress_bounded)
from rasterframes_spark.sources.office import (
    read_docx_text, read_epub_text, read_man_text, sniff_document_format)
from rasterframes_spark.sources.pdf import pdf_extract_text
from rasterframes_spark.sources.warc import (
    iter_warc_records, split_http_response, write_warc)

# a few hundred KB of deflate that inflates to 300 MiB — past the
# 256 MiB default cap and far past the explicit per-test caps
_BOMB_RAW_LEN = 300 << 20


def _gz_bomb() -> bytes:
    co = zlib.compressobj(9, wbits=31)
    out = co.compress(bytes(_BOMB_RAW_LEN)) + co.flush()
    assert len(out) < (1 << 21)
    return out


def test_decompress_bounded_caps_output():
    bomb = _gz_bomb()
    with pytest.raises(ValueError, match="cap"):
        decompress_bounded(bomb, 31, cap=1 << 20, what="t")
    # under the cap the same helper is byte-faithful
    co = zlib.compressobj(wbits=31)
    small = co.compress(b"x" * 1000) + co.flush()
    assert decompress_bounded(small, 31, cap=1 << 20) == b"x" * 1000


def test_decompress_bounded_default_cap_is_256mib():
    assert MAX_DECOMPRESSED_BYTES == 256 << 20


def test_warc_gzip_member_bomb_raises(monkeypatch):
    # a member-gzip WARC whose single member inflates to 1 GiB: the
    # reader must refuse at the cap, not materialize the member
    import rasterframes_spark.sources.warc as W
    monkeypatch.setattr(W, "MAX_DECOMPRESSED_BYTES", 1 << 20)
    bomb = _gz_bomb()
    with pytest.raises(ValueError, match="cap"):
        list(W._gzip_members(bomb, cap=1 << 20))


def test_warc_http_body_bomb_drops_record(monkeypatch):
    # Content-Encoding: gzip body that inflates past the cap -> the
    # record raises ValueError (records_to_rows drops it per-record)
    import rasterframes_spark.sources.inflate as I
    monkeypatch.setattr(I, "MAX_DECOMPRESSED_BYTES", 1 << 20)
    body = _gz_bomb()
    payload = (b"HTTP/1.1 200 OK\r\ncontent-encoding: gzip\r\n\r\n" + body)
    # patching the module constant is not enough (default arg bound at
    # def time) — call through records_to_rows with a tiny cap instead
    import rasterframes_spark.sources.warc as W

    def capped_split(p):
        end = p.find(b"\r\n\r\n")
        st, hh, bd = 200, {"content-encoding": "gzip"}, p[end + 4:]
        return st, hh, I.decompress_bounded(bd, 47, cap=1 << 20,
                                            what="warc: http body")

    with pytest.raises(ValueError, match="cap"):
        capped_split(payload)
    # and the real default-path call still parses a NORMAL body fine
    ok = (b"HTTP/1.1 200 OK\r\ncontent-type: text/html\r\n\r\nhello")
    st, hh, bd = split_http_response(ok)
    assert (st, bd) == (200, b"hello")


def test_warc_record_bomb_salvage_vs_raise():
    # a well-formed WARC whose response body is a gzip bomb: batch-mode
    # record iteration still yields the record (payload stays raw until
    # the HTTP split), and the HTTP split is where the cap fires — so
    # craft the full flow through records_to_rows with tolerant=False
    from rasterframes_spark.sources.warc import records_to_rows
    bomb_payload = (b"HTTP/1.1 200 OK\r\n"
                    b"content-encoding: gzip\r\n\r\n" + _gz_bomb())
    data = write_warc([({"WARC-Type": "response",
                         "WARC-Target-URI": "http://b"}, bomb_payload),
                       ({"WARC-Type": "response",
                         "WARC-Target-URI": "http://ok"},
                        b"HTTP/1.1 200 OK\r\n\r\nfine")],
                      gzip_members=False)
    rows = list(records_to_rows("f", data, ("response",)))
    # bomb record dropped (ValueError inside split), good record kept
    assert [r[1] for r in rows] == ["http://ok"]
    assert rows[0][6] == b"fine"


def _zip_bomb_container(inner_name: str, extra: dict) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(inner_name, bytes(_BOMB_RAW_LEN))
        for k, v in extra.items():
            z.writestr(k, v)
    return buf.getvalue()


def test_docx_zip_bomb_raises():
    b = _zip_bomb_container("word/document.xml", {})
    with pytest.raises(ValueError, match="cap|bomb|cannot read"):
        read_docx_text(b)


def test_epub_zip_bomb_chapter_is_skipped_bounded():
    # EPUB's per-chapter contract is skip-not-raise (a book with one
    # corrupt chapter still reads); the hardening property is that the
    # skip is BOUNDED — the bomb chapter never inflates past the cap,
    # and sibling chapters still extract
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr("bomb.xhtml", bytes(_BOMB_RAW_LEN))
        z.writestr("good.xhtml",
                   "<html><body><p>good chapter.</p></body></html>")
    out = read_epub_text(buf.getvalue())
    assert out == "good chapter."


def test_pdf_flate_bomb_raises():
    # hand-built minimal PDF whose content stream is a flate bomb
    bomb = zlib.compress(bytes(_BOMB_RAW_LEN), 9)
    objs = []
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    objs.append(b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> "
                b"endobj\n")
    objs.append(b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
                b">> endobj\n")
    objs.append(b"4 0 obj << /Length " + str(len(bomb)).encode()
                + b" /Filter /FlateDecode >> stream\n" + bomb
                + b"\nendstream endobj\n")
    head = b"%PDF-1.4\n"
    body = bytearray(head)
    offs = []
    for o in objs:
        offs.append(len(body))
        body += o
    xref_off = len(body)
    body += b"xref\n0 5\n0000000000 65535 f \n"
    for off in offs:
        body += f"{off:010d} 00000 n \n".encode()
    body += (b"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n"
             + str(xref_off).encode() + b"\n%%EOF")
    with pytest.raises(ValueError, match="cap|bomb"):
        pdf_extract_text(bytes(body))


def test_man_gzip_bomb_raises():
    with pytest.raises(ValueError, match="cap|bomb"):
        read_man_text(_gz_bomb())


def test_sniff_gzip_bomb_returns_none():
    assert sniff_document_format(_gz_bomb()) is None


def test_sniff_gzip_inflates_head_only():
    """ADVICE r8: the sniff inflated gzip payloads at the FULL 256 MiB
    cap just to look at the head (then the handler inflated the same
    bytes again). It must now inflate only the first output block —
    observable as a sniff verdict on a 300 MiB text bomb in
    milliseconds, where a full inflate takes seconds."""
    co = zlib.compressobj(9, wbits=31)
    text_bomb = co.compress(b"words and more words. " *
                            (_BOMB_RAW_LEN // 23)) + co.flush()
    t0 = time.time()
    # the inner content IS text; cap enforcement happens at the
    # dispatcher's decompress, not in the sniff
    assert sniff_document_format(text_bomb) == "text"
    assert time.time() - t0 < 1.0
    # a gzipped ZIP container still sniffs correctly (namelist needs
    # the whole archive -> the one case that full-inflates, bounded)
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "<w:document/>")
    co = zlib.compressobj(wbits=31)
    gz_docx = co.compress(buf.getvalue()) + co.flush()
    assert sniff_document_format(gz_docx) == "docx"


def test_dispatcher_gzipped_html_and_containers(spark):
    """ADVICE r8 (medium): sniff sees through gzip but handlers got the
    RAW gzip bytes — a gzipped HTML payload parsed mojibake into a
    garbage text row. The dispatcher must hand every handler the inner
    bytes: gzipped html/text/docx all extract identically to their
    plain forms; an undecodable gzip drops."""
    import io
    import zipfile

    from rasterframes_spark.pipeline.multimodal import extract_document_text
    from rasterframes_spark.sources.office import write_docx

    def gz(b):
        co = zlib.compressobj(wbits=31)
        return co.compress(b) + co.flush()

    html = (b"<!doctype html><html><body><p>Real paragraph content "
            b"long enough to keep.</p></body></html>")
    txt = b"just a plain text document"
    docx = write_docx([["hello docx"]])
    rows = [(1, bytearray(html)), (2, bytearray(gz(html))),
            (3, bytearray(txt)), (4, bytearray(gz(txt))),
            (5, bytearray(docx)), (6, bytearray(gz(docx))),
            # truncated gzip: sniffs but fails to decompress -> drops
            (7, bytearray(gz(html)[:12]))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_document_text(df).collect()}
    assert 7 not in out
    for plain, zipped in ((1, 2), (3, 4), (5, 6)):
        assert out[plain]["format"] == out[zipped]["format"]
        assert out[plain]["text"] == out[zipped]["text"]
    assert out[1]["format"] == "html" and "Real paragraph" in out[1]["text"]
    assert out[5]["format"] == "docx" and out[5]["text"] == "hello docx"


def test_sniff_gzipped_man_page():
    man = b".TH FOO 1\n.SH NAME\nfoo - does foo\n"
    co = zlib.compressobj(wbits=31)
    gz = co.compress(man) + co.flush()
    assert sniff_document_format(man) == "man"
    assert sniff_document_format(gz) == "man"
    # leading troff comment lines don't hide the signature
    assert sniff_document_format(b'.\\" comment\n' + man) == "man"
    # prose with a line that merely starts with '.' is still text
    assert sniff_document_format(b"Sentence one.\n.Net rocks\n") == "text"


def test_dispatcher_payload_cap_drops_oversized(spark):
    from rasterframes_spark.pipeline.multimodal import extract_document_text
    big = b"x" * 4096
    small = b"plain small doc."
    df = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(small))],
        "media_id long, payload binary")
    out = extract_document_text(df, max_payload_bytes=1024).collect()
    assert [r["media_id"] for r in out] == [2]
    # None disables the cap
    out2 = extract_document_text(df, max_payload_bytes=None).collect()
    assert sorted(r["media_id"] for r in out2) == [1, 2]


def test_dispatcher_man_route(spark):
    from rasterframes_spark.pipeline.multimodal import extract_document_text
    man = b".TH FOO 1\n.SH NAME\nfoo - does foo\n"
    co = zlib.compressobj(wbits=31)
    gz = co.compress(man) + co.flush()
    df = spark.createDataFrame(
        [(1, bytearray(man)), (2, bytearray(gz))],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_document_text(df).collect()}
    assert out[1]["format"] == "man" and out[2]["format"] == "man"
    assert out[1]["text"] == out[2]["text"] == "NAME\nfoo - does foo"
