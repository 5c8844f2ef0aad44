"""WARC reader/writer (sources/warc.py) — the Common Crawl ingest."""
from __future__ import annotations

import zlib

import numpy as np
import pytest

from rasterframes_spark.sources.warc import (
    iter_warc_records, read_warc, split_http_response, write_warc)


def _http(body: bytes, ctype=b"text/html", extra=b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
            + extra + b"Content-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)


def _records(n=3):
    recs = []
    for i in range(n):
        body = f"<html><body><p>page {i} content text.</p></body>".encode()
        recs.append((
            {"WARC-Type": "response",
             "WARC-Target-URI": f"https://example.org/p{i}",
             "WARC-Date": "2026-01-01T00:00:00Z",
             "WARC-Record-ID": f"<urn:uuid:{i}>"},
            _http(body)))
    recs.append(({"WARC-Type": "warcinfo"}, b"software: test\r\n"))
    return recs


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = write_warc(_records(), gzip_members=gz)
    got = list(iter_warc_records(data))
    assert len(got) == 4
    assert [h["warc-type"] for h, _ in got] == ["response"] * 3 + ["warcinfo"]
    assert got[1][0]["warc-target-uri"] == "https://example.org/p1"
    status, hh, body = split_http_response(got[2][1])
    assert status == 200 and hh["content-type"] == "text/html"
    assert b"page 2 content text" in body


def test_gzip_members_are_independent():
    """Each record must be its own gzip member (crawl convention)."""
    data = write_warc(_records(2), gzip_members=True)
    # first member alone decodes to exactly one record
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(data) + d.flush()
    assert first.startswith(b"WARC/1.0\r\n")
    assert len(list(iter_warc_records(
        data[:len(data) - len(d.unused_data)]))) == 1


def test_chunked_and_gzip_bodies():
    body = b"the real body text here"
    chunked = (b"5\r\n" + body[:5] + b"\r\n"
               + hex(len(body) - 5)[2:].encode() + b"\r\n" + body[5:]
               + b"\r\n0\r\n\r\n")
    p = _http(chunked, extra=b"Transfer-Encoding: chunked\r\n")
    assert split_http_response(p)[2] == body
    co = zlib.compressobj(wbits=31)
    gzbody = co.compress(body) + co.flush()
    p2 = _http(gzbody, extra=b"Content-Encoding: gzip\r\n")
    assert split_http_response(p2)[2] == body


def test_malformed_raise():
    good = write_warc(_records(1), gzip_members=False)
    for bad in (b"", b"NOTWARC/1.0\r\n\r\n", good[:30],
                good.replace(b"Content-Length", b"Content-Lemgth", 1)):
        with pytest.raises(ValueError):
            list(iter_warc_records(bad))
    with pytest.raises(ValueError):
        list(iter_warc_records(b"\x1f\x8b" + b"\x00" * 20))


def test_read_warc_spark_end_to_end(spark, tmp_path):
    """The full ingest chain: WARC -> read_warc -> extract_html_text ->
    token_count, distributed."""
    from pyspark.sql import functions as F

    from rasterframes_spark.pipeline.multimodal import extract_html_text
    from rasterframes_spark.pipeline.text import token_count

    for fi in range(2):
        recs = []
        for i in range(3):
            html = (f"<html lang='en'><head><title>D{fi}{i}</title></head>"
                    f"<body><nav><a>x</a></nav>"
                    f"<p>doc {fi} {i} has body words here.</p>"
                    f"</body></html>").encode()
            recs.append(({"WARC-Type": "response",
                          "WARC-Target-URI": f"https://ex.org/{fi}/{i}",
                          "WARC-Date": "2026-01-01T00:00:00Z"},
                         _http(html)))
        recs.append(({"WARC-Type": "request"}, b"GET / HTTP/1.1\r\n\r\n"))
        (tmp_path / f"crawl-{fi}.warc.gz").write_bytes(write_warc(recs))

    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6                      # requests filtered out
    assert all(r.http_status == 200 and r.warc_type == "response"
               and r.content_type == "text/html" for r in rows)
    docs = df.select(F.xxhash64("url").alias("media_id"),
                     "url", "payload")
    text = extract_html_text(docs)
    got = {r.title: r for r in text.collect()}
    assert len(got) == 6 and "D01" in got
    assert got["D11"].text == "doc 1 1 has body words here."
    n = text.select(token_count("text").alias("n")).agg(
        F.sum("n").alias("s")).collect()[0].s
    assert n == 6 * 7


def test_read_warc_fans_out_small_files(spark, tmp_path):
    """r15 (VERDICT r14 #4): binaryFile packs small files into one split
    (4 MB open-cost, 128 MB splits), serializing the whole parse chain
    onto one core. read_warc fans back out to one-file-per-task when
    packing collapsed the scan below the file count."""
    nf = 4
    for fi in range(nf):
        recs = [({"WARC-Type": "response",
                  "WARC-Target-URI": f"https://ex.org/{fi}/{i}",
                  "WARC-Date": "2026-01-01T00:00:00Z"},
                 _http(f"<html><p>doc {fi} {i}</p></html>".encode()))
                for i in range(2)]
        (tmp_path / f"crawl-{fi}.warc.gz").write_bytes(write_warc(recs))
    df = read_warc(spark, str(tmp_path))
    want = min(nf, spark.sparkContext.defaultParallelism)
    # mapInPandas preserves its input partitioning, so the fan-out is
    # visible on the reader's own frame
    assert df.rdd.getNumPartitions() == want
    assert df.count() == nf * 2


def test_read_warc_stream(spark, tmp_path):
    """Streaming crawl ingest: WARC files landing in a directory stream
    out as record rows; incremental runs over a checkpoint process only
    NEW files; the HTML extractor composes on the stream unchanged."""
    import os

    from rasterframes_spark.pipeline.multimodal import extract_html_text
    from rasterframes_spark.streaming import read_warc_stream

    src = tmp_path / "crawl"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def drop(fi, n):
        recs = []
        for i in range(n):
            html = (f"<html lang='en'><head><title>S{fi}{i}</title></head>"
                    f"<body><p>stream doc {fi} {i} body.</p></body>"
                    ).encode()
            recs.append(({"WARC-Type": "response",
                          "WARC-Target-URI": f"https://s.org/{fi}/{i}"},
                         _http(html)))
        (src / f"c{fi}.warc.gz").write_bytes(write_warc(recs))

    drop(0, 2)
    drop(1, 3)
    from pyspark.sql import functions as F

    stream = read_warc_stream(spark, str(src))
    assert stream.isStreaming
    docs = extract_html_text(
        stream.select(F.xxhash64("url").alias("media_id"), "payload"))
    q = (docs.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 5
    assert {r.title for r in got} == {"S00", "S01", "S10", "S11", "S12"}

    # incremental: only the new file's records appear
    drop(2, 1)
    q2 = (extract_html_text(
        read_warc_stream(spark, str(src)).select(
            F.xxhash64("url").alias("media_id"), "payload"))
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir).collect()
    assert len(got2) == 6
    assert "S20" in {r.title for r in got2}


def test_stream_salvages_records_before_truncation(spark, tmp_path):
    """A file with a corrupt tail yields every COMPLETE record in the
    streaming reader (the file source checkpoints it as consumed either
    way — salvage beats silent total loss); the batch reader stays
    strict (review)."""
    from rasterframes_spark.sources.warc import records_to_rows
    from rasterframes_spark.streaming import read_warc_stream

    good = write_warc(_records(3), gzip_members=True)
    truncated = good[:-10]
    # tolerant kernel: first records survive, no exception
    rows = list(records_to_rows("f", truncated, ("response",),
                                tolerant=True))
    assert 1 <= len(rows) <= 3
    with pytest.raises(ValueError):
        list(records_to_rows("f", truncated, ("response",)))

    src = tmp_path / "c"
    src.mkdir()
    (src / "t.warc.gz").write_bytes(truncated)
    out_dir = str(tmp_path / "out")
    q = (read_warc_stream(spark, str(src))
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == len(rows)


def test_hand_built_warc_container_bytes():
    """r9: raw WARC bytes written by hand (NOT via write_warc) — the
    container grammar from the spec: WARC/1.1 version line, header
    names in arbitrary case, optional whitespace after the colon,
    Content-Length counting the payload exactly, and the mandatory
    CRLF CRLF record separator."""
    body = b"HTTP/1.1 200 OK\r\ncontent-type: text/plain\r\n\r\nhello world"
    rec1 = (b"WARC/1.1\r\n"
            b"WARC-TYPE: response\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            b"WARC-Target-URI:    https://x.org/a\r\n"
            b"\r\n" + body + b"\r\n\r\n")
    rec2 = (b"WARC/1.0\r\n"
            b"warc-type: metadata\r\n"
            b"content-length: 3\r\n"
            b"\r\nabc\r\n\r\n")
    got = list(iter_warc_records(rec1 + rec2))
    assert [h["warc-type"] for h, _ in got] == ["response", "metadata"]
    assert got[0][0]["__version__"] == "WARC/1.1"
    assert got[0][0]["warc-target-uri"] == "https://x.org/a"
    status, hh, payload = split_http_response(got[0][1])
    assert (status, hh["content-type"], payload) == (
        200, "text/plain", b"hello world")
    assert got[1][1] == b"abc"
