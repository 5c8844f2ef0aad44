"""WARC (Web ARChive, ISO 28500) reader/writer — the Common Crawl
container format, completing the web-ingest chain:

    read_warc (this module) -> extract_html_text -> c4_clean /
    gopher_quality_filter -> dedup -> tokenize

A WARC file is a sequence of records: a header block of CRLF-terminated
``Name: value`` lines starting with ``WARC/1.x``, a blank line, then
``Content-Length`` payload bytes, then CRLF CRLF. Crawl WARCs are
usually *member-gzipped* — each record its own gzip member, members
concatenated — so a reader must iterate gzip members, not decompress
once. Both plain and member-gzip forms are handled; the writer emits
either.

Scale note: a gzip-member WARC cannot be split mid-file without an
external index, so the distributed unit is ONE FILE PER TASK (Common
Crawl ships ~1 GB files, sized for exactly this). ``read_warc`` uses
Spark's binaryFile source + ``mapInPandas``; for bigger-than-memory
files, point the glob at the crawl's already-file-sharded layout.

Malformed input raises ValueError (mutation-fuzz discipline shared with
every codec in sources/).
"""
from __future__ import annotations

import zlib

from .inflate import MAX_DECOMPRESSED_BYTES, decompress_bounded, \
    inflate_bounded

__all__ = ["iter_warc_records", "split_http_response", "write_warc",
           "read_warc"]

_MAX_HEADER = 1 << 20       # a header block beyond 1 MiB is corrupt
_MAX_MEMBERS = 1 << 22


def _gzip_members(data: bytes, cap: int = MAX_DECOMPRESSED_BYTES):
    """Yield decompressed gzip members of a multi-member stream.

    Each member inflates incrementally against ``cap`` — a gzip-bomb
    record raises ValueError instead of exhausting executor memory."""
    mv = memoryview(data)
    pos = 0
    n = len(data)
    count = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = inflate_bounded(d, mv[pos:], cap, "warc: gzip member")
        except zlib.error as e:
            raise ValueError(f"warc: bad gzip member ({e})") from None
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("warc: empty gzip member")
        pos += consumed
        count += 1
        if count > _MAX_MEMBERS:
            raise ValueError("warc: gzip member count exceeds sanity cap")


def _parse_record(buf: bytes, pos: int):
    """One record at pos -> (headers dict, payload, next_pos)."""
    end = buf.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
    if end < 0:
        raise ValueError("warc: record header block not terminated")
    head = buf[pos:end]
    lines = head.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError("warc: record does not start with WARC/ version")
    headers: dict[str, str] = {"__version__":
                               lines[0].decode("latin1").strip()}
    for ln in lines[1:]:
        if b":" not in ln:
            raise ValueError("warc: malformed header line")
        k, v = ln.split(b":", 1)
        headers[k.decode("latin1").strip().lower()] = \
            v.decode("latin1").strip()
    try:
        clen = int(headers.get("content-length", ""))
    except ValueError:
        raise ValueError("warc: missing/bad Content-Length") from None
    body_start = end + 4
    if clen < 0 or body_start + clen > len(buf):
        raise ValueError("warc: payload overruns record")
    payload = buf[body_start:body_start + clen]
    nxt = body_start + clen
    # record terminator: CRLF CRLF (tolerate a missing one at EOF)
    if buf[nxt:nxt + 4] == b"\r\n\r\n":
        nxt += 4
    return headers, payload, nxt


def iter_warc_records(data: bytes):
    """WARC bytes (plain or member-gzip) -> yields (headers, payload).

    Header keys are lower-cased; the WARC version line is under
    ``__version__``. Payload is the raw record block (for ``response``
    records: the full HTTP response — use ``split_http_response``)."""
    if data[:2] == b"\x1f\x8b":
        for member in _gzip_members(data):
            pos = 0
            while pos < len(member):
                h, p, pos = _parse_record(member, pos)
                yield h, p
        return
    if not data.startswith(b"WARC/"):
        raise ValueError("warc: neither gzip nor a WARC/ header")
    pos = 0
    while pos < len(data):
        h, p, pos = _parse_record(data, pos)
        yield h, p


def split_http_response(payload: bytes):
    """HTTP response bytes -> (status int, headers dict, body bytes).

    Handles the one transfer quirk crawls preserve: chunked
    Transfer-Encoding is de-chunked. (Content-Encoding gzip/deflate
    bodies are decompressed; unknown codings return the raw body.)"""
    end = payload.find(b"\r\n\r\n")
    if end < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError("warc: payload is not an HTTP response")
    lines = payload[:end].split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError("warc: bad HTTP status line")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            headers[k.decode("latin1").strip().lower()] = \
                v.decode("latin1").strip()
    body = payload[end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        out = bytearray()
        pos = 0
        while True:
            le = body.find(b"\r\n", pos)
            if le < 0:
                raise ValueError("warc: bad chunked body")
            try:
                sz = int(body[pos:le].split(b";")[0], 16)
            except ValueError:
                raise ValueError("warc: bad chunk size") from None
            if sz == 0:
                break
            out += body[le + 2:le + 2 + sz]
            pos = le + 2 + sz + 2
            if pos > len(body):
                raise ValueError("warc: chunk overruns body")
        body = bytes(out)
    enc = headers.get("content-encoding", "").lower()
    # Bounded inflation throughout: a body that decompresses past the
    # cap raises ValueError (dropped per-record by records_to_rows);
    # zlib.error still means "mislabeled body, keep raw" (crawl reality).
    if enc in ("gzip", "x-gzip"):
        try:
            body = decompress_bounded(body, 47, what="warc: http body")
        except zlib.error:
            pass   # crawls contain mislabeled bodies; keep raw
    elif enc == "deflate":
        try:
            body = decompress_bounded(body, -15, what="warc: http body")
        except zlib.error:
            try:
                body = decompress_bounded(body, 15, what="warc: http body")
            except zlib.error:
                pass
    return status, headers, body


def write_warc(records, gzip_members: bool = True) -> bytes:
    """[(headers dict, payload bytes), ...] -> WARC bytes. Each headers
    dict needs at least WARC-Type; Content-Length is computed. With
    ``gzip_members`` each record is its own gzip member (the crawl
    convention that keeps files seekable-by-index)."""
    out = bytearray()
    for headers, payload in records:
        rec = bytearray(b"WARC/1.0\r\n")
        hdrs = dict(headers)
        hdrs["Content-Length"] = str(len(payload))
        for k, v in hdrs.items():
            if k == "__version__":
                continue
            rec += f"{k}: {v}\r\n".encode("latin1")
        rec += b"\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


def records_to_rows(path: str, data: bytes, want: tuple,
                    tolerant: bool = False):
    """Shared record→row kernel for the batch and streaming readers:
    yields (file, url, warc_type, date, http_status, content_type,
    payload) tuples. ``tolerant=True`` salvages every complete record
    before a truncation/corruption point instead of raising — the live-
    crawl posture where a half-written file may be checkpointed as
    consumed by the file source (writers should still write-then-rename
    so finished files are never half-read)."""
    it = iter_warc_records(data)
    while True:
        try:
            h, p = next(it)
        except StopIteration:
            return
        except ValueError:
            if tolerant:
                return   # keep what parsed before the bad tail
            raise
        wt = h.get("warc-type", "")
        if wt not in want:
            continue
        status, ctype, body = None, None, p
        if wt == "response" and p.startswith(b"HTTP/"):
            try:
                status, hh, body = split_http_response(p)
                ctype = hh.get("content-type")
            except ValueError:
                continue
        yield (path, h.get("warc-target-uri"), wt, h.get("warc-date"),
               status, ctype, body)


def read_warc(spark, paths, kinds: tuple = ("response",)) -> "DataFrame":
    """WARC file glob -> DataFrame(file, url, warc_type, date,
    http_status, content_type, payload): the Common Crawl ingest source.

    One WARC file per task (binaryFile source; member-gzip files are not
    mid-file splittable — crawls ship ~1 GB files for exactly this).
    ``kinds`` filters record types ('response', 'request', 'metadata',
    'warcinfo', 'conversion'); response records are HTTP-split so
    ``payload`` is the de-chunked, de-gzipped body, ready for
    ``extract_html_text``. Unparseable records are dropped (web-ingest
    contract), unparseable FILES raise."""
    import pandas as pd

    want = tuple(kinds)

    def run(batches):
        for pdf in batches:
            rows = []
            for path, data in zip(pdf["path"], pdf["content"]):
                rows.extend(records_to_rows(path, bytes(data), want))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "file", "url", "warc_type", "date", "http_status",
                    "content_type", "payload"])

    src = (spark.read.format("binaryFile").load(paths)
           .select("path", "content"))
    # binaryFile packs small files together (128 MB splits, 4 MB
    # open-cost) — a small crawl's whole parse chain then runs as ONE
    # task. Files are the parallelism unit here (member-gzip is not
    # mid-file splittable), so when packing collapsed the scan below
    # one-file-per-task, fan back out before the parse. The partition
    # probe is driver-only (scan-rooted plan, no job), and the
    # repartition only ever fires when the files were small enough to
    # pack — crawl-scale ~1 GB files already scan one-per-task and
    # skip both the probe's branch and the shuffle.
    try:
        nfiles = len(src.inputFiles())
        target = min(nfiles, spark.sparkContext.defaultParallelism)
        if target > 1 and src.rdd.getNumPartitions() < target:
            src = src.repartition(target)
    except Exception:  # noqa: BLE001 — fan-out is best-effort
        pass
    return src.mapInPandas(run, schema=(
        "file string, url string, warc_type string, date string, "
        "http_status int, content_type string, payload binary"))
