"""Random-access byte sources with range reads.

The reference realizes lazy RasterRefs by reading only the bytes of the
chunks a window needs (``ref/RasterRef.scala:49-64`` over GeoTrellis
RangeReaders — file seeks locally, HTTP ``Range`` requests for COGs,
and S3/HDFS/WASB readers for object stores,
``ref/RFRasterSource.scala:146-158``).  This module is the engine's
equivalent: a :class:`RangeSource` fetches block-aligned byte ranges on
demand with a small LRU block cache, so at 100 TB of COGs an executor
moves ~tile bytes per window instead of whole objects.

Transports (r14 — VERDICT r13 #1, the object-store posture):

- ``file://`` / bare paths — seek+read.
- ``http(s)://`` — ``Range: bytes=a-b`` requests.
- ``s3://`` / ``s3a://`` — HTTP range GETs against the bucket endpoint
  (virtual-hosted ``https://{bucket}.s3.{region}.amazonaws.com/{key}``,
  or path-style against ``AWS_ENDPOINT_URL_S3`` / ``AWS_ENDPOINT_URL``
  for S3-compatible stores).  Requests are anonymous unless the
  standard AWS env credentials (``AWS_ACCESS_KEY_ID`` /
  ``AWS_SECRET_ACCESS_KEY`` [/ ``AWS_SESSION_TOKEN``]) are present, in
  which case they carry a SigV4 ``Authorization`` header computed by
  the pure-stdlib signer below (algorithm per the public AWS SigV4
  specification; pinned against the published ``get-vanilla`` test
  vector in ``tests/test_object_store.py``).
- ``hdfs://host[:port]/path`` — the public WebHDFS REST API
  (``/webhdfs/v1{path}?op=OPEN&offset=&length=``; size via
  ``op=GETFILESTATUS``).  Port defaults to 9870 (the Hadoop 3 NameNode
  HTTP port); ``urlopen`` follows the NameNode's 307 redirect to the
  serving DataNode.
- custom schemes — :func:`register_scheme` installs an opener
  returning any object with ``size()`` and ``get(start, end)``.

Remote fetches retry transient failures (HTTP 429/5xx, timeouts,
connection resets, truncated bodies) with bounded exponential backoff
and full jitter; permanent failures (4xx other than 429) raise
immediately and unchanged.  ``bytes_fetched`` / ``requests`` / the
``trace_file`` I/O-accounting hook count each logical fetch exactly
once, on success — a retried range neither double-counts nor traces
its failed attempts (``retries`` counts those separately).
"""

from __future__ import annotations

import os
from collections import OrderedDict

__all__ = ["RangeSource", "open_source", "meta_view", "register_scheme"]

_BLOCK = 256 * 1024
_MAX_BLOCKS = 64  # 16 MiB cache per source

# bounded exponential backoff for transient remote failures
_RETRIES = int(os.environ.get("RASTERFRAMES_IO_RETRIES", "4"))
_BACKOFF_BASE = float(os.environ.get("RASTERFRAMES_IO_BACKOFF", "0.25"))
# per-request socket timeout: a hung object store must surface as a
# retryable socket.timeout, never stall an executor task forever
_TIMEOUT = float(os.environ.get("RASTERFRAMES_IO_TIMEOUT", "60"))
_BACKOFF_CAP = 4.0
_TRANSIENT_HTTP = frozenset({429, 500, 502, 503, 504})

# user-installable transports: scheme -> opener(uri) -> object with
# .size() -> int and .get(start, end) -> bytes   (end exclusive)
_SCHEME_OPENERS: dict = {}


class ShortReadError(OSError):
    """A remote transport returned a body of the wrong length — a
    connection-close-delimited truncation urllib cannot detect, a
    DataNode clamping a WebHDFS length, or a server ignoring Range and
    replying 200 with the whole object.  Classified TRANSIENT so the
    fetch retries (truncations usually are); a server that is
    persistently wrong exhausts the bounded budget and the error
    propagates with the lengths in the message."""


def register_scheme(scheme: str, opener) -> None:
    """Install a custom transport for ``scheme://`` URIs.

    ``opener(uri)`` must return an object exposing ``size() -> int``
    and ``get(start, end) -> bytes`` (end exclusive).  Fetches made
    through it get the same retry/backoff armor as the built-in remote
    transports.  This is the injectable fetch hook for stores this
    pure-stdlib module does not speak natively (reference parity:
    GeoTrellis RangeReader SPI, ``RFRasterSource.scala:146-158``)."""
    _SCHEME_OPENERS[scheme.lower().rstrip(":/")] = opener


def _is_transient(exc: BaseException) -> bool:
    """Errors worth retrying: throttles, server hiccups, flaky pipes."""
    import http.client
    import socket
    from urllib.error import HTTPError, URLError

    if isinstance(exc, HTTPError):
        return exc.code in _TRANSIENT_HTTP
    if isinstance(exc, URLError):
        return _is_transient(exc.reason) if isinstance(
            exc.reason, BaseException) else True
    return isinstance(
        exc, (socket.timeout, TimeoutError, ConnectionError,
              http.client.IncompleteRead, http.client.RemoteDisconnected,
              BrokenPipeError, ShortReadError))


def _retrying(fn, what: str, counter=None):
    """Run ``fn`` with bounded exponential backoff + full jitter on
    transient failures.  Permanent failures propagate unchanged (the
    existing contract error of each read path); transient ones that
    outlive the budget propagate too, after ``_RETRIES`` extra tries."""
    import random
    import time

    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classified below
            if attempt >= _RETRIES or not _is_transient(e):
                raise
            delay = min(_BACKOFF_CAP, _BACKOFF_BASE * (2 ** attempt))
            time.sleep(delay * random.random())  # full jitter
            attempt += 1
            if counter is not None:
                counter.retries += 1


# ---------------------------------------------------------------- SigV4
def _sigv4_headers(method: str, url: str, region: str, service: str,
                   access_key: str, secret_key: str,
                   token: str | None = None, amzdate: str | None = None,
                   extra_headers: dict | None = None,
                   content_sha_header: bool = True) -> dict:
    """AWS Signature Version 4 headers for a bodyless request.

    Pure-stdlib implementation of the public SigV4 algorithm (canonical
    request -> string-to-sign -> HMAC key chain -> Authorization), as
    specified in the AWS General Reference.  Only what range GET/HEAD
    needs: empty payload, no pre-encoded query values beyond RFC 3986.
    Verified against the published ``get-vanilla`` suite vector in
    ``tests/test_object_store.py::test_sigv4_known_vector``."""
    import hashlib
    import hmac
    import time
    from urllib.parse import quote, urlsplit

    parts = urlsplit(url)
    host = parts.netloc
    if amzdate is None:
        amzdate = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    datestamp = amzdate[:8]
    payload_hash = hashlib.sha256(b"").hexdigest()

    # S3 canonical URIs use the URI-encoded path AS SENT, single-encoded
    # (the SigV4 spec's S3 exception to the double-encode rule).  The
    # urlsplit path is already RFC 3986-encoded by the caller
    # (`_s3_endpoint` quotes the key once) — re-quoting here would
    # double-encode every %XX and mis-sign any key containing a space,
    # '+', '=' or non-ASCII character (r14 review finding, repro'd:
    # /my%20file signed as /my%2520file -> 403 SignatureDoesNotMatch).
    canonical_uri = parts.path or "/"
    q = []
    if parts.query:
        for kv in parts.query.split("&"):
            k, _, v = kv.partition("=")
            q.append((quote(k, safe="-_.~"), quote(v, safe="-_.~")))
    canonical_query = "&".join(f"{k}={v}" for k, v in sorted(q))

    hdrs = {"host": host, "x-amz-date": amzdate}
    if content_sha_header:
        # S3 requires the payload hash as a signed header; the generic
        # SigV4 test vectors (``get-vanilla``) omit it — the flag lets
        # the pinned-vector test drive this exact code path.
        hdrs["x-amz-content-sha256"] = payload_hash
    if token:
        hdrs["x-amz-security-token"] = token
    for k, v in (extra_headers or {}).items():
        hdrs[k.lower()] = str(v).strip()
    signed = ";".join(sorted(hdrs))
    canonical_headers = "".join(f"{k}:{hdrs[k]}\n" for k in sorted(hdrs))
    canonical_request = "\n".join([
        method, canonical_uri, canonical_query, canonical_headers,
        signed, payload_hash])

    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amzdate, scope,
        hashlib.sha256(canonical_request.encode()).hexdigest()])

    def _hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _hm(("AWS4" + secret_key).encode(), datestamp)
    k = _hm(_hm(_hm(k, region), service), "aws4_request")
    sig = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()

    out = dict(hdrs)
    out.pop("host")  # urllib sets Host itself; it is still signed
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return out


def _s3_endpoint(uri: str) -> tuple[str, str, str]:
    """Resolve s3://bucket/key to (http_url, region, service)."""
    rest = uri.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    if not bucket or not key:
        raise ValueError(f"rangeio: malformed S3 uri {uri!r} "
                         "(want s3://bucket/key)")
    region = os.environ.get("AWS_REGION") \
        or os.environ.get("AWS_DEFAULT_REGION") or "us-east-1"
    ep = os.environ.get("AWS_ENDPOINT_URL_S3") \
        or os.environ.get("AWS_ENDPOINT_URL")
    from urllib.parse import quote
    key_enc = quote(key, safe="/-_.~")
    if ep:  # path-style for custom/S3-compatible endpoints
        return f"{ep.rstrip('/')}/{bucket}/{key_enc}", region, "s3"
    return (f"https://{bucket}.s3.{region}.amazonaws.com/{key_enc}",
            region, "s3")


def _head_size(url: str, headers: dict) -> int:
    """HEAD the object; a missing/garbage Content-Length is a contract
    ValueError (server responses are untrusted input)."""
    from urllib.request import Request, urlopen

    req = Request(url, method="HEAD", headers=headers)
    with urlopen(req, timeout=_TIMEOUT) as r:  # noqa: S310 — user catalog URI
        cl = r.headers.get("Content-Length")
    if cl is None or not cl.strip().isdigit():
        raise ValueError(f"rangeio: no usable Content-Length from "
                         f"{url!r} (got {cl!r})")
    return int(cl)


def _range_get(url: str, headers: dict) -> bytes:
    from urllib.request import Request, urlopen

    req = Request(url, headers=headers)
    with urlopen(req, timeout=_TIMEOUT) as r:  # noqa: S310
        return r.read()


class _S3Transport:
    """Anonymous or SigV4-signed HTTP range reads for s3:// objects."""

    def __init__(self, uri: str):
        self.url, self.region, self.service = _s3_endpoint(uri)

    def _headers(self, method: str, extra: dict | None = None) -> dict:
        ak = os.environ.get("AWS_ACCESS_KEY_ID")
        sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
        if ak and sk:
            return _sigv4_headers(
                method, self.url, self.region, self.service, ak, sk,
                token=os.environ.get("AWS_SESSION_TOKEN"),
                extra_headers=extra)
        return dict(extra or {})

    def size(self) -> int:
        return _head_size(self.url, self._headers("HEAD"))

    def get(self, start: int, end: int) -> bytes:
        rng = {"Range": f"bytes={start}-{end - 1}"}
        return _range_get(self.url, self._headers("GET", rng))


class _WebHdfsTransport:
    """hdfs:// range reads via the public WebHDFS REST API."""

    def __init__(self, uri: str):
        from urllib.parse import quote, urlsplit

        parts = urlsplit(uri)
        if not parts.netloc or not parts.path:
            raise ValueError(f"rangeio: malformed HDFS uri {uri!r} "
                             "(want hdfs://host[:port]/path)")
        # urlsplit handles IPv6 literals; a bare ":" test would read
        # "[::1]" as already carrying a port (r14 review finding)
        try:
            port = parts.port
        except ValueError as e:
            raise ValueError(
                f"rangeio: malformed HDFS uri {uri!r}: {e}") from e
        host = parts.netloc if port is not None else \
            parts.netloc + ":9870"
        self.base = (f"http://{host}/webhdfs/v1"
                     f"{quote(parts.path, safe='/-_.~')}")

    def size(self) -> int:
        import json
        from urllib.request import urlopen

        with urlopen(self.base + "?op=GETFILESTATUS",
                     timeout=_TIMEOUT) as r:  # noqa: S310
            body = r.read()
        # server responses are untrusted input (r13 fuzz lesson:
        # dict-shaped payloads are parsers too) — malformed JSON or a
        # missing/garbage field is a contract ValueError, never a
        # KeyError/TypeError out of a read task
        try:
            return int(json.loads(body)["FileStatus"]["length"])
        except (KeyError, TypeError, ValueError) as e:
            raise ValueError(
                f"webhdfs: malformed GETFILESTATUS response from "
                f"{self.base!r}: {e}") from e

    def get(self, start: int, end: int) -> bytes:
        from urllib.request import urlopen

        url = (f"{self.base}?op=OPEN&offset={start}"
               f"&length={end - start}")
        with urlopen(url, timeout=_TIMEOUT) as r:  # noqa: S310 — follows the 307 redirect
            return r.read()


class _HttpTransport:
    """Plain http(s) range reads (COG posture)."""

    def __init__(self, uri: str):
        self.url = uri

    def size(self) -> int:
        return _head_size(self.url, {})

    def get(self, start: int, end: int) -> bytes:
        return _range_get(self.url,
                          {"Range": f"bytes={start}-{end - 1}"})


def _open_transport(uri: str):
    """None for local paths, a transport object for remote schemes."""
    scheme = uri.split("://", 1)[0].lower() if "://" in uri else ""
    if scheme in _SCHEME_OPENERS:
        return _SCHEME_OPENERS[scheme](uri)
    if scheme in ("http", "https"):
        return _HttpTransport(uri)
    if scheme in ("s3", "s3a", "s3n"):
        return _S3Transport(uri)
    if scheme == "hdfs":
        return _WebHdfsTransport(uri)
    return None


class RangeSource:
    """Seekable byte source over file://, http(s)://, s3://(+s3a/s3n),
    hdfs:// (WebHDFS) URIs, or any :func:`register_scheme` transport.

    Supports ``read_range(offset, length)`` (the protocol the GeoTIFF
    decoder consumes) via block-aligned fetches: file seek+read
    locally, ranged HTTP remotely, with bounded retry/backoff on
    transient remote failures.  ``bytes_fetched`` counts actual
    successful I/O for tests/observability; ``retries`` counts backoff
    re-attempts.
    """

    def __init__(self, uri: str, block_size: int = _BLOCK):
        self.uri = str(uri)
        self.block = int(block_size)
        self.bytes_fetched = 0
        self.requests = 0
        self.retries = 0
        # optional I/O accounting: when set to a path, every actual fetch
        # appends one `uri\tstart\tend` line (O_APPEND, atomic for short
        # lines).  Works across executor worker processes on a shared FS
        # — the hook tests use to ASSERT the laziness/I/O-pruning
        # invariant (lazy refs that are never realized fetch zero window
        # bytes), not just trust it.
        self.trace_file: str | None = None
        self._blocks: OrderedDict[int, bytes] = OrderedDict()
        self._size: int | None = None
        self._remote = _open_transport(self.uri)
        self._path = self.uri[7:] if self.uri.startswith("file://") else self.uri

    # -- low-level I/O --
    def size(self) -> int:
        if self._size is None:
            if self._remote is not None:
                self._size = int(_retrying(
                    self._remote.size, f"size({self.uri})", counter=self))
            else:
                self._size = os.path.getsize(self._path)
        return self._size

    def _fetch(self, start: int, end: int) -> bytes:
        """Read [start, end) from the backing store.  Remote reads get
        retry/backoff armor; accounting (bytes/requests/trace) records
        each logical fetch once, after it succeeds."""
        want = end - start
        if self._remote is not None:
            def _checked_get():
                d = self._remote.get(start, end)
                # never cache a wrong-length body: a silently-truncated
                # block would corrupt every later read_range slice
                # (r14 review finding)
                if len(d) != want:
                    raise ShortReadError(
                        f"rangeio: {self.uri} returned {len(d)} bytes "
                        f"for range [{start}, {end})")
                return d

            data = _retrying(_checked_get, f"read({self.uri})",
                             counter=self)
        else:
            with open(self._path, "rb") as f:
                f.seek(start)
                data = f.read(want)
            if len(data) != want:
                raise ValueError(
                    f"rangeio: {self._path} truncated — {len(data)} "
                    f"bytes for range [{start}, {end})")
        self.bytes_fetched += end - start
        self.requests += 1
        if self.trace_file:
            with open(self.trace_file, "a") as tf:
                tf.write(f"{self.uri}\t{start}\t{end}\n")
        return data

    # -- public protocol --
    def read_range(self, offset: int, length: int) -> bytes:
        if length <= 0:
            return b""
        end = min(offset + length, self.size())
        if offset >= end:
            return b""
        b0, b1 = offset // self.block, (end - 1) // self.block
        parts = []
        for bi in range(b0, b1 + 1):
            blk = self._blocks.get(bi)
            if blk is None:
                s = bi * self.block
                e = min(s + self.block, self.size())
                blk = self._fetch(s, e)
                self._blocks[bi] = blk
                if len(self._blocks) > _MAX_BLOCKS:
                    self._blocks.popitem(last=False)
            else:
                self._blocks.move_to_end(bi)
            parts.append(blk)
        buf = parts[0] if len(parts) == 1 else b"".join(parts)
        rel = offset - b0 * self.block
        return buf[rel: rel + (end - offset)]


def open_source(uri: str) -> RangeSource:
    return RangeSource(uri)


def meta_view(src, block_size: int = 1 << 14):
    """Small-block view of a block-cached source for METADATA walks
    (the GRIB readers established the pattern): format headers are a
    few hundred bytes each, so a 256 KiB-block source charges ~1,000x
    the bytes actually needed per header cluster.  Re-wrapping the same
    uri at 16 KiB blocks keeps the FETCH COUNT identical (one per
    header cluster) while shrinking bytes ~16x — payload reads stay on
    the caller's big-block source, where large blocks help.  Sources
    without a uri/block (in-memory wrappers) return unchanged."""
    uri = getattr(src, "uri", None)
    blk = getattr(src, "block", None)
    if uri is None or blk is None or blk <= block_size:
        return src
    s = RangeSource(uri, block_size=block_size)
    s.trace_file = getattr(src, "trace_file", None)
    return s
