"""Object-store transport: s3:// / hdfs:// schemes, SigV4 signing,
and retry/backoff fault injection for RangeSource (VERDICT r13 #1).

The reference reads s3 GeoTIFFs natively and s3a/hdfs via Hadoop
(``ref/RFRasterSource.scala:146-158``); this suite pins the engine's
pure-stdlib equivalent: scheme dispatch, SigV4 against the published
AWS test vector, transient-failure retries that stay bit-exact, and
byte-accounting/io-trace preserved through retries."""

import http.server
import json
import re
import threading
import urllib.error

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark import sources as S
from rasterframes_spark.sources import geotiff as GT
from rasterframes_spark.sources import rangeio
from rasterframes_spark.sources.rangeio import (
    RangeSource, _sigv4_headers, register_scheme)


@pytest.fixture(autouse=True)
def _fast_backoff(monkeypatch):
    monkeypatch.setattr(rangeio, "_BACKOFF_BASE", 0.005)
    monkeypatch.setattr(rangeio, "_BACKOFF_CAP", 0.02)


@pytest.fixture(scope="module")
def scene_blob():
    rng = np.random.default_rng(21)
    arr = rng.integers(1, 60000, (256, 256)).astype("uint16")
    blob = GT.write_geotiff(arr, (0, 0, 256, 256), crs="EPSG:4326",
                            nodata=0, tile_size=64)
    return blob, arr


class _Store(http.server.BaseHTTPRequestHandler):
    """Range-serving store with per-path programmable faults.

    ``server.faults[path]`` = number of leading requests to 503;
    ``server.gone`` = set of paths that always 404.  Every request is
    appended to ``server.seen`` as (method, path, headers-dict)."""

    def log_message(self, *a):
        pass

    def _object(self):
        return self.server.objects.get(self.path.split("?")[0])

    def _serve(self, method):
        path = self.path.split("?")[0]
        self.server.seen.append((method, self.path, dict(self.headers)))
        if path in self.server.gone:
            self.send_error(404)
            return
        if self.server.faults.get(path, 0) > 0:
            self.server.faults[path] -= 1
            self.send_error(503)
            return
        blob = self._object()
        if blob is None:
            self.send_error(404)
            return
        m = re.match(r"bytes=(\d+)-(\d+)", self.headers.get("Range") or "")
        if m:
            a, b = int(m.group(1)), int(m.group(2))
            body = blob[a:b + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {a}-{b}/{len(blob)}")
        else:
            body = blob
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if method == "GET":
            self.wfile.write(body)

    def do_GET(self):
        self._serve("GET")

    def do_HEAD(self):
        self._serve("HEAD")


@pytest.fixture()
def store(scene_blob):
    blob, arr = scene_blob
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Store)
    srv.objects = {"/bucket/scene.tiff": blob}
    srv.faults, srv.gone, srv.seen = {}, set(), []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, blob, arr
    srv.shutdown()


def _endpoint(srv):
    return f"http://127.0.0.1:{srv.server_address[1]}"


# ------------------------------------------------------------- SigV4
def test_sigv4_known_vector():
    """The published aws-sig-v4-test-suite ``get-vanilla`` vector:
    GET / on example.amazonaws.com at 20150830T123600Z, scope
    us-east-1/service, the documented example credentials."""
    hdrs = _sigv4_headers(
        "GET", "https://example.amazonaws.com/", "us-east-1", "service",
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        amzdate="20150830T123600Z", content_sha_header=False)
    assert hdrs["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/"
        "service/aws4_request, SignedHeaders=host;x-amz-date, Signature="
        "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")


def test_sigv4_key_path_is_single_encoded():
    """r14 review: S3 canonical URIs use the URI-encoded path AS SENT
    (the SigV4 spec's S3 single-encoding rule).  The signer must NOT
    re-quote the already-encoded path — a key with a space signed
    double-encoded (%2520) 403s on real S3.  Independent check: the
    expected signature is derived here from a hand-written canonical
    request (spec literal), not by calling the signer."""
    import hashlib
    import hmac as hm

    url = "https://b.s3.us-east-1.amazonaws.com/my%20file%2Bv1.tif"
    amz = "20260101T000000Z"
    ph = hashlib.sha256(b"").hexdigest()
    canonical = "\n".join([
        "GET",
        "/my%20file%2Bv1.tif",        # single-encoded, byte-for-byte
        "",
        f"host:b.s3.us-east-1.amazonaws.com\n"
        f"x-amz-content-sha256:{ph}\nx-amz-date:{amz}\n",
        "host;x-amz-content-sha256;x-amz-date",
        ph])
    sts = "\n".join([
        "AWS4-HMAC-SHA256", amz, "20260101/us-east-1/s3/aws4_request",
        hashlib.sha256(canonical.encode()).hexdigest()])
    k = hm.new(b"AWS4SK", b"20260101", hashlib.sha256).digest()
    for step in (b"us-east-1", b"s3", b"aws4_request"):
        k = hm.new(k, step, hashlib.sha256).digest()
    want = hm.new(k, sts.encode(), hashlib.sha256).hexdigest()
    got = _sigv4_headers("GET", url, "us-east-1", "s3", "AK", "SK",
                         amzdate=amz)
    assert got["Authorization"].endswith(f"Signature={want}")


def test_sigv4_signs_range_and_token():
    """S3-mode headers: payload hash + session token are signed, and
    the Range header participates in the signature."""
    hdrs = _sigv4_headers(
        "GET", "https://b.s3.us-east-1.amazonaws.com/k", "us-east-1",
        "s3", "AK", "SK", token="TOK", amzdate="20260101T000000Z",
        extra_headers={"Range": "bytes=0-9"})
    assert "x-amz-security-token" in hdrs
    assert hdrs["x-amz-content-sha256"] == (
        # SHA256 of the empty payload — a public constant
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    assert "range;" in hdrs["Authorization"] or \
        ";range" in hdrs["Authorization"]


# ------------------------------------------------------- s3:// scheme
def test_s3_range_reads_signed(store, monkeypatch):
    srv, blob, arr = store
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", _endpoint(srv))
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIDEXAMPLE")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "secret")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "tok")
    monkeypatch.setenv("AWS_REGION", "eu-west-3")
    src = RangeSource("s3://bucket/scene.tiff", block_size=16 * 1024)
    info = GT.read_info(src)
    win = GT.read_window(src, info, 64, 64, 64, 64)
    assert np.array_equal(win, arr[64:128, 64:128])
    # windowed: a small fraction of the object moved
    assert src.bytes_fetched < len(blob) * 0.5
    # every request was path-style against the endpoint, ranged, signed
    gets = [s for s in srv.seen if s[0] == "GET"]
    assert gets and all(p.startswith("/bucket/scene.tiff")
                        for _, p, _ in srv.seen)
    for _, _, raw in gets:
        h = {k.lower(): v for k, v in raw.items()}  # urllib title-cases
        assert re.match(r"bytes=\d+-\d+", h.get("range", ""))
        auth = h.get("authorization", "")
        assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
        assert "/eu-west-3/s3/aws4_request" in auth
        assert "x-amz-security-token" in auth  # token is SIGNED
        assert h.get("x-amz-security-token") == "tok"


def test_s3_anonymous_without_creds(store, monkeypatch):
    srv, blob, arr = store
    monkeypatch.setenv("AWS_ENDPOINT_URL", _endpoint(srv))
    monkeypatch.delenv("AWS_ENDPOINT_URL_S3", raising=False)
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    # s3a:// aliases to the same transport (Hadoop-style catalogs)
    src = RangeSource("s3a://bucket/scene.tiff", block_size=16 * 1024)
    info = GT.read_info(src)
    assert (info.width, info.height) == (256, 256)
    assert all("Authorization" not in h for _, _, h in srv.seen)


def test_s3_malformed_uri():
    with pytest.raises(ValueError, match="bucket/key"):
        RangeSource("s3://bucket-only")


# ------------------------------------------------- retry fault injection
def test_transient_503s_retried_bit_exact(store, monkeypatch, tmp_path):
    """First N range requests 503 -> the read retries through and stays
    bit-exact; accounting counts each logical fetch ONCE (no trace
    lines or byte counts from failed attempts)."""
    srv, blob, arr = store
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", _endpoint(srv))
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    srv.faults["/bucket/scene.tiff"] = 3
    trace = str(tmp_path / "io_trace.tsv")
    src = RangeSource("s3://bucket/scene.tiff", block_size=16 * 1024)
    src.trace_file = trace
    info = GT.read_info(src)
    win = GT.read_window(src, info, 0, 0, 128, 128)
    assert np.array_equal(win, arr[:128, :128])
    assert src.retries >= 3
    with open(trace) as f:
        lines = f.read().splitlines()
    # one trace line per LOGICAL fetch; byte accounting matches exactly
    assert len(lines) == src.requests
    traced = sum(int(ln.split("\t")[2]) - int(ln.split("\t")[1])
                 for ln in lines)
    assert traced == src.bytes_fetched


def test_permanent_404_is_single_request(store, monkeypatch):
    srv, blob, arr = store
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", _endpoint(srv))
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    srv.gone.add("/bucket/missing.tiff")
    src = RangeSource("s3://bucket/missing.tiff")
    with pytest.raises(urllib.error.HTTPError):
        src.read_range(0, 100)
    assert src.retries == 0
    assert len(srv.seen) == 1  # no retry storm on permanent failures
    assert src.bytes_fetched == 0  # failed fetches never counted


def test_retry_budget_exhausts(store, monkeypatch):
    """A fault deeper than the retry budget still surfaces — bounded,
    not infinite, backoff."""
    srv, blob, arr = store
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", _endpoint(srv))
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    monkeypatch.setattr(rangeio, "_RETRIES", 2)
    srv.faults["/bucket/scene.tiff"] = 50
    src = RangeSource("s3://bucket/scene.tiff")
    with pytest.raises(urllib.error.HTTPError):
        src.size()
    assert len(srv.seen) == 3  # 1 + 2 retries


# --------------------------------------------------- hdfs:// (WebHDFS)
def test_hdfs_webhdfs_window_reads(scene_blob):
    blob, arr = scene_blob

    class WebHdfs(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if "op=GETFILESTATUS" in self.path:
                body = json.dumps(
                    {"FileStatus": {"length": len(blob),
                                    "type": "FILE"}}).encode()
            elif "op=OPEN" in self.path:
                q = dict(kv.split("=") for kv in
                         self.path.split("?")[1].split("&"))
                off, n = int(q.get("offset", 0)), int(q["length"])
                body = blob[off:off + n]
            else:
                self.send_error(400)
                return
            assert self.path.startswith("/webhdfs/v1/data/scene.tiff")
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), WebHdfs)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        src = RangeSource(f"hdfs://127.0.0.1:{port}/data/scene.tiff",
                          block_size=16 * 1024)
        info = GT.read_info(src)
        win = GT.read_window(src, info, 64, 0, 64, 64)
        assert np.array_equal(win, arr[0:64, 64:128])
        assert src.bytes_fetched < len(blob) * 0.5
    finally:
        srv.shutdown()


def test_hdfs_malformed_uri():
    with pytest.raises(ValueError, match="HDFS uri"):
        RangeSource("hdfs://")


def test_hung_server_times_out_and_retries(scene_blob, monkeypatch):
    """A stalled store must surface as a retryable timeout, never hang
    the executor task: first request sleeps past the socket timeout,
    the retry succeeds, bytes stay exact."""
    import time as _time

    blob, arr = scene_blob
    monkeypatch.setattr(rangeio, "_TIMEOUT", 0.5)
    stalls = {"n": 1}

    class Slow(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if stalls["n"] > 0:
                stalls["n"] -= 1
                _time.sleep(1.5)  # past the 0.5 s socket timeout
                return
            m = re.match(r"bytes=(\d+)-(\d+)",
                         self.headers.get("Range") or "")
            a, b = int(m.group(1)), int(m.group(2))
            body = blob[a:b + 1]
            self.send_response(206)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_HEAD(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Slow)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        src = RangeSource(
            f"http://127.0.0.1:{srv.server_address[1]}/scene.tiff")
        got = src.read_range(100, 64)
        assert got == blob[100:164]
        assert src.retries >= 1
    finally:
        srv.shutdown()


def test_malformed_server_responses_are_contract_errors():
    """r13 fuzz lesson applied to the transports: a WebHDFS status
    response that is valid JSON but the wrong shape, and an HTTP HEAD
    without a usable Content-Length, are contract ValueErrors — never
    KeyError/TypeError out of a read task."""

    class Bad(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b'{"RemoteException": {"message": "nope"}}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_HEAD(self):
            self.send_response(200)  # no Content-Length at all
            self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Bad)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        with pytest.raises(ValueError, match="GETFILESTATUS"):
            RangeSource(f"hdfs://127.0.0.1:{port}/x").size()
        with pytest.raises(ValueError, match="Content-Length"):
            RangeSource(f"http://127.0.0.1:{port}/x").size()
    finally:
        srv.shutdown()


def test_session_forwards_transport_env_to_executors(monkeypatch):
    """create_rf_spark_session forwards the standard AWS / transport env
    to spark.executorEnv.* so cluster executors can sign and retry;
    unset vars are not forwarded, explicit configs win."""
    import rasterframes_spark.session as S

    captured = {}

    class FakeBuilder:
        def master(self, m):
            return self

        def appName(self, a):
            return self

        def config(self, k, v):
            captured[k] = v
            return self

    monkeypatch.setattr(
        S.SparkSession, "builder", FakeBuilder().master(None))
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AK")
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", "http://ep")
    monkeypatch.delenv("AWS_SESSION_TOKEN", raising=False)

    class Stop(Exception):
        pass

    def boom(*a, **k):
        raise Stop

    FakeBuilder.getOrCreate = boom
    with pytest.raises(Stop):
        S.create_rf_spark_session(
            **{"spark.executorEnv.AWS_ACCESS_KEY_ID": "OVERRIDE"})
    assert captured["spark.executorEnv.AWS_ENDPOINT_URL_S3"] == "http://ep"
    # explicit config applied after (wins in Spark's last-set semantics)
    assert captured["spark.executorEnv.AWS_ACCESS_KEY_ID"] == "OVERRIDE"
    assert "spark.executorEnv.AWS_SESSION_TOKEN" not in captured


# ------------------------------------------------- injectable transport
def test_register_scheme_hook_with_retry(scene_blob):
    """The injectable fetch hook: a custom scheme serves from memory,
    and its transient failures ride the same retry armor."""
    blob, arr = scene_blob
    fails = {"n": 2}

    class MemTransport:
        def __init__(self, uri):
            assert uri == "memfs://bucket/scene.tiff"

        def size(self):
            return len(blob)

        def get(self, start, end):
            if fails["n"] > 0:
                fails["n"] -= 1
                raise ConnectionResetError("flaky fabric")
            return blob[start:end]

    register_scheme("memfs", MemTransport)
    try:
        src = RangeSource("memfs://bucket/scene.tiff", block_size=16 * 1024)
        info = GT.read_info(src)
        win = GT.read_window(src, info, 0, 64, 128, 64)
        assert np.array_equal(win, arr[64:128, 0:128])
        assert src.retries == 2
    finally:
        rangeio._SCHEME_OPENERS.pop("memfs", None)


# ------------------------------------- Spark-level read through faults
def test_read_raster_http_with_transient_faults(spark, store, tmp_path):
    """The distributed path: read_raster over an http:// catalog URI
    whose store 503s the first requests — executors retry through and
    the aggregate equals the local decode exactly (the 'gate through
    the http path' leg of VERDICT r13 #1)."""
    srv, blob, arr = store
    srv.faults["/bucket/scene.tiff"] = 4
    uri = f"{_endpoint(srv)}/bucket/scene.tiff"
    df = S.read_raster(spark, [uri], tile_dimensions=(128, 128))
    got = df.select(S.realize_tiles("tile_ref").alias("t")) \
        .agg(F.sum(rf.rf_tile_sum("t")).alias("s")).head()["s"]
    assert got == float(arr[arr != 0].sum())
