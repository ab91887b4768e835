"""Streaming read-side tests: flate.Reader, gzip.Reader, zlib.Reader and
gzhttp incremental responses.

Reference roles: flate.NewReader (flate/inflate.go read-side),
gzip.Reader (gzip/gunzip.go:75), zlib.Reader (zlib/reader.go:51),
gzhttp streaming writes (gzhttp/compress.go:565).
"""

import gzip as stdgzip
import io
import zlib as stdzlib

import numpy as np
import pytest

from compress_tpu import gzip as tgzip
from compress_tpu import gzhttp
from compress_tpu import zlib as tzlib
from compress_tpu.flate.inflate import Reader as FlateReader


def _mixed_data(n=300_000, seed=0):
    rng = np.random.default_rng(seed)
    return bytes(rng.integers(0, 256, n // 2, np.uint8)) + b"hello world " * (n // 24)


@pytest.mark.parametrize("chunk", [1, 7, 4096, 1 << 20])
def test_flate_reader_incremental(chunk):
    data = _mixed_data()
    comp = stdzlib.compress(data, 6)[2:-4]  # raw deflate
    r = FlateReader(io.BytesIO(comp))
    out = bytearray()
    while True:
        c = r.read(chunk)
        if not c:
            break
        out += c
    assert bytes(out) == data


def test_flate_reader_dictionary():
    dictionary = b"the quick brown fox jumps over the lazy dog" * 10
    data = dictionary[100:300] + b" and more text referencing the dictionary"
    co = stdzlib.compressobj(6, stdzlib.DEFLATED, -15, zdict=dictionary)
    comp = co.compress(data) + co.flush()
    r = FlateReader(io.BytesIO(comp), dictionary=dictionary)
    assert r.read(-1) == data


def test_flate_reader_unused_tail():
    data = b"payload " * 1000
    comp = stdzlib.compress(data)[2:-4]
    blob = comp + b"TRAILER-BYTES"
    src = io.BytesIO(blob)
    r = FlateReader(src)
    assert r.read(-1) == data
    # over-read bytes plus the source remainder must be exactly the trailer
    assert r.unused_tail + src.read() == b"TRAILER-BYTES"


def test_gzip_reader_multistream_and_header():
    data = _mixed_data()
    buf = io.BytesIO()
    w = tgzip.Writer(buf, level=5,
                     header=tgzip.Header(name="a.txt", comment="first",
                                         extra=b"xx", mtime=123456))
    w.write(data[:150_000])
    w.close()
    buf.write(stdgzip.compress(data[150_000:]))
    r = tgzip.Reader(io.BytesIO(buf.getvalue()))
    assert r.header.name == "a.txt"
    assert r.header.comment == "first"
    assert r.header.mtime == 123456
    out = bytearray()
    for piece in r:
        out += piece
    assert bytes(out) == data


def test_gzip_reader_single_member_stops():
    a, b = b"first member " * 500, b"second member " * 500
    blob = stdgzip.compress(a) + stdgzip.compress(b)
    r = tgzip.Reader(io.BytesIO(blob), multistream=False)
    assert r.read(-1) == a


def test_gzip_reader_crc_mismatch():
    blob = bytearray(stdgzip.compress(b"check me " * 100))
    blob[-5] ^= 0xFF  # corrupt stored CRC
    r = tgzip.Reader(io.BytesIO(bytes(blob)))
    with pytest.raises(tgzip.GzipError):
        r.read(-1)


def test_gzip_reader_truncated():
    blob = stdgzip.compress(b"truncate me " * 200)
    with pytest.raises(Exception):
        tgzip.Reader(io.BytesIO(blob[:5]))


def test_zlib_reader_roundtrip_and_adler():
    data = _mixed_data(seed=1)
    r = tzlib.Reader(io.BytesIO(stdzlib.compress(data, 7)))
    out = bytearray()
    while True:
        c = r.read(33333)
        if not c:
            break
        out += c
    assert bytes(out) == data

    blob = bytearray(stdzlib.compress(b"adler check " * 300))
    blob[-1] ^= 0x01
    with pytest.raises(tzlib.ZlibError):
        tzlib.Reader(io.BytesIO(bytes(blob))).read(-1)


def test_zlib_reader_dictionary():
    dictionary = b"common json keys: id name value items count" * 8
    data = b'{"id": 1, "name": "x", "items": []}' * 50
    co = stdzlib.compressobj(6, stdzlib.DEFLATED, 15, zdict=dictionary)
    comp = co.compress(data) + co.flush()
    r = tzlib.Reader(io.BytesIO(comp), dictionary=dictionary)
    assert r.read(-1) == data
    with pytest.raises(tzlib.ZlibError):
        tzlib.Reader(io.BytesIO(comp))  # FDICT without a dictionary


def test_zlib_reader_matches_writer():
    data = _mixed_data(seed=2)
    buf = io.BytesIO()
    w = tzlib.Writer(buf, level=4)
    w.write(data)
    w.close()
    assert tzlib.Reader(io.BytesIO(buf.getvalue())).read(-1) == data


# -- gzhttp streaming --------------------------------------------------------


def _environ(accept="gzip"):
    return {"HTTP_ACCEPT_ENCODING": accept, "wsgi.input": io.BytesIO(b"")}


def test_gzhttp_streams_chunks_lazily():
    """Chunks must reach the client before the app generator is
    exhausted (the r3 middleware buffered the whole body first)."""
    progress = []

    def app(environ, start_response):
        start_response("200 OK", [("Content-Type", "text/plain")])

        def body():
            for i in range(8):
                progress.append(i)
                yield (b"chunk %d " % i) * 600
        return body()

    mw = gzhttp.gzip_handler(app, min_size=10)
    out = {}

    def sr(status, headers, exc_info=None):
        out["headers"] = dict((k.lower(), v) for k, v in headers)

    it = iter(mw(_environ(), sr))
    first = next(it)
    assert first  # some compressed bytes arrived...
    assert len(progress) < 8  # ...before the app finished producing
    assert out["headers"]["content-encoding"] == "gzip"
    assert "content-length" not in out["headers"]
    rest = b"".join(it)
    want = b"".join((b"chunk %d " % i) * 600 for i in range(8))
    assert stdgzip.decompress(first + rest) == want


def test_gzhttp_streaming_zstd():
    from compress_tpu import zstd as tzstd

    def app(environ, start_response):
        start_response("200 OK", [("Content-Type", "text/plain")])
        return (b"zstd stream piece " * 300 for _ in range(5))

    mw = gzhttp.gzip_handler(app, min_size=10, enable_zstd=True)
    out = {}

    def sr(status, headers, exc_info=None):
        out["headers"] = dict((k.lower(), v) for k, v in headers)

    body = b"".join(mw(_environ("zstd"), sr))
    assert out["headers"]["content-encoding"] == "zstd"
    assert tzstd.decompress(body) == b"zstd stream piece " * 1500


def test_gzhttp_small_response_still_buffered():
    body = b"tiny"

    def app(environ, start_response):
        start_response("200 OK", [("Content-Type", "text/plain"),
                                  ("Content-Length", "4")])
        yield body

    mw = gzhttp.gzip_handler(app, min_size=1000)
    out = {}

    def sr(status, headers, exc_info=None):
        out["headers"] = dict((k.lower(), v) for k, v in headers)

    got = b"".join(mw(_environ(), sr))
    assert got == body
    assert "content-encoding" not in out["headers"]


def test_gzhttp_streaming_respects_content_type_filter():
    def app(environ, start_response):
        start_response("200 OK", [("Content-Type", "image/png")])
        return (b"\x89PNG....binary" * 500 for _ in range(4))

    mw = gzhttp.gzip_handler(app, min_size=10,
                             content_types=["text/"])
    out = {}

    def sr(status, headers, exc_info=None):
        out["headers"] = dict((k.lower(), v) for k, v in headers)

    got = b"".join(mw(_environ(), sr))
    assert "content-encoding" not in out["headers"]
    assert got == b"\x89PNG....binary" * 2000
