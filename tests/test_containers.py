"""snappy facade, xerial, and zip container tests."""

import io
import struct
import zipfile as stdzip

import numpy as np
import pytest

from compress_tpu import snappy
from compress_tpu import zip as tzip
from compress_tpu.snappy import xerial


def test_snappy_facade_roundtrip(corpus_file):
    data = corpus_file.read_bytes()[: 1 << 17]
    enc = snappy.encode(data)
    assert snappy.decode(enc) == data
    assert snappy.decoded_len(enc) == len(data)


def test_snappy_golden_decode():
    want = open("/root/reference/s2/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    raw = open("/root/reference/s2/testdata/Mark.Twain-Tom.Sawyer.txt.rawsnappy", "rb").read()
    assert snappy.decode(raw) == want


def test_snappy_rejects_s2_repeats():
    from compress_tpu import s2

    data = b"abcdabcdabcdabcd" * 100
    s2_blob = s2.encode(data)
    # the S2 blob may use repeat offsets which strict snappy rejects;
    # our snappy encode of the same data must decode fine
    assert snappy.decode(snappy.encode(data)) == data


def test_snappy_stream():
    data = b"streaming snappy " * 5000
    buf = io.BytesIO()
    w = snappy.writer(buf)
    w.write(data)
    w.close()
    assert buf.getvalue().startswith(b"\xff\x06\x00\x00sNaPpY")
    assert snappy.reader(io.BytesIO(buf.getvalue())).read() == data


def test_xerial_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 100, 32 * 1024, 100_000]:
        motif = rng.integers(0, 9, 53, dtype=np.uint8).tobytes()
        data = (motif * (n // len(motif) + 1))[:n]
        blob = xerial.encode(data)
        assert blob[:8] == xerial.HEADER
        assert xerial.decode(blob) == data
    # plain snappy block fallback
    assert xerial.decode(snappy.encode(b"plain block")) == b"plain block"
    with pytest.raises(xerial.MalformedError):
        xerial.decode(xerial.HEADER + b"\0" * 8 + b"\x00\x00\x00\xff")
    with pytest.raises(ValueError):
        xerial.decode_capped(xerial.encode(b"x" * 100), 10)


def test_zip_roundtrip_all_methods():
    files = {
        "a.txt": b"hello zip world " * 200,
        "dir/b.bin": bytes(range(256)) * 50,
        "empty": b"",
    }
    buf = io.BytesIO()
    w = tzip.Writer(buf)
    for name, data in files.items():
        w.create(name, data, method=tzip.DEFLATE)
    w.create("c.zst", files["a.txt"], method=tzip.ZSTD)
    w.create("d.raw", files["a.txt"], method=tzip.STORE)
    w.close()
    r = tzip.Reader(buf.getvalue())
    assert set(r.namelist()) == set(files) | {"c.zst", "d.raw"}
    for h in r.entries:
        want = files.get(h.name, files["a.txt"])
        assert r.read(h) == want


def test_zip_stdlib_interop():
    # stdlib reads our deflate/store entries
    buf = io.BytesIO()
    w = tzip.Writer(buf)
    w.create("x.txt", b"interop data " * 500, method=tzip.DEFLATE)
    w.create("y.txt", b"stored", method=tzip.STORE)
    w.close()
    z = stdzip.ZipFile(io.BytesIO(buf.getvalue()))
    assert z.read("x.txt") == b"interop data " * 500
    assert z.read("y.txt") == b"stored"
    # we read stdlib archives
    buf2 = io.BytesIO()
    with stdzip.ZipFile(buf2, "w", stdzip.ZIP_DEFLATED) as z2:
        z2.writestr("p.txt", b"stdlib produced " * 300)
        z2.writestr("q.txt", b"another")
    r = tzip.Reader(buf2.getvalue())
    got = {h.name: r.read(h) for h in r.entries}
    assert got == {"p.txt": b"stdlib produced " * 300, "q.txt": b"another"}


def test_zip_raw_copy():
    buf = io.BytesIO()
    w = tzip.Writer(buf)
    w.create("a", b"raw copy source data " * 100, method=tzip.DEFLATE)
    w.close()
    r = tzip.Reader(buf.getvalue())
    h = r.entries[0]
    raw = r.open_raw(h)
    # re-add raw to a new archive without recompressing (CreateRaw parity)
    buf2 = io.BytesIO()
    w2 = tzip.Writer(buf2)
    import dataclasses

    w2.create_raw(dataclasses.replace(h, name="b"), raw)
    w2.close()
    r2 = tzip.Reader(buf2.getvalue())
    assert r2.read(r2.entries[0]) == b"raw copy source data " * 100


def test_zip_custom_codec_registry():
    tzip.register_compressor(200, lambda d: bytes(d)[::-1])
    tzip.register_decompressor(200, lambda b, n: bytes(b)[::-1])
    buf = io.BytesIO()
    w = tzip.Writer(buf)
    w.create("r.bin", b"reversible codec!", method=200)
    w.close()
    r = tzip.Reader(buf.getvalue())
    assert r.read(r.entries[0]) == b"reversible codec!"
