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


def test_zip_legacy_name_decoding():
    """Non-UTF-8 entry names decode via cp437 by default or a custom
    name_decoder (reference: zip ReaderOptions NameDecoder)."""
    import struct
    import zipfile
    import io

    from compress_tpu import zip as czip

    # build an archive with a cp437 name (0x82 = e-acute in cp437),
    # UTF-8 flag NOT set — stdlib zipfile writes cp437 when name is
    # encodable... force bytes via low-level write instead
    name437 = "café".encode("cp437")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("placeholder", b"hello legacy")
    blob = bytearray(buf.getvalue())
    # patch the name bytes in both local and central headers
    idx = blob.find(b"placeholder")
    while idx >= 0:
        blob[idx : idx + len(name437)] = name437
        blob[idx + len(name437) : idx + 11] = b"\x00" * (11 - len(name437))
        idx = blob.find(b"placeholder", idx + 1)
    # fix name length fields: local header at 0, central later
    # simpler: rebuild with exact-length name through our writer
    w = io.BytesIO()
    zw = czip.Writer(w)
    h = zw.create("tmpname", b"hello legacy", method=0)
    zw.close()
    raw = bytearray(w.getvalue())
    assert len("tmpname") == len(name437) + 3
    nm = name437 + b"\x01\x02\x03"  # same length, non-UTF-8 bytes
    i = raw.find(b"tmpname")
    while i >= 0:
        raw[i : i + 7] = nm
        i = raw.find(b"tmpname", i + 1)
    r = czip.Reader(bytes(raw))
    names = r.namelist()
    assert len(names) == 1
    assert names[0] == nm.decode("cp437")
    custom = czip.Reader(bytes(raw),
                         name_decoder=lambda b: b.decode("latin-1"))
    assert custom.namelist()[0] == nm.decode("latin-1")
