"""flate/gzip/zlib tests — stdlib zlib is the format oracle both directions."""

import zlib as stdzlib

import numpy as np
import pytest

from compress_tpu import flate
from compress_tpu import gzip as tgzip
from compress_tpu import zlib as tzlib


@pytest.mark.parametrize("lvl", [1, 6, 9])
def test_deflate_decoded_by_stdlib(corpus_file, lvl):
    data = corpus_file.read_bytes()
    blob = flate.deflate(data, lvl)
    assert stdzlib.decompress(blob, wbits=-15) == data


@pytest.mark.parametrize("lvl", [1, 6, 9])
def test_inflate_decodes_stdlib(corpus_file, lvl):
    data = corpus_file.read_bytes()
    blob = stdzlib.compress(data, lvl)[2:-4]  # strip zlib wrapper
    assert flate.inflate(blob) == data


@pytest.mark.parametrize("n", [0, 1, 2, 15, 16, 100, 65535, 65536, 200_000])
def test_deflate_sizes(n):
    rng = np.random.default_rng(n)
    motif = rng.integers(0, 7, 101, dtype=np.uint8).tobytes()
    data = (motif * (n // len(motif) + 1))[:n]
    for lvl in (flate.HUFFMAN_ONLY, 0, 1, 6, 9):
        blob = flate.deflate(data, lvl)
        assert stdzlib.decompress(blob, wbits=-15) == data
        assert flate.inflate(blob) == data


def test_deflate_ratio_vs_stdlib():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    ours = flate.deflate(data, 6)
    std = stdzlib.compress(data, 6)[2:-4]
    assert len(ours) <= len(std) * 1.15, (len(ours), len(std))


def test_stateless_deflate():
    data = b"stateless deflate round trip " * 100
    blob = flate.stateless_deflate(data)
    assert stdzlib.decompress(blob, wbits=-15) == data
    # with dictionary
    d = b"round trip dictionary content"
    blob2 = flate.stateless_deflate(data, dictionary=d)
    dec = stdzlib.decompressobj(wbits=-15, zdict=d)
    assert dec.decompress(blob2) == data


def test_inflate_checkpoints_resume():
    rng = np.random.default_rng(5)
    motif = rng.integers(0, 30, 257, dtype=np.uint8).tobytes()
    data = (motif * 2000)[: 300_000]
    blob = flate.deflate(data, 6)
    cps = []
    out = flate.inflate(blob, eob_callback=cps.append)
    assert out == data
    assert len(cps) >= 2
    # resume from each checkpoint reproduces the tail
    for cp in cps[:-1]:
        rest = flate.inflate(blob, resume_from=cp)
        assert rest == data[cp.uncompressed_offset : cp.uncompressed_offset + len(rest)]
        assert cp.uncompressed_offset + len(rest) == len(data)


def test_inflate_hostile_inputs():
    with pytest.raises(flate.InflateError):
        flate.inflate(b"")
    with pytest.raises(flate.InflateError):
        flate.inflate(b"\x07")  # reserved block type
    with pytest.raises(flate.InflateError):
        flate.inflate(bytes([0x01, 0x05, 0x00, 0x00, 0x00]))  # bad NLEN
    # distance too far back
    bad = stdzlib.compress(b"abcdef" * 100)[2:-4]
    with pytest.raises(flate.InflateError):
        flate.inflate(bad[:-1] + b"\xff")  # garble


@pytest.mark.parametrize("lvl", [1, 6])
def test_gzip_interop(corpus_file, lvl):
    import gzip as stdgzip

    data = corpus_file.read_bytes()[: 1 << 17]
    blob = tgzip.compress(data, lvl, header=tgzip.Header(name="f.txt", comment="c"))
    assert stdgzip.decompress(blob) == data
    got, hdr = tgzip.decompress(blob)
    assert got == data and hdr.name == "f.txt" and hdr.comment == "c"
    # decode stdlib-produced gzip
    blob2 = stdgzip.compress(data, lvl)
    got2, _ = tgzip.decompress(blob2)
    assert got2 == data


def test_gzip_multistream():
    import gzip as stdgzip

    a, b = b"first member " * 50, b"second member " * 30
    blob = tgzip.compress(a) + stdgzip.compress(b)
    got, _ = tgzip.decompress(blob)
    assert got == a + b
    got1, _ = tgzip.decompress(blob, multistream=False)
    assert got1 == a


def test_zlib_interop(corpus_file):
    data = corpus_file.read_bytes()[: 1 << 17]
    blob = tzlib.compress(data, 6)
    assert stdzlib.decompress(blob) == data
    assert tzlib.decompress(stdzlib.compress(data, 6)) == data
    assert tzlib.decompress(blob) == data


def test_zlib_dictionary():
    d = b"common dictionary prefix for the stream"
    data = b"the stream uses the common dictionary prefix for the stream body" * 20
    blob = tzlib.compress(data, 6, dictionary=d)
    dec = stdzlib.decompressobj(zdict=d)
    assert dec.decompress(blob) == data
    assert tzlib.decompress(blob, dictionary=d) == data
    blob2 = stdzlib.compressobj(6, zdict=d).compress(data)
    blob2 += stdzlib.compressobj(6, zdict=d).flush()
    # stdlib-produced dict stream decodes with our inflate
    c = stdzlib.compressobj(6, zdict=d)
    blob3 = c.compress(data) + c.flush()
    assert tzlib.decompress(blob3, dictionary=d) == data


def test_flate_streaming_writer():
    """r3: streaming deflate Writer (reference flate.NewWriter role) —
    bounded memory, sync-flush chunk boundaries, 32 KiB window carry."""
    import io

    from compress_tpu.flate.deflate import Writer

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read() * 6
    for lvl in (1, 4, 9):
        buf = io.BytesIO()
        w = Writer(buf, level=lvl)
        for i in range(0, len(data), 70001):
            w.write(data[i : i + 70001])
        w.flush()
        w.write(b"after flush " * 100)
        w.close()
        want = data + b"after flush " * 100
        assert stdzlib.decompress(buf.getvalue(), -15) == want
        # bounded buffer
        assert len(w._buf) == 0


def test_gzip_zlib_streaming_writers():
    import io
    import gzip as stdgzip

    from compress_tpu import gzip as cg
    from compress_tpu import zlib as cz

    data = open("/root/reference/testdata/html.txt", "rb").read() * 5
    buf = io.BytesIO()
    w = cg.Writer(buf, level=6, header=cg.Header(name="n.txt"))
    for i in range(0, len(data), 41000):
        w.write(data[i : i + 41000])
    w.close()
    assert stdgzip.decompress(buf.getvalue()) == data
    assert cg.decompress(buf.getvalue())[0] == data

    buf2 = io.BytesIO()
    w2 = cz.Writer(buf2, level=3)
    w2.write(data)
    w2.close()
    assert stdzlib.decompress(buf2.getvalue()) == data
    assert cz.decompress(buf2.getvalue()) == data
