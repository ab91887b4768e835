"""S2 framed stream + index tests."""

import io
import pathlib

import numpy as np
import pytest

from compress_tpu.s2 import index as s2index
from compress_tpu.s2 import stream as s2stream


def _roundtrip(data, **wopts):
    buf = io.BytesIO()
    w = s2stream.Writer(buf, **wopts)
    # write in awkward chunk sizes to exercise buffering
    for i in range(0, len(data), 70001):
        w.write(data[i : i + 70001])
    w.close()
    return buf.getvalue()


def test_stream_roundtrip_corpus(corpus_file):
    data = corpus_file.read_bytes()
    stream = _roundtrip(data)
    r = s2stream.Reader(io.BytesIO(stream))
    assert r.read() == data


def test_stream_concurrent_writer_identical(corpus_file):
    """workers>1 must emit byte-identical streams to serial (deterministic
    encode + ordered drain; reference s2/writer.go fan-out)."""
    data = corpus_file.read_bytes()
    for lvl in (1, 2):
        serial = _roundtrip(data, block_size=1 << 16, level=lvl,
                            add_index=True)
        conc = _roundtrip(data, block_size=1 << 16, level=lvl,
                          add_index=True, workers=4)
        assert serial == conc
        r = s2stream.Reader(io.BytesIO(conc))
        assert r.read() == data


def test_stream_writer_levels_ladder():
    import os

    data = (pathlib.Path("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt")
            .read_bytes())
    sizes = [len(_roundtrip(data, level=lvl)) for lvl in (1, 2, 3)]
    if os.environ.get("COMPRESS_TPU_NONATIVE") == "1":
        # the pure-Python fallback has no better/best tiers (native-only)
        assert sizes[0] >= sizes[1] >= sizes[2]
    else:
        assert sizes[0] > sizes[1] > sizes[2]
    for lvl in (2, 3):
        r = s2stream.Reader(io.BytesIO(_roundtrip(data, level=lvl)))
        assert r.read() == data


def test_stream_snappy_mode(corpus_file):
    data = corpus_file.read_bytes()[: 1 << 17]
    stream = _roundtrip(data, snappy=True, block_size=1 << 16)
    assert stream.startswith(s2stream.MAGIC_CHUNK_SNAPPY)
    r = s2stream.Reader(io.BytesIO(stream))
    assert r.read() == data


def test_stream_padding_and_uncompressed():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    stream = _roundtrip(data, padding=4096)
    assert len(stream) % 4096 == 0
    assert s2stream.Reader(io.BytesIO(stream)).read() == data
    stream2 = _roundtrip(data, uncompressed=True)
    assert s2stream.Reader(io.BytesIO(stream2)).read() == data


def test_stream_skippable_blocks():
    seen = []
    buf = io.BytesIO()
    w = s2stream.Writer(buf)
    w.write(b"hello world " * 100)
    w.add_skippable_block(0x80, b"user metadata")
    w.write(b"more data " * 50)
    w.close()
    r = s2stream.Reader(io.BytesIO(buf.getvalue()),
                        skippable_cb=lambda cid, b: seen.append((cid, b)))
    assert r.read() == b"hello world " * 100 + b"more data " * 50
    assert seen == [(0x80, b"user metadata")]


def test_stream_read_byte_and_skip():
    data = bytes(range(256)) * 1000
    stream = _roundtrip(data, block_size=1 << 14)
    r = s2stream.Reader(io.BytesIO(stream))
    assert r.read_byte() == 0
    r.skip(499)
    assert r.read(2) == data[500:502]
    r.skip(200_000)
    assert r.read(4) == data[200_502 : 200_506]


def test_stream_crc_detects_corruption():
    data = b"abcdefgh" * 5000
    stream = bytearray(_roundtrip(data))
    # flip a payload byte in the first data chunk (after magic + hdr + crc)
    stream[len(s2stream.MAGIC_CHUNK) + 9] ^= 0xFF
    with pytest.raises(ValueError):
        s2stream.Reader(io.BytesIO(bytes(stream))).read()


def test_index_roundtrip_and_find():
    entries = [(0, 10), (1 << 20, 400_000), (2 << 20, 800_017), (3 << 20, 1_200_033)]
    idx = s2index.Index(entries, total_uncompressed=4 << 20, total_compressed=1_600_000)
    blob = idx.append_to()
    idx2, used = s2index.Index.load(blob)
    assert used == len(blob)
    assert idx2.entries == entries
    assert idx2.total_uncompressed == 4 << 20
    c, u = idx2.find(2_500_000)
    assert (u, c) == ((2 << 20), 800_017)
    # load from stream tail
    stream_tail = b"...garbage..." + blob
    idx3 = s2index.Index.load_stream(stream_tail)
    assert idx3.entries == entries
    # header strip/restore
    stripped = s2index.remove_index_headers(blob)
    assert s2index.restore_index_headers(stripped) == blob
    # json
    assert "offsets" in idx.to_json()


def test_writer_add_index_and_index_stream():
    data = bytes(np.random.default_rng(1).integers(65, 91, 3 << 20, dtype=np.uint8))
    buf = io.BytesIO()
    w = s2stream.Writer(buf, block_size=1 << 18, add_index=True)
    w.write(data)
    w.close()
    stream = buf.getvalue()
    idx = s2index.Index.load_stream(stream)
    assert idx.total_uncompressed == len(data)
    assert len(idx.entries) == 12
    # scanning the stream reproduces the same uncompressed offsets
    idx2 = s2index.index_stream(stream)
    assert [u for u, _ in idx2.entries] == [u for u, _ in idx.entries]
    # reader ignores the index chunk
    assert s2stream.Reader(io.BytesIO(stream)).read() == data
    # seek via the index: start reading at an entry boundary
    c, u = idx.find(1 << 20)
    sub = io.BytesIO(stream[c:])
    r = s2stream.Reader(sub, ignore_stream_id=True)
    r.skip((1 << 20) - u)
    assert r.read(100) == data[1 << 20 : (1 << 20) + 100]


def _twain():
    return open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()


def test_decode_concurrent_matches_reader():
    twain = _twain()
    """Thread-pool whole-stream decode == serial Reader (P5 equivalent)."""
    import io

    from compress_tpu.s2 import stream as s2s

    data = (twain * 3)[: 700_000]
    buf = io.BytesIO()
    w = s2s.Writer(buf)
    w.write(data)
    w.close()
    st = buf.getvalue()
    assert s2s.decode_concurrent(st, workers=4) == data
    assert s2s.decode_concurrent(st, workers=1) == data


def test_decode_concurrent_speedup():
    twain = _twain()
    """With the GIL released in native decode, workers should not be
    slower than serial (smoke check, not a strict perf assertion)."""
    import io
    import time

    from compress_tpu.s2 import stream as s2s

    data = (twain * 12)[: 4 << 20]
    buf = io.BytesIO()
    w = s2s.Writer(buf)
    w.write(data)
    w.close()
    st = buf.getvalue()
    t0 = time.time(); a = s2s.decode_concurrent(st, workers=1); t1 = time.time()
    b = s2s.decode_concurrent(st, workers=4)
    t2 = time.time()
    assert a == b == data
    # lenient: pool overhead must not blow up wall time (native decode of
    # 4MB is ~ms-scale, so only gross regressions can trip this)
    assert (t2 - t1) < max((t1 - t0) * 3, 0.25)


def test_writer_async_flush():
    """AsyncFlush hands work to the pool without draining; close()
    completes the stream byte-identically to the sync path."""
    import io

    from compress_tpu.s2 import stream as S

    data = (b"async flush corpus " * 4000)[: 64 * 1024 + 777]
    outs = []
    for workers in (1, 3):
        dst = io.BytesIO()
        w = S.Writer(dst, workers=workers)
        w.write(data[: 30000])
        w.async_flush()
        w.write(data[30000:])
        w.close()
        outs.append(dst.getvalue())
    assert outs[0] == outs[1]
    r = S.Reader(io.BytesIO(outs[0]))
    assert r.read() == data
