"""L1 primitive tests: varint, CRC-32C (+mask, +combine), xxhash64, histogram,

estimate. Oracles: google_crc32c / xxhash PyPI packages (test-only), plus
hand-checked vectors. Both native and pure-Python paths are exercised
(the reference's noasm differential testing, SURVEY.md §4.5).
"""

import os
import random

import numpy as np
import pytest

from compress_tpu.utils import varint
from compress_tpu.utils.crc import (
    _crc32c_numpy,
    crc32c,
    crc32c_combine,
    crc32c_masked,
)
from compress_tpu.utils.xxhash64 import _xxh64_py, xxh64
from compress_tpu.utils.histogram import histogram256, histogram256_jax
from compress_tpu.estimate import estimate, shannon_entropy_bits


def test_uvarint_roundtrip():
    rng = random.Random(1)
    vals = [0, 1, 127, 128, 300, 1 << 20, (1 << 64) - 1] + [
        rng.getrandbits(rng.randrange(1, 64)) for _ in range(200)
    ]
    for v in vals:
        out = bytearray()
        n = varint.put_uvarint(out, v)
        assert n == len(out) == varint.uvarint_len(v)
        got, pos = varint.read_uvarint(bytes(out))
        assert got == v and pos == n


def test_varint_signed_roundtrip():
    for v in [0, 1, -1, 63, -64, 1 << 40, -(1 << 40)]:
        out = bytearray()
        varint.put_varint(out, v)
        got, _ = varint.read_varint(bytes(out))
        assert got == v


def test_uvarint_lens_np():
    vals = np.array([0, 1, 127, 128, 16383, 16384, (1 << 64) - 1], dtype=np.uint64)
    lens = varint.uvarint_lens_np(vals)
    expect = [varint.uvarint_len(int(v)) for v in vals]
    assert lens.tolist() == expect


def test_uvarint_truncated():
    with pytest.raises(ValueError):
        varint.read_uvarint(b"\x80")


CRC_ORACLE = pytest.importorskip("google_crc32c", reason="test oracle")


@pytest.mark.parametrize("n", [0, 1, 7, 15, 16, 17, 64, 1000, 65536])
def test_crc32c_matches_oracle(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    want = CRC_ORACLE.value(data)
    assert crc32c(data) == want
    assert _crc32c_numpy(data) == want


def test_crc32c_streaming_and_combine():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 333, dtype=np.uint8).tobytes()
    whole = crc32c(a + b)
    assert crc32c(b, crc32c(a)) == whole
    assert crc32c_combine(crc32c(a), crc32c(b), len(b)) == whole


def test_crc32c_masked_known_vector():
    # snappy framing mask; spot value validated against the Go reference's
    # crc() on "snappy" semantics: mask(c) = rotr15(c) + 0xa282ead8
    c = crc32c(b"snappy")
    want = (((c >> 15) | (c << 17)) & 0xFFFFFFFF) + 0xA282EAD8 & 0xFFFFFFFF
    assert crc32c_masked(b"snappy") == want


XXH_ORACLE = pytest.importorskip("xxhash", reason="test oracle")


@pytest.mark.parametrize("n", [0, 1, 3, 4, 7, 8, 31, 32, 33, 63, 100, 4096])
def test_xxh64_matches_oracle(n):
    rng = np.random.default_rng(n + 100)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert xxh64(data) == XXH_ORACLE.xxh64_intdigest(data)
    assert _xxh64_py(data) == XXH_ORACLE.xxh64_intdigest(data)
    assert _xxh64_py(data, seed=12345) == XXH_ORACLE.xxh64_intdigest(data, seed=12345)


def test_native_available_unless_disabled():
    from compress_tpu import _native

    if os.environ.get("COMPRESS_TPU_NONATIVE"):
        assert not _native.available()
    else:
        assert _native.available()


def test_histogram_host_vs_device():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 50_000, dtype=np.uint8)
    h = histogram256(data)
    assert h.sum() == data.size
    import jax.numpy as jnp

    hj = histogram256_jax(jnp.asarray(data), segment=4096)
    assert np.array_equal(np.asarray(hj), h)


def test_entropy_and_estimate(corpus_file):
    data = corpus_file.read_bytes()
    ent = shannon_entropy_bits(data)
    assert 0 <= ent <= len(data) * 8
    score = estimate(data)
    assert 0.0 <= score <= 1.0
    if corpus_file.name == "sharnd.out":  # random data: incompressible
        assert score < 0.1
    if corpus_file.name.endswith(".txt"):  # text: compressible
        assert score > 0.2


def test_debuglog_convention(capsys, monkeypatch):
    """COMPRESS_TPU_DEBUG env gates subsystem tracing (reference
    debugEncoder/debugDecoder role, zstd/zstd.go:13-20)."""
    from compress_tpu.utils import debuglog

    monkeypatch.setenv("COMPRESS_TPU_DEBUG", "zstd,engine")
    debuglog._reset_for_tests()
    assert debuglog.enabled("zstd") and debuglog.enabled("engine")
    assert not debuglog.enabled("s2")
    debuglog.dbg("zstd", "hello %d", 7)
    debuglog.dbg("s2", "hidden")
    err = capsys.readouterr().err
    assert "[ct:zstd] hello 7" in err and "hidden" not in err
    monkeypatch.setenv("COMPRESS_TPU_DEBUG", "all")
    debuglog._reset_for_tests()
    assert debuglog.enabled("anything")
    monkeypatch.delenv("COMPRESS_TPU_DEBUG")
    debuglog._reset_for_tests()
    assert not debuglog.enabled("zstd")
    debuglog._reset_for_tests()
