"""Device checksum kernels vs host implementations (bit-exact).

Reference role: zstd/internal/xxhash/xxhash_amd64.s + s2 framing CRC."""

import numpy as np
import pytest

from compress_tpu.ops import checksum as ck
from compress_tpu.utils.crc import crc32c
from compress_tpu.utils.xxhash64 import xxh64


@pytest.mark.parametrize("n", [512, 513, 1000, 4096, 65536, 100000])
def test_crc32c_batch_matches_host(n):
    rng = np.random.default_rng(n)
    blocks = rng.integers(0, 256, (5, n), np.uint8)
    got = np.asarray(ck.crc32c_batch(blocks))
    for b in range(5):
        assert int(got[b]) == crc32c(blocks[b].tobytes()), b


def test_crc32c_batch_structured():
    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    cases = [twain[:8192], bytes(8192), b"\xff" * 8192,
             (b"abc123" * 2000)[:8192]]
    blocks = np.stack([np.frombuffer(c, np.uint8) for c in cases])
    got = np.asarray(ck.crc32c_batch(blocks))
    for i, c in enumerate(cases):
        assert int(got[i]) == crc32c(c), i


@pytest.mark.parametrize("n", [32, 64, 1024, 32768])
def test_xxh64_batch_matches_host(n):
    rng = np.random.default_rng(n)
    blocks = rng.integers(0, 256, (4, n), np.uint8)
    got = np.asarray(ck.xxh64_batch(blocks))
    for b in range(4):
        want = xxh64(blocks[b].tobytes())
        have = int(got[b, 0]) | (int(got[b, 1]) << 32)
        assert have == want, (b, hex(have), hex(want))


def test_xxh64_batch_seeded():
    data = np.frombuffer(
        open("/root/reference/testdata/html.txt", "rb").read()[:4096],
        np.uint8)[None, :]
    got = np.asarray(ck.xxh64_batch(data, seed=12345))
    want = xxh64(data.tobytes(), seed=12345)
    assert (int(got[0, 0]) | (int(got[0, 1]) << 32)) == want
