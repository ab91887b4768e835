"""Seeded structured-input roundtrip fuzzing (SURVEY §4 item 4 parity).

The reference runs go-fuzz over every codec in CI; here a deterministic
generator produces adversarial structured inputs (runs, periodic motifs,
random segments, text splices, byte ramps) and every codec must roundtrip
bit-exactly — in native mode against external oracles where available.
"""

import numpy as np
import pytest

from compress_tpu import flate, s2, zstd


def _gen(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    parts = []
    for _ in range(rng.integers(1, 8)):
        kind = rng.integers(0, 6)
        n = int(rng.integers(1, 60000))
        if kind == 0:
            parts.append(bytes([int(rng.integers(0, 256))]) * n)
        elif kind == 1:
            motif = rng.integers(0, 256, int(rng.integers(1, 70)),
                                 np.uint8).tobytes()
            parts.append((motif * (n // len(motif) + 1))[:n])
        elif kind == 2:
            parts.append(rng.integers(0, 256, n, np.uint8).tobytes())
        elif kind == 3:
            off = int(rng.integers(0, max(len(tw) - n, 1)))
            parts.append(tw[off : off + n])
        elif kind == 4:
            parts.append((np.arange(n) % 251).astype(np.uint8).tobytes())
        else:
            prev = parts[-1] if parts else tw[:n]
            parts.append(prev[: n])  # duplicate earlier segment
    return b"".join(parts)


SEEDS = list(range(24))


@pytest.mark.parametrize("seed", SEEDS)
def test_zstd_native_roundtrip(seed):
    data = _gen(seed)
    frame = zstd.compress(data, level=1, checksum=True)
    assert zstd.decompress(frame) == data
    zstandard = pytest.importorskip("zstandard")
    assert zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=len(data) + 64) == data


@pytest.mark.parametrize("seed", SEEDS[:12])
def test_flate_native_roundtrip(seed):
    import zlib as stdzlib

    data = _gen(seed + 1000)
    f = flate.deflate(data, 5)
    assert flate.inflate(f) == data
    assert stdzlib.decompress(f, -15) == data
    # decode a stdlib-produced stream too
    g = stdzlib.compress(data, 6)[2:-4]
    assert flate.inflate(g) == data


@pytest.mark.parametrize("seed", SEEDS[:12])
def test_s2_native_roundtrip(seed):
    data = _gen(seed + 2000)
    if len(data) > s2.MAX_BLOCK_SIZE:
        data = data[: s2.MAX_BLOCK_SIZE]
    enc = s2.encode(data)
    assert s2.decode(enc) == data
    sn = s2.encode_snappy(data)
    assert s2.decode(sn) == data


@pytest.mark.parametrize("seed", SEEDS[:6])
def test_zstd_device_roundtrip(seed):
    from compress_tpu.zstd.device import compress_device

    data = _gen(seed + 3000)
    data = (data * ((1 << 16) // max(len(data), 1) + 2))[: 3 * (1 << 15) + 77]
    frame = compress_device(data, job=1 << 15, block=1 << 13)
    assert zstd.decompress(frame) == data
