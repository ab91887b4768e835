"""Device zstd L1 encoder tests (CPU backend, small geometry).

What must hold (same contract as the S2 device tests): every frame the
device encoder emits decodes bit-exactly — by our own decoder AND by
libzstd (the `zstandard` oracle) — and ratios are sane. The device
bitstream is a valid alternative encoding, not byte-identical to the
host encoder's (the reference makes the same non-promise vs C zstd,
zstd/README.md:134).
"""

import numpy as np
import pytest

zstandard = pytest.importorskip("zstandard")

from compress_tpu import zstd
from compress_tpu.zstd.device import compress_device

JOB, BLOCK = 1 << 15, 1 << 13  # tiny geometry for CPU tests


def _roundtrip(data: bytes):
    frame = compress_device(data, job=JOB, block=BLOCK, checksum=True)
    assert zstd.decompress(frame) == data
    got = zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=len(data) + 16)
    assert got == data
    return frame


@pytest.fixture(scope="module")
def twain():
    return open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()


def test_text_roundtrip_and_ratio(twain):
    data = twain[: 2 * JOB + 777]
    frame = _roundtrip(data)
    assert len(frame) < len(data) * 0.75


def test_zeros_rle_blocks():
    data = bytes(2 * JOB)
    frame = _roundtrip(data)
    # constant blocks become RLE block type: a few bytes per 8K block
    assert len(frame) < 100


def test_incompressible_random():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, JOB + 100, dtype=np.uint8).tobytes()
    frame = _roundtrip(data)
    assert len(frame) < len(data) * 1.01  # raw-block fallback bounds expansion


def test_long_range_dedup(twain):
    # repeated segment within one job: top-K offset probing must catch it
    seg = twain[:JOB // 2]
    data = seg + seg
    frame = _roundtrip(data)
    assert len(frame) < len(seg) * 0.75  # second copy nearly free


def test_periodic():
    data = (b"abcde" * (JOB // 5 + 3))[: JOB + 17]
    frame = _roundtrip(data)
    assert len(frame) < 2500


def test_mixed_content(twain):
    rng = np.random.default_rng(5)
    data = (twain[:JOB] + bytes(3000)
            + rng.integers(0, 256, JOB, dtype=np.uint8).tobytes())
    _roundtrip(data)


def test_small_input_host_fallback(twain):
    data = twain[:1000]  # < job -> host path
    frame = compress_device(data, job=JOB, block=BLOCK)
    assert zstd.decompress(frame) == data


def test_bitpack_region_covers_eos_slack():
    """When a stream's bit count is a multiple of 16, the EOS slack half
    is item-untouched; region ownership must still emit it (regression:
    jobs shifted by one half and over-read)."""
    import jax.numpy as jnp

    from compress_tpu.ops.zdev import _bitpack_rows

    R, I = 4, 512
    nbits = np.zeros((R, I), np.int32)
    vals = np.zeros((R, I), np.int32)
    # row 0: 4 items x 4 bits = 16 bits exactly -> region needs 2 halves
    nbits[0, :4] = 4
    vals[0, :4] = [0x1, 0x2, 0x3, 0x4]
    # row 1: 32 bits exactly
    nbits[1, :8] = 4
    vals[1, :8] = range(1, 9)
    dest = np.cumsum(nbits, axis=1) - nbits
    halves, nh = _bitpack_rows(jnp.asarray(vals), jnp.asarray(nbits),
                               jnp.asarray(dest), 384,
                               region_end=jnp.asarray(
                                   [(16 + 16) >> 4, (32 + 16) >> 4, 1, 1]))
    halves, nh = np.asarray(halves), np.asarray(nh)
    assert nh[0] == 2 and nh[1] == 3          # EOS slack halves present
    assert halves[0, 0] == 0x4321 and halves[0, 1] == 0
    assert halves[1, 0] == 0x4321 and halves[1, 1] == 0x8765


def test_multi_job_heterogeneous_corpus(twain):
    """Several jobs in one launch over mixed text/periodic/random data."""
    rng = np.random.default_rng(0)
    perm = rng.permutation(256).astype(np.uint8)
    remap = perm[np.frombuffer(twain[: 2 * JOB], np.uint8)].tobytes()
    data = (twain[:JOB] + bytes(JOB // 2)
            + rng.integers(0, 256, JOB // 2, np.uint8).tobytes()
            + remap + (b"0123456789" * (JOB // 10 + 1))[:JOB])
    _roundtrip(data)


def test_device_level_ladder():
    """r3 (VERDICT r2 missing #4): device levels 1-3. L2 must beat L1
    clearly (chain extension + offset probing); L3 may only help (second
    probe round), never hurt beyond parse jitter."""
    import zstandard

    from compress_tpu import zstd as Z

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    data = (twain * 3)[: 4 * JOB]
    sizes = {}
    for lvl in (1, 2, 3):
        frame = compress_device(data, job=JOB, block=BLOCK, level=lvl)
        assert Z.decompress(frame) == data
        assert zstandard.ZstdDecompressor().decompress(
            frame, max_output_size=len(data) + 16) == data
        sizes[lvl] = len(frame)
    assert sizes[2] < sizes[1]
    assert sizes[3] <= sizes[2] * 1.001 + 16


def test_assemble_job_native_differential():
    """ct_zstd_assemble_job must be byte-identical to the Python
    assembly across edge shapes (RLE blocks, tiny/huge literal counts,
    match-free and literal-free blocks)."""
    import os

    import numpy as np

    if os.environ.get("COMPRESS_TPU_NONATIVE") == "1":
        import pytest

        pytest.skip("native-only differential")
    from compress_tpu.ops import zdev
    from compress_tpu.zstd import device as ZD

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    shapes = [
        (twain * 40)[: zdev.JOB],                      # text
        noise[: zdev.JOB],                             # incompressible
        (b"\x00" * 40000 + twain[:20000]) * 18,        # RLE blocks + text
        (bytes(range(256)) * 4096)[: zdev.JOB],        # periodic
        (twain[:100] * 11000)[: zdev.JOB],             # tiny period
    ]
    for si, data in enumerate(shapes):
        data = data[: zdev.JOB].ljust(zdev.JOB, b"q")
        jobs = np.frombuffer(data, np.uint8).reshape(1, -1)
        t = zdev.zstd_encode_jobs(jobs, level=1 + si % 3)
        t = {k: np.asarray(v) for k, v in t.items()}
        py = ZD._assemble_job_py(data, t, 0, zdev.BLOCK)
        nat = ZD._assemble_job_native(data, t, 0, zdev.BLOCK)
        assert nat is not None
        assert py == nat, f"shape {si}: native assembly differs"
