"""zstd device encoder v2 (ops/zenc2.py) — round-trip + LDM semantics.

Runs the Pallas kernels in interpret mode on the CPU mesh; output frames
must decode bit-exactly via both the host decoder and libzstd."""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu import zstd as Z  # noqa: E402
from compress_tpu.ops import zenc2  # noqa: E402
from compress_tpu.zstd import device as ZD  # noqa: E402

zstandard = pytest.importorskip("zstandard")

ENC = functools.partial(zenc2.zstd_encode_jobs_v2, interpret=True)


def _roundtrip(data, job):
    blob = ZD.compress_device(data, encode_fn=ENC, block=zenc2.BLOCK,
                              job=job)
    assert Z.decompress(blob) == data
    dctx = zstandard.ZstdDecompressor()
    assert dctx.decompress(blob, max_output_size=2 * len(data) + 64) == data
    return blob


def test_v2_roundtrip_text():
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    data = tw[: 1 << 20]  # 387k real + wraps below job -> host tail
    data = (tw * 3)[: 1 << 20]
    blob = _roundtrip(data, 1 << 19)  # two 512 KiB jobs + prefix carry
    assert len(blob) < len(data) // 2


def test_v2_ldm_replica():
    """The winnowed LDM must collapse replica periods not divisible by
    the window stride (the aligned-grid failure mode)."""
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()[: 300 * 1024 + 13]          # odd period
    data = (tw * 4)[: 1 << 20]
    blob = _roundtrip(data, 1 << 20)
    # block-local (no-LDM) encodes this at ~0.45; the LDM must collapse
    # copies 2-4 (period 307213, not a multiple of the window stride)
    assert len(blob) / len(data) < 0.28, len(blob)


def test_v2_mixed_shapes():
    rng = np.random.default_rng(11)
    html = open("/root/reference/testdata/html.txt", "rb").read()
    parts = [
        np.zeros(200 * 1024, np.uint8).tobytes(),          # rle blocks
        rng.integers(0, 256, 200 * 1024, dtype=np.uint8).tobytes(),  # raw
        (html * 40)[: 300 * 1024],
        bytes(range(256)) * 300,
    ]
    data = b"".join(parts)
    data = data[: (len(data) // (1 << 19)) * (1 << 19)]
    _roundtrip(data, 1 << 19)


def test_v2_engine_auto_cpu_uses_v1():
    """engine='auto' on CPU must not try to compile Pallas kernels."""
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    data = (tw * 3)[: 1 << 20]
    blob = ZD.compress_device(data)  # auto -> v1 on the CPU mesh
    assert Z.decompress(blob) == data
