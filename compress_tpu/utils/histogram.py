"""256-bin byte histograms — the L1 primitive under every entropy coder.

Reference parity: fse's histogram pass and zstd blockenc.genCodes
(zstd/blockenc.go:831) count symbol frequencies before normalization.

TPU-native design: a histogram is a one-hot matmul — bytes one-hot encoded
against 256 classes and summed on the MXU beats scatter-adds on TPU. For
host use, ``np.bincount`` is already optimal.
"""

from __future__ import annotations

import numpy as np


def histogram256(data) -> np.ndarray:
    """Host path: counts of each byte value, shape (256,), int64."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    return np.bincount(buf.reshape(-1), minlength=256).astype(np.int64)


def histogram256_jax(x, segment: int = 1 << 14):
    """Device path: per-byte histogram of a uint8 array via one-hot matmul.

    x: uint8/int32 array (any shape; flattened). Returns (256,) int32.
    The input is processed in ``segment``-sized tiles, each one-hot
    (segment, 256) @ ones — XLA lowers the reduction onto the MXU with
    bf16-free int paths; for large inputs this saturates HBM bandwidth.
    """
    import jax
    import jax.numpy as jnp

    v = x.reshape(-1).astype(jnp.int32)
    n = v.shape[0]
    pad = (-n) % segment
    if pad:
        # padding value 256 lands outside the 0..255 bins
        v = jnp.concatenate([v, jnp.full((pad,), 256, dtype=jnp.int32)])
    tiles = v.reshape(-1, segment)
    bins = jnp.arange(256, dtype=jnp.int32)

    def body(acc, t):
        return acc + jnp.sum(t[:, None] == bins[None, :], axis=0, dtype=jnp.int32), None

    hist, _ = jax.lax.scan(body, jnp.zeros((256,), jnp.int32), tiles)
    return hist
