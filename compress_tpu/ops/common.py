"""Shared TPU device primitives for the codec kernels.

The two workhorses (docs/tpu_design_notes.md):

- **one-hot MXU routing**: `route_tiles` — the TPU-native "scatter".
  XLA fuses one-hot generation into the dot; measured ~630 Gelem/s of
  routing capacity, far faster than XLA scatter (0.14 Gelem/s).
- **log-shift monotone compaction**: `compact_logshift` — stable stream
  compaction in log(n) masked static shifts, no sort, no gather.
  Collision-free because for valid i<j the invalid-prefix-count deltas
  satisfy (d_j mod 2^b) - (d_i mod 2^b) < j - i at every bit level.

Reference parity: these replace the role of the reference's sequential
byte emitters (s2/encode_all.go emitLiteral/emitCopy, zstd bitWriter
zstd/bitwriter.go) with batched device equivalents.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def compact_logshift(valid, arrays, fill=0):
    """Stable-compact `arrays` rows to the front where `valid` (LSB-first
    log shifts over the last axis). Returns (alive_mask, arrays)."""
    n = valid.shape[-1]
    inv = (~valid).astype(jnp.int32)
    delta = jnp.cumsum(inv, axis=-1) - inv  # invalid entries strictly before i
    alive = valid
    arrays = list(arrays)
    nbits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for b in range(nbits):
        s = 1 << b

        def shl(x, fillv):
            pad = jnp.full(x.shape[:-1] + (s,), fillv, x.dtype)
            return jnp.concatenate([x[..., s:], pad], axis=-1)

        d_in = shl(delta, 0)
        a_in = shl(alive, False)
        take = a_in & (((d_in >> b) & 1) == 1)  # donor moves onto this slot
        stay = alive & (((delta >> b) & 1) == 0)  # occupant stays put
        arrays = [
            jnp.where(take, shl(a, fill), jnp.where(stay, a, fill)) for a in arrays
        ]
        delta = jnp.where(take, d_in, delta)
        alive = take | stay
    return alive, arrays


def route_tiles(dests, planes, out_width, *, accumulate_shifts=0,
                dtype=jnp.bfloat16):
    """Sum-route `planes` values to per-tile slots via a single one-hot.

    dests: (N, P) int32 slot index per item, all < out_width.
    planes: list of (N, P) int32 values. With dtype=bf16, values must be
        <= 255 for exactness; use dtype=f32 for 16-bit planes (sums of
        disjoint-bit 16-bit values stay < 2^24, exact in f32).
    accumulate_shifts: if k > 0, plane j is shifted j slots right in the
        output (used for multi-slot items sharing one one-hot).
    Returns (N, out_width) int32 sums (or (N, K, out_width) if not
    accumulating).
    """
    oh = jax.nn.one_hot(dests, out_width, dtype=dtype)  # (N, P, O)
    stacked = jnp.stack(planes, axis=-1).astype(dtype)  # (N, P, K)
    # TPU f32 dots default to bf16 passes; 16-bit payloads need exactness
    prec = "highest" if dtype == jnp.float32 else None
    routed = jnp.einsum(
        "tpk,tpo->tko", stacked, oh, preferred_element_type=jnp.float32,
        precision=prec,
    )
    if accumulate_shifts:
        out = routed[:, 0]
        for j in range(1, len(planes)):
            out = out + jnp.roll(routed[:, j], j, axis=-1)
        return out.astype(jnp.int32)
    return routed.astype(jnp.int32)


def exclusive_cumsum(x, axis=-1):
    c = jnp.cumsum(x, axis=axis)
    return c - x, c


def floor_log2(v):
    """Exact floor(log2(v)) for int v in [1, 2^20] via f32 log2."""
    return jnp.floor(jnp.log2(v.astype(jnp.float32) + 0.5)).astype(jnp.int32)
