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


def compact_best(valid, arrays, plane_bits: int = 32, tile: int | None = None):
    """Dispatch: compact_route (default) unless COMPRESS_TPU_COMPACT=
    logshift forces the log-shift path (read at trace time — a debug/
    measurement knob, not a runtime switch)."""
    import os

    if os.environ.get("COMPRESS_TPU_COMPACT") == "logshift":
        return compact_logshift(valid, arrays)
    return compact_route(valid, arrays, plane_bits=plane_bits, tile=tile)


def compact_route(valid, arrays, plane_bits: int = 32, tile: int | None = None):
    """Stable compaction via TWO one-hot MXU routings — zero log-shift
    rounds. compact_logshift pays ~log2(N) full HBM read+write passes; this
    pays two einsums (the measured-fast route_tiles pattern).

    Every valid item's destination is its exclusive-cumsum rank (stable).
    Items first route into (128-lane-row)-relative slots inside their
    tile — a tile of `tile` items spans at most R = (tile+126)//128 + 1
    output rows — then whole 128-lane rows route to their global row.
    Sum-routing is exact because destinations are unique across the whole
    row (masked slots contribute exact zeros; two tiles sharing a
    boundary row touch disjoint lanes).

    plane_bits: 8 → values <= 255, bf16 one-hots; 16 → values <= 65535,
    f32 "highest"; 32 → each array splits into lo/hi 16-bit planes
    (values must be non-negative int32).

    Falls back to compact_logshift when no tile size divides N.
    Returns (alive, arrays) like compact_logshift."""
    B, N = valid.shape
    if tile is None:
        tile = next((t for t in (512, 384, 256, 128) if N % t == 0), None)
    if tile is None:
        return compact_logshift(valid, arrays)
    nt = N // tile
    R = (tile + 126) // 128 + 1
    out_rows = N // 128  # N % tile == 0 and tile % 128 == 0 => N % 128 == 0
    v32 = valid.astype(jnp.int32)
    dest = jnp.cumsum(v32, axis=1) - v32                       # (B, N)
    counts = dest[:, -1] + v32[:, -1]
    tstart = dest.reshape(B, nt, tile)[:, :, 0]                # (B, nt)
    rowbase = tstart >> 7
    rel = dest.reshape(B, nt, tile) - (rowbase << 7)[:, :, None]
    rel = jnp.where(valid.reshape(B, nt, tile), rel, R * 128)  # OOB → zeros

    planes, meta = [], []  # meta: (array index, left shift on recombine)
    for ai, a in enumerate(arrays):
        if plane_bits == 32:
            planes.append(jnp.where(valid, a & 0xFFFF, 0))
            meta.append((ai, 0))
            planes.append(jnp.where(valid, (a >> 16) & 0x7FFF, 0))
            meta.append((ai, 16))
        else:
            planes.append(jnp.where(valid, a, 0))
            meta.append((ai, 0))
    dt = jnp.bfloat16 if plane_bits == 8 else jnp.float32
    prec = None if plane_bits == 8 else "highest"

    K = len(planes)
    # both einsums use the proven route_tiles 3-operand pattern
    # (batch, contract, out) — higher-rank batch dims fail XLA:CPU's dot
    oh_a = jax.nn.one_hot(rel.reshape(B * nt, tile), R * 128,
                          dtype=dt)                        # (Bnt, tile, R128)
    stacked = jnp.stack([p.reshape(B * nt, tile) for p in planes],
                        axis=-1).astype(dt)                # (Bnt, tile, K)
    routed = jnp.einsum("mtk,mtr->mrk", stacked, oh_a,
                        preferred_element_type=jnp.float32, precision=prec)
    lanes = routed.reshape(B, nt * R, 128 * K)
    grow = (rowbase[:, :, None]
            + jnp.arange(R, dtype=jnp.int32)[None, None, :]).reshape(B, nt * R)
    # rows past out_rows hold only zeros (a valid dest < N ⇒ row < out_rows);
    # one_hot drops out-of-range indices, so no extra masking is needed
    oh_b = jax.nn.one_hot(grow, out_rows, dtype=dt)        # (B, ntR, out_rows)
    out = jnp.einsum("bml,bmo->bol", lanes.astype(dt), oh_b,
                     preferred_element_type=jnp.float32, precision=prec)
    out = out.astype(jnp.int32).reshape(B, out_rows, 128, K)
    out = out.transpose(0, 3, 1, 2).reshape(B, K, out_rows * 128)

    res = [jnp.zeros((B, N), jnp.int32) for _ in arrays]
    for k, (ai, sh) in enumerate(meta):
        res[ai] = res[ai] | (out[:, k] << sh)
    alive = jnp.arange(N, dtype=jnp.int32)[None, :] < counts[:, None]
    return alive, [jnp.where(alive, r, 0) for r in res]


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
