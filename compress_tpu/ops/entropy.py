"""Batched device entropy coders: huff0 4X and raw FSE (tANS) blocks.

BASELINE config #2: raw FSE + huff0 entropy encode on device. Both
produce containers bit-compatible with the host `huff0`/`fse` packages
(reference: huff0/compress.go Compress4X, fse/compress.go Compress):
the host only serializes headers and ORs in the end-of-stream marker.

Design: all blocks in a launch share one static length L.
- huff0: per-block Kraft-repair tables + canonical codes (zdev helpers),
  4 streams in descending device layout, one parallel bit-pack.
- FSE: per-block real tables over the byte alphabet; the classic
  2-state interleaved chain (fse/core.py encode_interleaved2) runs as a
  lax.scan over L/2 steps with blocks as lanes; each step's two state
  writes pack into one bit-pack item.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.ops.common import floor_log2, route_tiles
from compress_tpu.ops.zdev import (_bitpack_rows, _canonical_codes_dev,
                                   _huff_build)

FSE_LOG = 9  # fixed accuracy log for the batched device path
HUFF_CKPT_K = 32  # symbols per decode-checkpoint chunk (side channel)


# ---------------------------------------------------------------------------
# huff0 4X
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("shared_table", "max_log"))
def huff0_encode_blocks(blocks, shared_table: bool = False,
                        max_log: int = 11):
    """(N, L) uint8 -> dict(nbits, max_bits, ok, stream_bits (N,4),
    halves, n_halves). Streams live at descending half bases (4..1),
    exactly like the zstd literal sections.

    shared_table: build ONE Huffman code from the batch-wide histogram
    and use it for every block (the reference's treeless/repeat-table
    reuse taken to its limit) — enables the Pallas shared-table decoder.
    max_log: code length cap (8 keeps the decode table 2 select rows)."""
    N, L = blocks.shape
    b = blocks.astype(jnp.int32)
    oh = jax.nn.one_hot(b, 256, dtype=jnp.bfloat16)
    hist = jnp.einsum("nls->ns", oh,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    if shared_table:
        hist = jnp.broadcast_to(jnp.sum(hist, axis=0, keepdims=True),
                                hist.shape)
    nbits, max_bits, ok = _huff_build(hist, maxlog=max_log)
    codes = _canonical_codes_dev(nbits, max_bits)

    htabs = jnp.stack([codes & 0xFF, codes >> 8, nbits], axis=-1)
    ln = jnp.einsum("nls,nsk->nlk", oh, htabs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    code = ln[:, :, 0] | (ln[:, :, 1] << 8)
    nb = ln[:, :, 2]

    seg = (L + 3) // 4
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    q = jnp.minimum(idx // seg, 3)
    cs = jnp.cumsum(nb, axis=1)
    oh_q = jax.nn.one_hot(q, 4, dtype=jnp.float32)
    bq = jnp.einsum("nl,nlq->nq", nb.astype(jnp.float32), oh_q,
                    precision="highest").astype(jnp.int32)
    prev_bits = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32), jnp.cumsum(bq, axis=1)[:, :-1]], axis=1)
    prev_of_i = jnp.einsum("nlq,nq->nl", oh_q, prev_bits.astype(jnp.float32),
                           precision="highest").astype(jnp.int32)
    c_in_q = cs - prev_of_i
    bq_of_i = jnp.einsum("nlq,nq->nl", oh_q, bq.astype(jnp.float32),
                         precision="highest").astype(jnp.int32)
    sh = (bq + 16) >> 4
    sbase = jnp.stack([sh[:, 1] + sh[:, 2] + sh[:, 3],
                       sh[:, 2] + sh[:, 3], sh[:, 3],
                       jnp.zeros_like(sh[:, 0])], axis=1)
    sbase_of_i = jnp.einsum("nlq,nq->nl", oh_q, sbase.astype(jnp.float32),
                            precision="highest").astype(jnp.int32)
    dest_bit = 16 * sbase_of_i + (bq_of_i - c_in_q)
    halves, n_halves = _bitpack_rows(
        jnp.flip(code, axis=1), jnp.flip(nb, axis=1),
        jnp.flip(dest_bit, axis=1), 384,
        region_end=sbase[:, 0] + sh[:, 0])
    # decode-accelerator checkpoints (side channel for the device decoder,
    # ops/entropy_dec.py): remaining-bit offset at every HUFF_CKPT_K-th
    # symbol of each stream. Stream symbol j's consumed-bits-so-far is
    # c_in_q; remaining = stream_bits - consumed.
    segN = seg
    cpad = jnp.pad(c_in_q, ((0, 0), (0, 4 * segN - L)), mode="edge")
    cq = cpad.reshape(N, 4, segN)
    body = bq[:, :, None] - cq[:, :, HUFF_CKPT_K - 1 :: HUFF_CKPT_K]
    ckpt = jnp.concatenate([bq[:, :, None], body], axis=2)
    return dict(nbits=nbits, max_bits=max_bits, ok=ok, stream_bits=bq,
                halves=halves, n_halves=n_halves, ckpt=ckpt)


# ---------------------------------------------------------------------------
# raw FSE (2-state interleaved, byte alphabet)
# ---------------------------------------------------------------------------


def _fse_tables_bytes(hist, log):
    """Per-block encode tables over the 256-symbol byte alphabet.
    Same construction as zdev._fse_build but with NSYM=256."""
    N = hist.shape[0]
    NS = 256
    size = 1 << log
    total = jnp.sum(hist, axis=1, keepdims=True)
    present = hist > 0
    scaled = hist * size
    base = scaled // jnp.maximum(total, 1)
    rem = scaled % jnp.maximum(total, 1)
    norm = jnp.where(present, jnp.maximum(base, 1), 0)
    diff = size - jnp.sum(norm, axis=1)
    iota = jnp.broadcast_to(jnp.arange(NS, dtype=jnp.int32), (N, NS))
    key = jnp.where(present, -rem, 1 << 30)
    _, sym_s = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    _, rank = jax.lax.sort((sym_s, iota), dimension=1, num_keys=1)
    norm = norm + (present & (rank < jnp.maximum(diff, 0)[:, None])).astype(jnp.int32)
    deficit = jnp.maximum(-diff, 0)
    _, sym_s2, norm_s = jax.lax.sort((-norm, iota, norm), dimension=1,
                                     num_keys=1)

    def steal(carry, col):
        d = carry
        take = jnp.minimum(jnp.maximum(col - 1, 0), d)
        return d - take, col - take

    d_left, norm_s2 = jax.lax.scan(steal, deficit, norm_s.T)
    _, norm2 = jax.lax.sort((sym_s2, norm_s2.T), dimension=1, num_keys=1)
    norm = jnp.where(deficit[:, None] > 0, norm2, norm)

    cumul = jnp.cumsum(norm, axis=1) - norm
    cum_incl = cumul + norm
    kk = jnp.arange(size, dtype=jnp.int32)
    step_ = (size >> 1) + (size >> 3) + 3
    pk = (kk * step_) % size
    sym_of_k = jnp.sum((kk[None, :, None] >= cum_incl[:, None, :])
                       .astype(jnp.int32), axis=2)
    spread = route_tiles(jnp.broadcast_to(pk, (N, size)), [sym_of_k],
                         size)[:, 0]
    oh_sp = jax.nn.one_hot(spread, NS, dtype=jnp.float32)
    cum_sp = jnp.cumsum(oh_sp, axis=1) - oh_sp
    r_u = jnp.einsum("nus,nus->nu", oh_sp, cum_sp,
                     precision="highest").astype(jnp.int32)
    cumul_of_u = jnp.einsum("nus,ns->nu", oh_sp, cumul.astype(jnp.float32),
                            precision="highest").astype(jnp.int32)
    dest = jnp.clip(cumul_of_u + r_u, 0, size - 1)
    state_table = route_tiles(dest, [size + jnp.broadcast_to(kk, (N, size))],
                              size, dtype=jnp.float32)[:, 0]
    maxbits = log - floor_log2(jnp.maximum(norm - 1, 1))
    delta_nb = jnp.where(norm > 1, (maxbits << 16) - (norm << maxbits),
                         (log << 16) - size)
    delta_fs = cumul - norm
    return state_table, delta_nb, delta_fs, norm


@functools.partial(jax.jit, static_argnames=("log",))
def fse_encode_blocks(blocks, log: int = FSE_LOG):
    """(N, L) uint8 (L even) -> dict(norm (N,256), total_bits (N,),
    halves, n_halves). Bitstream matches fse/core.py encode_interleaved2
    for the same norm/log; host serializes [uvarint n][ncount][stream]."""
    N, L = blocks.shape
    assert L % 2 == 0
    size = 1 << log
    b = blocks.astype(jnp.int32)
    oh = jax.nn.one_hot(b, 256, dtype=jnp.bfloat16)
    hist = jnp.einsum("nls->ns", oh,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    st_t, dnb_t, dfs_t, norm = _fse_tables_bytes(hist, log)

    def lut(table, idx, width):
        ohx = jax.nn.one_hot(idx, width, dtype=jnp.float32)
        return jnp.einsum("ns,ns->n", ohx, table.astype(jnp.float32),
                          precision="highest").astype(jnp.int32)

    def lut2(table, i1, i2, width):
        ohx = jax.nn.one_hot(jnp.stack([i1, i2], 1), width, dtype=jnp.float32)
        return jnp.einsum("nks,ns->nk", ohx, table.astype(jnp.float32),
                          precision="highest").astype(jnp.int32)

    def first_state(sym):
        dnb = lut(dnb_t, sym, 256)
        dfs = lut(dfs_t, sym, 256)
        nb = (dnb + (1 << 15)) >> 16
        im = (nb << 16) - dnb
        lu = jnp.clip((im >> jnp.clip(nb, 0, 16)) + dfs, 0, size - 1)
        return lut(st_t, lu, size)

    # L even: s2 <- sym[L-1], s1 <- sym[L-2]; then pairs descending.
    s2 = first_state(b[:, L - 1])
    s1 = first_state(b[:, L - 2])

    # step j processes symbols (L-3-2j, L-4-2j): enc(s2, hi), enc(s1, lo)
    hi = jnp.flip(b[:, 1:L - 2:2], axis=1).T      # (steps, N) sym for s2
    lo = jnp.flip(b[:, 0:L - 2:2], axis=1).T      # (steps, N) sym for s1

    def step(carry, xs):
        s1, s2 = carry
        sym_hi, sym_lo = xs
        d = lut2(dnb_t, sym_hi, sym_lo, 256)
        f = lut2(dfs_t, sym_hi, sym_lo, 256)
        nb2 = (s2 + d[:, 0]) >> 16
        v2 = s2 & ((1 << jnp.clip(nb2, 0, 16)) - 1)
        s2n = lut(st_t, jnp.clip((s2 >> jnp.clip(nb2, 0, 16)) + f[:, 0],
                                 0, size - 1), size)
        nb1 = (s1 + d[:, 1]) >> 16
        v1 = s1 & ((1 << jnp.clip(nb1, 0, 16)) - 1)
        s1n = lut(st_t, jnp.clip((s1 >> jnp.clip(nb1, 0, 16)) + f[:, 1],
                                 0, size - 1), size)
        # one packed item per step: s2 bits first (lower), then s1 bits
        val = v2 | (v1 << jnp.clip(nb2, 0, 16))
        return (s1n, s2n), (val, nb1 + nb2)

    (s1f, s2f), (vals, nbs) = jax.lax.scan(step, (s1, s2), (hi, lo),
                                           unroll=4)
    items_v = vals.T                              # (N, steps) write order
    items_n = nbs.T
    # flush: s2-size (log bits) then s1-size, packed as one item
    fl_v = ((s2f - size) | ((s1f - size) << log))[:, None]
    fl_n = jnp.full((N, 1), 2 * log, jnp.int32)
    steps = items_v.shape[1]
    pad = (-(steps + 1)) % 512
    items_v = jnp.concatenate(
        [items_v, fl_v, jnp.zeros((N, pad), jnp.int32)], axis=1)
    items_n = jnp.concatenate(
        [items_n, fl_n, jnp.zeros((N, pad), jnp.int32)], axis=1)
    cum = jnp.cumsum(items_n, axis=1)
    dest = cum - items_n
    total_bits = cum[:, -1]
    # one item = two state writes (<= 2*log bits): 256-item tiles bound
    # the per-tile span at 256*18/16 + 2 = 290 halves
    halves, n_halves = _bitpack_rows(items_v, items_n, dest, 384,
                                     region_end=(total_bits + 16) >> 4,
                                     T=256)
    return dict(norm=norm, total_bits=total_bits, halves=halves,
                n_halves=n_halves, hist=hist)
