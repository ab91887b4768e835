"""TPU-native S2 block encoder, v2 — no raw gathers anywhere.

Redesign of ops/lz.py guided by measured chip costs (docs/tpu_design_notes.md):
the v1 bottlenecks (XLA gathers in match extension, searchsorted + random
gathers in emission: ~80 ms/block) are replaced by the fast primitives:

1. **Candidates + lengths in one sort**: lexicographic sort of
   (v32, pos) *carrying the next 12 suffix bytes as 3 extra words*; the
   nearest previous equal position is the adjacent sorted row, and the match
   length comes from comparing carried words of adjacent rows — zero
   gathers. L is exact up to 16 (then capped; long runs continue as chained
   ops found at the next positions).
2. **Sort back by position** carrying (candidate, length).
3. **Position-scan parse**: `lax.scan` over the 512 in-tile positions with
   a per-tile "next uncommitted position" state — all updates elementwise.
4. **Emission by scatter-fill**: per-position byte costs -> cumsum gives
   output starts; scatter position indices at their output starts and
   cummax-fill so every output byte knows its op; op fields are fetched via
   MXU one-hot byte-plane matmuls (values <= 255 stay exact in bf16).

Output: valid S2 block bodies (no repeat tags), bit-identical decodable by
the host/reference decoder. ~35x faster than v1 on the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 16
TILE = 512
MAX_OUT_FACTOR_NUM, MAX_OUT_FACTOR_DEN = 3, 2

_SUFFIX_WORDS = 3  # carried 4-byte words -> max match 4 + 12 = 16
L_CAP = 4 + 4 * _SUFFIX_WORDS


def _max_out(bs: int) -> int:
    return bs * MAX_OUT_FACTOR_NUM // MAX_OUT_FACTOR_DEN


def _values(block, bs):
    """v32 with unique tail sentinels + the raw padded byte array."""
    b = jnp.concatenate([block, jnp.zeros(4 + 4 * _SUFFIX_WORDS, jnp.uint8)]).astype(jnp.uint32)
    def w(k):
        return (b[k : bs + k] | (b[k + 1 : bs + k + 1] << 8)
                | (b[k + 2 : bs + k + 2] << 16) | (b[k + 3 : bs + k + 3] << 24))
    v = w(0)
    pos = jnp.arange(bs, dtype=jnp.uint32)
    v32 = jnp.where(pos > bs - 4, pos ^ jnp.uint32(0xDEADBEEF), v)
    words = [w(4 * (k + 1)) for k in range(_SUFFIX_WORDS)]
    return v32, words


def _tz_bytes(x):
    """trailing equal bytes in a 4-byte XOR (0..4), vectorized."""
    return (
        jnp.where((x & 0xFF) == 0, 1, 0)
        + jnp.where((x & 0xFFFF) == 0, 1, 0)
        + jnp.where((x & 0xFFFFFF) == 0, 1, 0)
        + jnp.where(x == 0, 1, 0)
    ).astype(jnp.int32)


def _candidates_lengths(v32, words, bs):
    """(cand, L) per position, via one sort each way."""
    pos = jnp.arange(bs, dtype=jnp.int32)
    sorted_ops = jax.lax.sort((v32, pos, *words), dimension=0, num_keys=2)
    v_s, p_s = sorted_ops[0], sorted_ops[1]
    w_s = sorted_ops[2:]
    same = jnp.concatenate([jnp.array([False]), v_s[1:] == v_s[:-1]])
    cand_s = jnp.where(same, jnp.concatenate([jnp.array([-1], jnp.int32), p_s[:-1]]), -1)
    # match extension from carried words: row k (pos i) vs row k-1 (pos c)
    ext = jnp.zeros(bs, jnp.int32)
    alive = same
    i_s = p_s
    for k, wk in enumerate(w_s):
        prev = jnp.concatenate([wk[:1], wk[:-1]])
        x = wk ^ prev
        eq = _tz_bytes(x)
        # row-side window [i+4k+4, i+4k+8) must be inside the block
        in_range = (i_s + 4 * (k + 1) + 4) <= bs
        eq = jnp.where(in_range, eq, 0)
        ext = ext + jnp.where(alive, eq, 0)
        alive = alive & (eq == 4) & in_range
    L_s = jnp.where(same, 4 + ext, 0)
    # back to position order, carrying (cand, L)
    _, cand, L = jax.lax.sort((p_s, cand_s, L_s), dimension=0, num_keys=1)
    L = jnp.minimum(L, bs - pos)
    L = jnp.where(cand >= 0, L, 0)
    L = jnp.where(L >= 4, L, 0)
    return jnp.where(L > 0, pos - jnp.maximum(cand, 0), 0), L


L_EMIT_CAP = 64  # one copy2 tag's worth


def _rle_lengths(block, bs):
    """Exact run-match lengths for small offsets (shift-compare, no gather).

    Catches the long matches the 16-byte sort cap misses (zeros, periodic
    data): for each offset o, L[i] = length of byte agreement between
    positions i.. and (i-o)..; valid when >= 4."""
    best_L = jnp.zeros(bs, jnp.int32)
    best_off = jnp.zeros(bs, jnp.int32)
    idx = jnp.arange(bs, dtype=jnp.int32)
    bi = block.astype(jnp.int32)
    for o in (1, 2, 3, 4, 8):
        m = jnp.concatenate([jnp.zeros(o, bool), bi[o:] == bi[:-o]])
        mismatch_at = jnp.where(m, bs, idx)
        next_mm = jax.lax.cummin(mismatch_at, axis=0, reverse=True)
        L = jnp.where(m, next_mm - idx, 0)
        better = L > best_L  # offsets probed small-to-large: ties keep small o
        best_L = jnp.where(better, L, best_L)
        best_off = jnp.where(better, o, best_off)
    best_L = jnp.where(best_L >= 4, best_L, 0)
    return best_off, best_L


def _parse(off, L, bs, tile):
    """Position-scan greedy parse over per-position (offset, length)."""
    n_tiles = bs // tile
    i = jnp.arange(bs, dtype=jnp.int32)
    r = i % tile
    L_t = jnp.minimum(jnp.minimum(L, tile - r), L_EMIT_CAP)
    valid = (L_t >= 4)
    off = jnp.where(valid, off, 0)

    v_t = valid.reshape(n_tiles, tile).T  # (tile, n_tiles)
    L_tt = L_t.reshape(n_tiles, tile).T

    def step(p, xs):
        v_r, L_r, r_idx = xs
        active = p == r_idx
        take = active & v_r
        p_next = jnp.where(take, r_idx + L_r, jnp.where(active, p + 1, p))
        lit = active & ~v_r
        return p_next, (take, lit)

    r_steps = jnp.arange(tile, dtype=jnp.int32)
    _, (take_t, lit_t) = jax.lax.scan(
        step, jnp.zeros(n_tiles, jnp.int32), (v_t, L_tt, r_steps)
    )
    take = take_t.T.reshape(-1)
    lit = lit_t.T.reshape(-1)
    return take, lit, L_t, off


def _emit_batched(blocks, take, lit, L_t, off, bs, tile):
    """Scatter-fill emission over the whole batch (NB leading axis).

    Batched einsums keep the one-hot gathers fused (a vmapped form makes XLA
    materialize (NB, out, 256) one-hots and OOM)."""
    nb = blocks.shape[0]
    n_tiles = bs // tile
    i = jnp.arange(bs, dtype=jnp.int32)[None, :]
    r = i % tile

    # literal run lengths at run starts (runs are tile-local by construction)
    lit_tl = lit.reshape(nb, n_tiles, tile)
    rr = jnp.arange(tile, dtype=jnp.int32)
    nz = jnp.where(~lit_tl, rr[None, None, :], tile)
    next_nonlit = jax.lax.cummin(nz, axis=2, reverse=True)
    run_len_full = (next_nonlit - rr[None, None, :]).reshape(nb, bs)
    prev_lit = jnp.concatenate([jnp.zeros((nb, 1), bool), lit[:, :-1]], axis=1) & (r > 0)
    lit_start = lit & ~prev_lit
    run_len = jnp.where(lit_start, run_len_full, 0)

    # per-position costs
    lit_hl = jnp.where(lit_start, 1 + (run_len > 60) + (run_len > 256), 0)
    lit_cost = lit_hl + run_len
    c1 = (off < 2048) & (L_t <= 11)
    m_hl = jnp.where(take, jnp.where(c1, 2, 3), 0)
    cost = jnp.where(lit_start, lit_cost, 0) + m_hl

    ends = jnp.cumsum(cost, axis=1)
    starts = ends - cost
    total = ends[:, -1]

    max_out = _max_out(bs)
    is_op = lit_start | take
    idx_target = jnp.where(is_op, jnp.minimum(starts, max_out - 1), max_out - 1)
    marker = jnp.full((nb, max_out), -1, jnp.int32).at[
        jnp.arange(nb)[:, None], idx_target
    ].max(jnp.where(is_op, i, -1))
    op_pos = jnp.maximum(jax.lax.cummax(marker, axis=1), 0)

    length_f = jnp.where(lit_start, run_len, jnp.where(take, L_t, 0))
    planes = jnp.stack([
        length_f & 0xFF,
        (length_f >> 8) | (jnp.where(take, 1, 0) << 2),  # bits0-1 len hi, bit2 match
        off & 0xFF,
        off >> 8,
        starts & 0xFF,
        (starts >> 8) & 0xFF,
        starts >> 16,
    ], axis=1)  # (nb, 7, bs)

    lo_n = bs // 256
    hi = op_pos // lo_n
    lo = op_pos % lo_n
    oh_hi = jax.nn.one_hot(hi, 256, dtype=jnp.bfloat16)       # (nb, out, 256)
    oh_lo = jax.nn.one_hot(lo, lo_n, dtype=jnp.bfloat16)      # (nb, out, lo_n)
    t2 = planes.reshape(nb, 7, 256, lo_n).astype(jnp.bfloat16)
    rows = jnp.einsum("noh,nfhc->nfoc", oh_hi, t2)             # (nb, 7, out, lo_n)
    vals = jnp.einsum("nfoc,noc->nfo", rows, oh_lo).astype(jnp.int32)
    a0, a1, b0, b1, s0, s1, s2_ = [vals[:, k] for k in range(7)]

    o = jnp.arange(max_out, dtype=jnp.int32)[None, :]
    op_start = s0 | (s1 << 8) | (s2_ << 16)
    q = o - op_start
    length_g = (a0 | ((a1 & 3) << 8)).astype(jnp.int32)
    is_match = (a1 >> 2) & 1
    off_g = b0 | (b1 << 8)

    xg = jnp.maximum(length_g - 1, 0)
    l_hl = 1 + (length_g > 60) + (length_g > 256)
    lh = jnp.where(
        q == 0,
        jnp.where(length_g <= 60, xg << 2, jnp.where(length_g <= 256, 240, 244)),
        jnp.where(q == 1, xg & 0xFF, xg >> 8),
    )
    c1g = (off_g < 2048) & (length_g <= 11)
    mh = jnp.where(
        q == 0,
        jnp.where(c1g, ((off_g >> 8) << 5) | (jnp.maximum(length_g - 4, 0) << 2) | 1,
                  (jnp.maximum(length_g - 1, 0) << 2) | 2),
        jnp.where(q == 1, off_g & 0xFF, off_g >> 8),
    )
    pay_idx = jnp.clip(op_pos + q - l_hl, 0, bs - 1)
    phi = pay_idx // lo_n
    plo = pay_idx % lo_n
    blk2 = blocks.reshape(nb, 256, lo_n).astype(jnp.bfloat16)
    prow = jnp.einsum("noh,nhc->noc", jax.nn.one_hot(phi, 256, dtype=jnp.bfloat16), blk2)
    payload = jnp.einsum("noc,noc->no", prow,
                         jax.nn.one_hot(plo, lo_n, dtype=jnp.bfloat16)).astype(jnp.int32)
    lit_byte = jnp.where(q < l_hl, lh, payload)
    byte = jnp.where(is_match == 1, mh, lit_byte)
    byte = jnp.where(o < total[:, None], byte, 0)
    return byte.astype(jnp.uint8), total


def _find_parse(block, bs, tile):
    v32, words = _values(block, bs)
    off_s, L_s = _candidates_lengths(v32, words, bs)
    off_r, L_r = _rle_lengths(block, bs)
    use_r = L_r > L_s
    off = jnp.where(use_r, off_r, off_s)
    L = jnp.where(use_r, L_r, L_s)
    return _parse(off, L, bs, tile)


@functools.partial(jax.jit, static_argnames=("tile",))
def s2_encode_blocks(blocks, tile: int = TILE):
    """v2 device encoder: (NB, block_size) uint8 -> (out, lens)."""
    bs = blocks.shape[-1]
    take, lit, L_t, off = jax.vmap(lambda b: _find_parse(b, bs, tile))(blocks)
    return _emit_batched(blocks, take, lit, L_t, off, bs, tile)


MAX_LAUNCH_BLOCKS = 256  # larger batches make XLA materialize the one-hots


def encode_blocks_np(data: bytes):
    """Host wrapper: chunked launches of at most MAX_LAUNCH_BLOCKS."""
    n = len(data)
    assert n % B == 0 and n > 0
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, B)
    bodies = []
    for c in range(0, arr.shape[0], MAX_LAUNCH_BLOCKS):
        chunk = arr[c : c + MAX_LAUNCH_BLOCKS]
        out, lens = s2_encode_blocks(jnp.asarray(chunk))
        out = np.asarray(out)
        lens = np.asarray(lens)
        bodies += [out[i, : lens[i]] for i in range(chunk.shape[0])]
    return bodies
