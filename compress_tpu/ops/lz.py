"""TPU-native S2/Snappy block encoder.

This is the device-side answer to the reference's hand-written encode
assembly (s2/encodeblock_amd64.s, 21k lines — SURVEY.md §2.10): instead of
a sequential hash-table loop, the whole block is encoded as data-parallel
array ops that XLA maps onto the VPU:

1. **Exact candidate search by sort** (replaces the mutable hash table):
   lexicographic sort of (4-byte value, position) gives every position its
   nearest previous position with an identical 4-byte prefix — *better*
   candidates than the reference's lossy 14-bit table, with no sequential
   table writes.
2. **Vectorized match extension**: 15 rounds of 4-byte gather-compare with a
   carried "still equal" mask (the XOR+ctz trick across all positions at
   once), capped at 64 (one tag's worth).
3. **Tiled greedy parse**: the block is cut into 512-byte tiles; a
   `lax.scan` walks each tile's (literal-run, match) pairs with all tiles
   advancing in lockstep — parallelism across tiles, greedy semantics inside.
   Matches never cross a tile boundary (bounded ratio cost); offsets span
   the whole block.
4. **Gather-based emission**: per-op byte costs -> exclusive scan -> each
   output byte finds its op by binary search and computes itself. No
   scatter, no dynamic shapes.

The output is a bit-valid S2/Snappy block body (uvarint preamble added by
the host wrapper) decodable by the reference decoder; it differs from the
host encoder's bytes (both valid; the reference makes the same non-promise
across its own versions).

Block size is fixed at 64 KiB so every offset fits copy1/copy2 tags; larger
inputs stream as independent 64 KiB frame chunks and batch along the leading
axis (that batch axis is also the mesh-sharding axis, see
compress_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

B = 1 << 16  # default device block size
TILE = 512  # default parse tile
MAX_OUT = B + B // 2  # safe upper bound for the default config

_EXT_ROUNDS = 15  # 4 + 15*4 = 64 max match length


def _derived(block_size: int, tile: int):
    n_tiles = block_size // tile
    s_max = tile // 4 + 1
    max_out = block_size + block_size // 2
    return n_tiles, s_max, max_out


def _u32_values(block, bs):
    """v32[i] = LE 4-byte value at i; positions past bs-4 get unique sentinels

    (cannot match anything, so they never become candidates)."""
    b = jnp.concatenate([block, jnp.zeros(4, jnp.uint8)]).astype(jnp.uint32)
    v = b[:bs] | (b[1 : bs + 1] << 8) | (b[2 : bs + 2] << 16) | (b[3 : bs + 3] << 24)
    pos = jnp.arange(bs, dtype=jnp.uint32)
    # unique, distinct-from-data sentinel stream for the tail positions
    return jnp.where(pos > bs - 4, pos ^ jnp.uint32(0xDEADBEEF), v)


def _candidates(v32, bs):
    """Nearest previous position with identical 4-byte value, else -1."""
    pos = jnp.arange(bs, dtype=jnp.int32)
    v_sorted, p_sorted = jax.lax.sort((v32, pos), dimension=0, num_keys=2)
    same = jnp.concatenate(
        [jnp.array([False]), v_sorted[1:] == v_sorted[:-1]]
    )
    prev = jnp.concatenate([jnp.array([-1], jnp.int32), p_sorted[:-1]])
    cand_sorted = jnp.where(same, prev, -1)
    return jnp.zeros(bs, jnp.int32).at[p_sorted].set(cand_sorted)


def _match_lengths(block, v32, cand, bs):
    """L[i] = match length between i and cand[i] (0 if no candidate),

    capped at 64 and at the block end."""
    has = cand >= 0
    c = jnp.maximum(cand, 0)
    i = jnp.arange(bs, dtype=jnp.int32)

    def round_fn(carry, k):
        L, alive = carry
        off = 4 + 4 * k
        ia = jnp.minimum(c + off, bs - 4)
        ib = jnp.minimum(i + off, bs - 4)
        va = v32[ia]
        vb = v32[ib]
        x = va ^ vb
        # trailing equal bytes of the 4-byte compare
        eq = (
            jnp.where((x & 0xFF) == 0, 1, 0)
            + jnp.where((x & 0xFFFF) == 0, 1, 0)
            + jnp.where((x & 0xFFFFFF) == 0, 1, 0)
            + jnp.where(x == 0, 1, 0)
        ).astype(jnp.int32)
        in_range = (i + off + 4) <= bs  # whole 4-byte window inside block
        eq = jnp.where(in_range, eq, 0)
        L = L + jnp.where(alive, eq, 0)
        alive = alive & (eq == 4)
        return (L, alive), None

    (ext, _), _ = jax.lax.scan(
        round_fn,
        (jnp.zeros(bs, jnp.int32), has),
        jnp.arange(_EXT_ROUNDS, dtype=jnp.int32),
    )
    L = jnp.where(has, 4 + ext, 0)
    L = jnp.minimum(L, 64)
    L = jnp.minimum(L, bs - i)
    return jnp.where(has, L, 0)


def _parse(cand, L, bs, tile):
    """Tiled greedy parse -> per-op arrays in emission order."""
    n_tiles, s_max, _ = _derived(bs, tile)
    i = jnp.arange(bs, dtype=jnp.int32)
    r = i % tile
    tile_end_room = tile - r
    L_t = jnp.minimum(L, tile_end_room)
    off = i - cand
    valid = (L_t >= 4) & (cand >= 0)

    # next valid match at or after r, per tile
    idx_in_tile = jnp.where(valid, r, tile).reshape(n_tiles, tile)
    nm = jax.lax.cummin(idx_in_tile, axis=1, reverse=True)  # (n_tiles, tile)
    L_tl = L_t.reshape(n_tiles, tile)
    off_tl = off.reshape(n_tiles, tile)
    tile_base = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)

    def step(p, _):
        pc = jnp.minimum(p, tile - 1)
        j = jnp.take_along_axis(nm, pc[:, None], axis=1)[:, 0]
        j = jnp.where(p < tile, j, tile)
        lit_len = jnp.minimum(j, tile) - jnp.minimum(p, tile)
        has_m = j < tile
        jc = jnp.minimum(j, tile - 1)
        mlen = jnp.where(has_m, jnp.take_along_axis(L_tl, jc[:, None], axis=1)[:, 0], 0)
        moff = jnp.where(has_m, jnp.take_along_axis(off_tl, jc[:, None], axis=1)[:, 0], 0)
        lit_src = tile_base + jnp.minimum(p, tile)
        p_next = jnp.where(has_m, j + mlen, tile)
        return p_next, (lit_src, lit_len, mlen, moff)

    _, (lit_src, lit_len, mlen, moff) = jax.lax.scan(
        step, jnp.zeros(n_tiles, jnp.int32), None, length=s_max
    )
    # (S_MAX, N_TILES) -> tile-major op order
    tr = lambda x: x.T.reshape(-1)
    return tr(lit_src), tr(lit_len), tr(mlen), tr(moff)


def _emit(block, lit_src, lit_len, mlen, moff, bs):
    """Interleave (lit, match) ops, cost, scan, and gather-emit bytes."""
    n = lit_len.shape[0]
    max_out = bs + bs // 2

    # literal headers
    x = jnp.maximum(lit_len - 1, 0)
    lit_hl = jnp.where(lit_len == 0, 0, 1 + (lit_len > 60) + (lit_len > 256))
    lh0 = jnp.where(lit_len <= 60, x << 2, jnp.where(lit_len <= 256, 240, 244))
    lh1 = jnp.where(lit_len <= 256, x & 0xFF, x & 0xFF)
    lh2 = x >> 8
    lit_cost = lit_hl + lit_len

    # match headers (copy1 if possible else copy2)
    c1 = (moff < 2048) & (mlen <= 11)
    m_hl = jnp.where(mlen == 0, 0, jnp.where(c1, 2, 3))
    mh0 = jnp.where(
        c1,
        ((moff >> 8) << 5) | (jnp.maximum(mlen - 4, 0) << 2) | 1,
        (jnp.maximum(mlen - 1, 0) << 2) | 2,
    )
    mh1 = moff & 0xFF
    mh2 = moff >> 8

    # interleave: even slots literal, odd slots match
    def ilv(a, b):
        return jnp.stack([a, b], axis=1).reshape(-1)

    cost = ilv(lit_cost, jnp.where(mlen == 0, 0, m_hl))
    hl = ilv(lit_hl, m_hl)
    h0 = ilv(lh0, mh0)
    h1 = ilv(lh1, mh1)
    h2 = ilv(lh2, mh2)
    src = ilv(lit_src, jnp.zeros_like(lit_src))

    ends = jnp.cumsum(cost)
    total = ends[-1]
    starts = ends - cost

    o = jnp.arange(max_out, dtype=jnp.int32)
    k = jnp.searchsorted(starts, o, side="right") - 1
    k = jnp.clip(k, 0, 2 * n - 1)
    q = o - starts[k]
    hdr = jnp.where(q == 0, h0[k], jnp.where(q == 1, h1[k], h2[k]))
    pay_idx = jnp.clip(src[k] + q - hl[k], 0, bs - 1)
    byte = jnp.where(q < hl[k], hdr, block[pay_idx].astype(jnp.int32))
    byte = jnp.where(o < total, byte, 0)
    return byte.astype(jnp.uint8), total


def _encode_one(block, bs, tile):
    v32 = _u32_values(block, bs)
    cand = _candidates(v32, bs)
    L = _match_lengths(block, v32, cand, bs)
    lit_src, lit_len, mlen, moff = _parse(cand, L, bs, tile)
    return _emit(block, lit_src, lit_len, mlen, moff, bs)


@functools.partial(jax.jit, static_argnames=("tile",))
def s2_encode_blocks(blocks, tile: int = TILE):
    """Encode a batch of blocks on device.

    blocks: (NB, block_size) uint8 (block_size <= 65536 so offsets fit
    copy1/copy2 tags; a power of two divisible by `tile`).
    Returns (out, lens): (NB, block_size*3//2) uint8 bodies + int32 lengths.
    """
    bs = blocks.shape[-1]
    return jax.vmap(lambda b: _encode_one(b, bs, tile))(blocks)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def encode_blocks_np(data: bytes):
    """Encode len-multiple-of-64K data on the default device; returns a list

    of S2 block bodies (one per 64 KiB chunk), as numpy arrays."""
    n = len(data)
    assert n % B == 0 and n > 0
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, B)
    out, lens = s2_encode_blocks(jnp.asarray(arr))
    out = np.asarray(out)
    lens = np.asarray(lens)
    return [out[i, : lens[i]] for i in range(arr.shape[0])]
