"""Pallas TPU match-finder kernel — the device "assembly tier".

Replaces the XLA `jax.lax.sort` match finder of ops/lz2.py (measured 69 ms
of 123 ms per 16 MB on chip) with a fused per-block VMEM-resident bitonic
2-sort kernel.  Role parity: the reference's hand-written encoder asm
(`s2/encodeblock_amd64.s:1`, `zstd/enc_fast.go:9` hash loops) — re-designed
for the TPU memory hierarchy instead of translated: the sequential hash
table becomes two in-VMEM bitonic sorts (exact nearest-previous-equal
candidates, better match quality than the reference's 1-way table), with
match lengths from sort-carried suffix bytes + chain extension.

Per 64 KiB block, entirely in VMEM as (512,128) int32 panels:
  1. prep: v32 4-gram words + carried suffix bytes (b4..b9) — elementwise.
  2. forward bitonic sort of (key=v32, p1=pos|b4|b5, p2=b6..b9),
     lexicographic (v32, pos): 136 compare-exchange stages.  Lane-XOR
     partners (stage stride < 128) use a static `take_along_axis` lane
     shuffle; row-XOR partners use two `pltpu.roll`s + select.
  3. adjacency: candidate = previous sorted element when keys equal;
     L = 4 + matching carried suffix bytes (cap 10).  Tail sentinels make
     the last 3 positions unmatchable from either side (bit-exactness).
  4. backward bitonic sort by pos carrying packed (off | L<<16).

Output: (off, L) panels in position order, consumed by the existing parse
/ emission pipeline (ops/lz2.py) and the zstd job encoder (ops/zdev.py).

Measured VMEM throughput basis: compare-exchange step ~135 ns for
key+payload on (512,128) (docs/chip_sweep_results.md r4 probes), i.e.
~25-35 us per sort vs ~140 us for the XLA sort per block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 128
BS = ROWS * LANES  # 64 KiB block
L_CAP = 10         # 4-byte seed + 6 carried suffix bytes

_SENT_BASE = BS - 3  # positions >= this hold tail sentinels


def _giota():
    r = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return r * LANES + c


def _shift_down1(x):
    """prev[g] = x[g-1] in flattened order (wraps at g=0; caller masks)."""
    pl_ = pltpu.roll(x, 1, 1)
    pr = pltpu.roll(pl_, 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return jnp.where(lane == 0, pr, pl_)


def _shift_up(x, k):
    """nxt[g] = x[g+k] for 1 <= k < 128 (wraps at the end; caller masks)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    a = pltpu.roll(x, LANES - k, 1)
    b = pltpu.roll(a, ROWS - 1, 0)
    return jnp.where(lane < LANES - k, a, b)


def _bitonic_refs(key_ref, p_refs, g, sec_of=None, log_n=16):
    """In-place bitonic sort over VMEM scratch refs.

    Structure chosen by two measured Mosaic constraints: a fully unrolled
    network stack-OOMs (no slot reuse across 272 straight-line stages),
    and traced-shift rolls cost ~9x a static roll (log-step dynamic
    rotate).  So: fori_loop over the k phase (buffers reused), with the
    j sub-stages statically unrolled inside and predicated by
    pl.when(j < k) — static shifts, 16x16 padded schedule, 136 stages
    actually executed.

    sec_of: optional fn(key, payloads) -> secondary compare value for
    lexicographic (key, sec) ordering.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)

    def stage(k, j):
        d = 1 << j
        if j < 7:
            lidx = lane ^ d

            def partner(a):
                return jnp.take_along_axis(a, lidx, axis=1)
        else:
            rd = d >> 7
            up = (row & rd) == 0

            def partner(a):
                fwd = pltpu.roll(a, ROWS - rd, 0)
                bwd = pltpu.roll(a, rd, 0)
                return jnp.where(up, fwd, bwd)

        key = key_ref[:]
        payloads = [p[:] for p in p_refs]
        pkey = partner(key)
        pps = [partner(p) for p in payloads]
        asc = (jax.lax.shift_right_logical(g, k) & 1) == 0
        lower = (g & d) == 0
        want_min = lower == asc
        # (key, sec) is a strict total order (sec embeds the unique pos),
        # so p_greater == ~p_less and swap = (p_less == want_min).
        if sec_of is not None:
            ms = sec_of(key, payloads)
            ps = sec_of(pkey, pps)
            p_less = (pkey < key) | ((pkey == key) & (ps < ms))
        else:
            p_less = pkey < key
        swap = p_less == want_min
        key_ref[:] = jnp.where(swap, pkey, key)
        for p, pp, pref in zip(payloads, pps, p_refs):
            pref[:] = jnp.where(swap, pp, p)

    # Three loops so pl.when padding stays small (predicated slots are
    # not free): lane phases k<=7 (28/49 active), row sub-stages of the
    # big phases (45/81 active), then the unconditional lane tail of the
    # big phases (63 active, no predicate).
    def phase_a(k, _):
        for j in range(6, -1, -1):
            @pl.when(j < k)
            def _s(j=j):
                stage(k, j)
        return 0

    def phase_b1(k, _):
        for j in range(log_n - 1, 6, -1):
            @pl.when(j < k)
            def _s(j=j):
                stage(k, j)
        return 0

    def phase_b2(k, _):
        for j in range(6, -1, -1):
            stage(k, j)
        return 0

    jax.lax.fori_loop(1, 8, phase_a, 0)

    def phase_b(k, _):
        phase_b1(k, None)
        phase_b2(k, None)
        return 0

    jax.lax.fori_loop(8, log_n + 1, phase_b, 0)


def _finder_body(blk_i32, key_ref, p1_ref, p2_ref=None):
    """blk_i32: (ROWS, LANES) int32 byte values. Returns (off, L) panels.

    p2_ref=None is the SLIM variant: the forward sort carries only
    (key, p1) — one panel less of compare-exchange traffic — at suffix
    cap 6 instead of 10 (chain extension downstream must use cap 6)."""
    g = _giota()

    # byte shift helper: byte at g+k
    def b(k):
        return _shift_up(blk_i32, k) if k else blk_i32

    b1, b2, b3 = b(1), b(2), b(3)
    v32 = blk_i32 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    # tail sentinels: unique keys for the last 3 positions (no 4-gram).
    # False key-collisions with real v32s are killed by the cand/pos range
    # checks below, so uniqueness here is only a quality nicety.
    key_ref[:] = jnp.where(g >= _SENT_BASE, g ^ jnp.int32(0x5A5A5A5A), v32)
    p1_ref[:] = g | (b(4) << 16) | (b(5) << 24)
    if p2_ref is not None:
        p2_ref[:] = b(6) | (b(7) << 8) | (b(8) << 16) | (b(9) << 24)

    sec = lambda k_, ps: ps[0] & 0xFFFF  # lexicographic (v32, pos)

    payloads = [p1_ref] if p2_ref is None else [p1_ref, p2_ref]
    _bitonic_refs(key_ref, payloads, g, sec_of=sec)
    key_s, p1_s = key_ref[:], p1_ref[:]
    p2_s = p2_ref[:] if p2_ref is not None else None

    # adjacency in sorted order
    pk = _shift_down1(key_s)
    pp1 = _shift_down1(p1_s)
    pp2 = _shift_down1(p2_s) if p2_ref is not None else None
    pos_s = p1_s & 0xFFFF
    cand = pp1 & 0xFFFF
    same = (pk == key_s) & (g > 0) & (cand < pos_s)
    # kill any pair touching sentinel positions
    same &= (pos_s < _SENT_BASE) & (cand < _SENT_BASE)

    # suffix match length: bytes 4..9 carried in (p1>>16..), p2
    def sfx(p1v, p2v, k):
        if k < 2:
            return (p1v >> (16 + 8 * k)) & 0xFF
        return (p2v >> (8 * (k - 2))) & 0xFF

    ext = jnp.zeros((ROWS, LANES), jnp.int32)
    alive = same
    for k in range(2 if p2_ref is None else 6):
        eq = sfx(p1_s, p2_s, k) == sfx(pp1, pp2, k)
        alive = alive & eq
        ext = ext + alive.astype(jnp.int32)
    L_s = jnp.where(same, 4 + ext, 0)
    off_s = jnp.where(same, pos_s - cand, 0)

    # back-sort by pos carrying packed (off | L<<16); pos is a permutation
    key_ref[:] = pos_s
    p1_ref[:] = off_s | (L_s << 16)
    _bitonic_refs(key_ref, [p1_ref], g)
    packed_o = p1_ref[:]
    off = packed_o & 0xFFFF
    L = packed_o >> 16
    # tail cap: L <= BS - pos
    L = jnp.minimum(L, BS - g)
    L = jnp.where(L >= 4, L, 0)
    off = jnp.where(L > 0, off, 0)
    return off, L


def _finder_kernel(blk_ref, off_ref, len_ref, key_s, p1_s, p2_s):
    blk = blk_ref[0].astype(jnp.int32)
    off, L = _finder_body(blk, key_s, p1_s, p2_s)
    off_ref[0] = off
    len_ref[0] = L


def _finder_kernel_slim(blk_ref, off_ref, len_ref, key_s, p1_s):
    blk = blk_ref[0].astype(jnp.int32)
    off, L = _finder_body(blk, key_s, p1_s, None)
    off_ref[0] = off
    len_ref[0] = L


@functools.partial(jax.jit, static_argnames=("interpret", "slim"))
def find_matches_blocks(blocks_u8, interpret: bool = False,
                        slim: bool = False):
    """(NB, 65536) uint8 -> (off, L) each (NB, 65536) int32.

    off/L semantics match ops/lz2.py's sort finder: exact
    nearest-previous-equal 4-gram candidate, L in [4, 10] (chain-extended
    downstream), 0 where no match.  slim=True carries one payload panel
    less through the forward sort (suffix cap 6 — consumers must chain-
    extend at cap 6): ~25% less compare-exchange traffic.
    """
    nb = blocks_u8.shape[0]
    blk3 = blocks_u8.reshape(nb, ROWS, LANES)
    off, L = pl.pallas_call(
        _finder_kernel_slim if slim else _finder_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)
                        for _ in range(2 if slim else 3)],
        interpret=interpret,
    )(blk3)
    return off.reshape(nb, BS), L.reshape(nb, BS)
