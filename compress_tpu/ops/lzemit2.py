"""Pallas TPU S2 parse+emit kernel v2 — pointer-doubling greedy parse.

Drop-in replacement for ops/lzemit.py's emit kernel. The v1 kernel's
greedy parse ran a 512-step serial fori_loop over (1,128) rows plus eight
128x128 transposes; v2 computes the identical greedy parse with ~27
dynamic lane gathers (measured 362 ns each on chip) via pointer doubling,
entirely in the natural (512,128) layout:

  1. nxt[p] = p + L_t (match) or p + 1 (literal), capped at the 512-tile.
  2. Per natural row (= 128 consecutive positions), doubling tables
     f_k[x] = position after 2^k greedy steps, saturating once the walk
     exits the row.  7 compositions -> full-row exit map.
  3. Tile chaining: each 512-tile is 4 natural rows; 4 serial gather
     steps thread the parse cursor through them.
  4. Orbit enumeration: lane t of each row holds f^t(entry) — the t-th
     visited position — via binary decomposition of t (7 gathers).
  5. Membership: the orbit is strictly increasing, so each position
     binary-searches it (7 gathers) to learn visited/take/lit.

Identical outputs to lzemit.emit_blocks (differential-tested); the
emission bytes/route logic is shared unchanged in spirit but h-bytes are
packed into two words so the output route gathers 2 words instead of 7
bytes.  Role parity: `s2/encodeblock_amd64.s:1` emit fragments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compress_tpu.ops.lzemit import (ROWS, LANES, BS, TILE, NT, ROW_OUT,
                                     _iota2, _shift_down, _shift_up_pow,
                                     _shift_up_any, _chain_ext10,
                                     _runlen_fwd, _lane_cumsum_excl,
                                     _lane_scan_rev, _tile_reduce_max,
                                     _tile_first, _per_pos, assemble_bodies)

CHUNK = 128  # one natural row of the panel


def _gather_lane(x, idx):
    """take_along_axis along lanes with a clamped dynamic index."""
    return jnp.take_along_axis(x, jnp.clip(idx, 0, LANES - 1), axis=1)


def _parse_doubling(valid, L_t, rowi, lane):
    """Greedy tile parse via pointer doubling. Returns (take, lit) bool
    panels, bit-identical to lzemit's 512-step scan."""
    c = rowi & 3                       # row-in-tile 0..3
    base = c * CHUNK                   # in-tile base of this row
    r_t = base + lane                  # in-tile position 0..511
    nxt = jnp.where(valid, r_t + L_t, r_t + 1)   # values in (r_t, 512]

    # doubling tables: f_k[x- base] = in-tile position after 2^k steps,
    # frozen once the walk leaves this row
    def compose(f):
        tgt = _gather_lane(f, f - base)
        return jnp.where(f >= base + CHUNK, f, tgt)

    fs = [nxt]
    for _ in range(6):
        fs.append(compose(fs[-1]))
    exitmap = compose(fs[-1])          # f^128: always >= base + CHUNK

    # tile chaining: 128 tiles (one per sub-row group); exit map of row c
    # for tile t lives at panel row 4t + c
    e = jnp.zeros((NT, LANES), jnp.int32)  # broadcast cursor per tile
    entries = []
    ex3 = exitmap.reshape(NT, 4, LANES)
    for cc in range(4):
        entries.append(e)
        ec = ex3[:, cc, :]
        stepped = _gather_lane(ec, e - cc * CHUNK)
        e = jnp.where(e < (cc + 1) * CHUNK, stepped, e)
    entry_nat = jnp.stack(entries, axis=1).reshape(ROWS, LANES)

    # orbit: lane t = f^t(entry) (strictly increasing until saturation)
    x = entry_nat
    for k in range(7):
        fx = jnp.where(x >= base + CHUNK, x, _gather_lane(fs[k], x - base))
        x = jnp.where((lane >> k) & 1 > 0, fx, x)
    orbit = x

    # membership: binary-search the sorted orbit for this lane's position
    idx = jnp.zeros((ROWS, LANES), jnp.int32)
    for k in range(6, -1, -1):
        cand = idx + (1 << k)
        cv = _gather_lane(orbit, cand)
        ok = (cand <= LANES - 1) & (cv <= r_t)
        idx = jnp.where(ok, cand, idx)
    visited = _gather_lane(orbit, idx) == r_t
    take = visited & valid
    lit = visited & ~valid
    return take, lit


def _emit_kernel2(blk_ref, off_ref, len_ref, out0_ref, out1_ref, rl_ref,
                  *, cap=10):
    blk = blk_ref[0].astype(jnp.int32)
    off = off_ref[0]
    L = len_ref[0]
    rowi, lane = _iota2()
    g = rowi * LANES + lane
    r_t = g & (TILE - 1)

    # ---- A0. chain extension at the finder's suffix cap -------------------
    L = _chain_ext10(off, L, g, cap=cap)

    # ---- A. short-offset rle probes ---------------------------------------
    for o in (1, 2, 3, 4, 8):
        m = (blk == _shift_down(blk, o)) & (g >= o)
        Lr = _runlen_fwd(m.astype(jnp.int32), r_t)
        better = (Lr > L) & (Lr >= 4)
        L = jnp.where(better, Lr, L)
        off = jnp.where(better, o, off)

    # ---- B. greedy tile parse via pointer doubling ------------------------
    L_t = jnp.minimum(L, TILE - r_t)
    valid = L_t >= 4
    off = jnp.where(valid, off, 0)
    take, lit = _parse_doubling(valid, L_t, rowi, lane)

    # ---- C. cross-tile chain merge (identical to lzemit v1) ---------------
    ends_at_end = take & ((r_t + L_t) == TILE)
    eoff = _tile_reduce_max(jnp.where(ends_at_end, off, -1), -1)
    epos = _tile_reduce_max(jnp.where(ends_at_end, r_t, -1), -1)
    op0 = _tile_first(take.astype(jnp.int32)) > 0
    off0 = _tile_first(off)
    L0 = _tile_first(L_t)
    full = op0 & (L0 == TILE)
    tl = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    prev_eoff = jnp.where(tl >= 1, pltpu.roll(eoff, 1, 1), -1)
    a_t = op0 & (off0 == prev_eoff) & (prev_eoff > 0)
    c_t = a_t & full
    term_at = jnp.where(~c_t, tl, NT)
    k_term = _lane_scan_rev(term_at, jnp.minimum, NT)
    # terminal-tile length gated by a_t — see ops/lzemit.py (crafted-input
    # differential test tests/test_lzemit.py::test_merge_terminal_gate)
    packed = jnp.where(~c_t, ((NT - 1 - tl) << 10)
                       | jnp.where(a_t, jnp.minimum(L0, 1023), 0), -1)
    filled = _lane_scan_rev(packed, jnp.maximum, -1)
    L_term = jnp.where(filled >= 0, filled & 1023, 0)

    def nxt2(x, fill):
        return jnp.where(tl < NT - 1, pltpu.roll(x, LANES - 1, 1), fill)

    links = nxt2(k_term, NT) - (tl + 1)
    W = links * TILE + nxt2(L_term, 0)
    next_absorbed = nxt2(a_t.astype(jnp.int32), 0) > 0
    is_recv = next_absorbed & ~c_t
    receiver = ends_at_end & (_per_pos(is_recv.astype(jnp.int32)) > 0) \
        & (r_t == _per_pos(epos))
    addW = jnp.where(receiver, _per_pos(W), 0)
    absorbed = (_per_pos(a_t.astype(jnp.int32)) > 0) & (r_t == 0)
    take = take & ~absorbed
    L2 = L_t + addW

    # ---- D. emission (h-bytes packed into two words) ----------------------
    prev_lit = _shift_down(lit.astype(jnp.int32), 1) > 0
    prev_lit = prev_lit & (r_t > 0)
    lit_start = lit & ~prev_lit
    run_full = _runlen_fwd(lit.astype(jnp.int32), r_t)
    run_len = jnp.where(lit_start, run_full, 0)

    x = run_len - 1
    lit_hl = jnp.where(lit_start,
                       1 + (run_len > 60).astype(jnp.int32)
                       + (run_len > 256).astype(jnp.int32), 0)
    l1 = jnp.where(L2 >= 68, 64, jnp.where(L2 >= 65, L2 - 4, L2))
    l2 = L2 - l1
    c1 = (off < 2048) & (l1 <= 11)
    p1h = jnp.where(c1, 2, 3)
    r_hl = jnp.where(l2 == 0, 0,
                     jnp.where(l2 <= 8, 2, jnp.where(l2 <= 263, 3, 4)))
    m_hl = jnp.where(take, p1h + r_hl, 0)
    hl = lit_hl + m_hl
    outb = hl + jnp.where(lit, 1, 0)

    lh0 = jnp.where(run_len <= 60, x << 2,
                    jnp.where(run_len <= 256, 240, 244))
    mh0 = jnp.where(c1, ((off >> 8) << 5) | ((l1 - 4) << 2) | 1,
                    ((l1 - 1) << 2) | 2)
    rb0 = jnp.where(l2 <= 8, ((l2 - 4) << 2) | 1,
                    jnp.where(l2 <= 263, (5 << 2) | 1, (6 << 2) | 1))
    rb2 = jnp.where(l2 <= 263, l2 - 8, (l2 - 260) & 0xFF)
    rb3 = jnp.clip(l2 - 260, 0, None) >> 8
    hasr = l2 > 0

    h0 = jnp.where(lit_start, lh0, jnp.where(take, mh0, 0))
    h1 = jnp.where(lit_start & (lit_hl >= 2), x & 0xFF,
                   jnp.where(take, off & 0xFF, 0))
    h2 = jnp.where(lit_start & (lit_hl >= 3), x >> 8,
                   jnp.where(take,
                             jnp.where(c1, jnp.where(hasr, rb0, 0),
                                       off >> 8), 0))
    h3 = jnp.where(take & hasr, jnp.where(c1, 0, rb0), 0)
    h4 = jnp.where(take & hasr & c1 & (r_hl >= 3), rb2, 0)
    h5 = jnp.where(take & hasr,
                   jnp.where(c1, jnp.where(r_hl >= 4, rb3, 0),
                             jnp.where(r_hl >= 3, rb2, 0)), 0)
    h6 = jnp.where(take & hasr & ~c1 & (r_hl >= 4), rb3, 0)

    # pack header bytes: w0 = h0..h3, w1 = h4..h6 (one gather per word
    # at route time instead of seven byte gathers)
    w0 = (h0 & 255) | ((h1 & 255) << 8) | ((h2 & 255) << 16) \
        | ((h3 & 255) << 24)
    w1 = (h4 & 255) | ((h5 & 255) << 8) | ((h6 & 255) << 16)

    lstart = _lane_cumsum_excl(outb)
    rowlen = jnp.sum(outb, axis=1, keepdims=True)  # (512, 1)
    lit_i = lit.astype(jnp.int32)

    for panel in range(2):
        d = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) \
            + panel * LANES
        idx = jnp.zeros((ROWS, LANES), jnp.int32)
        for stepk in range(6, -1, -1):
            cand = idx + (1 << stepk)
            cc = jnp.minimum(cand, LANES - 1)
            cv = jnp.take_along_axis(lstart, cc, axis=1)
            ok = (cand <= LANES - 1) & (cv <= d)
            idx = jnp.where(ok, cand, idx)
        ls = jnp.take_along_axis(lstart, idx, axis=1)
        k = d - ls
        wa = jnp.take_along_axis(w0, idx, axis=1)
        wb = jnp.take_along_axis(w1, idx, axis=1)
        kk = jnp.clip(k, 0, 6)
        byte = jnp.where(kk < 4,
                         jax.lax.shift_right_logical(wa, kk * 8) & 255,
                         jax.lax.shift_right_logical(wb, (kk - 4) * 8) & 255)
        pay_at = jnp.take_along_axis(hl, idx, axis=1)
        is_lit = jnp.take_along_axis(lit_i, idx, axis=1) > 0
        byte = jnp.where((k == pay_at) & is_lit,
                         jnp.take_along_axis(blk, idx, axis=1), byte)
        byte = jnp.where(d < rowlen, byte, 0)
        if panel == 0:
            out0_ref[0] = byte.astype(jnp.uint8)
        else:
            out1_ref[0] = byte.astype(jnp.uint8)

    parts = [rowlen[128 * a:128 * a + 128, :].T for a in range(4)]
    rl_ref[0] = jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "cap"))
def emit_blocks(blocks_u8, off, L, interpret: bool = False, cap: int = 10):
    """Same contract as lzemit.emit_blocks (v2 kernel)."""
    nb = blocks_u8.shape[0]
    blk3 = blocks_u8.reshape(nb, ROWS, LANES)
    off3 = off.reshape(nb, ROWS, LANES)
    L3 = L.reshape(nb, ROWS, LANES)
    spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_emit_kernel2, cap=cap),
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=(
            spec, spec,
            pl.BlockSpec((1, 4, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 4, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(blk3, off3, L3)
