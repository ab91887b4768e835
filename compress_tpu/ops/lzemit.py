"""Pallas TPU S2 parse+emit kernel — the post-finder pipeline in VMEM.

Takes the match finder's per-position (off, L) panels and produces final
S2 block-body bytes, replacing four XLA stages whose measured chip cost
dominated the r3 pipeline (per 16 MB: rle 22 ms, parse scan 32 ms,
tile-chain merge 28 ms, emission 55 ms — docs/chip_sweep_results.md):

  A. short-offset probes (1,2,3,4,8): shift-compare + log-doubling run
     lengths (capped at the 512 parse tile, which the parse caps anyway).
  B. greedy position-scan parse over 512-position tiles, 128 tiles in
     lanes — the (512,128) panels are transposed tile-major with four
     (128,128) XLU transposes, the scan is a 512-step fori loop on
     (1,128) rows.
  C. cross-tile chain merge (port of ops/lz2._merge_tile_chains).
  D. emission: per-position header bytes (S2 tag encoding, identical
     formulas to ops/lz2._emit_batched) + row-local output offsets, then
     an OUTPUT-DRIVEN route: each of the 256 output slots of every
     128-position row binary-searches (7 lane-gather steps) the row's
     monotone start offsets for its source position — gathers instead of
     scatters, the native TPU direction.

Output: (NB, 512, 256) u8 row-local byte buffers + (NB, 4, 128) row
lengths; rows concatenate (host or native) into valid S2 block bodies,
bit-decodable by the host/reference decoder.

Role parity: the emission half of the reference's
`s2/encodeblock_amd64.s:1` (emitLiteral/emitCopy/emitRepeat fragments).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 128
BS = ROWS * LANES
TILE = 512
NT = BS // TILE          # 128 tiles, one per lane in tile-level rows
ROW_OUT = 256            # output slots per 128-position row (max ~240)


def _iota2():
    r = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    return r, c


def _shift_down(x, o):
    """y[g] = x[g-o] flattened, 1 <= o < 128 (wraps at g<o; caller masks)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    a = pltpu.roll(x, o, 1)
    b = pltpu.roll(a, 1, 0)
    return jnp.where(lane >= o, a, b)


def _shift_up_pow(x, s):
    """y[g] = x[g+s] flattened for power-of-two s (wraps; caller masks)."""
    if s >= LANES:
        return pltpu.roll(x, ROWS - s // LANES, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    a = pltpu.roll(x, LANES - s, 1)
    b = pltpu.roll(a, ROWS - 1, 0)
    return jnp.where(lane < LANES - s, a, b)


def _shift_up_any(x, s):
    """y[g] = x[g+s] flattened for any 0 < s < BS (wraps; caller masks)."""
    sl, sr = s % LANES, s // LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    if sl == 0:
        return pltpu.roll(x, ROWS - sr, 0)
    t = pltpu.roll(x, LANES - sl, 1)
    a = pltpu.roll(t, (ROWS - sr) % ROWS, 0)
    b = pltpu.roll(t, ROWS - sr - 1, 0)
    return jnp.where(lane < LANES - sl, a, b)


def _chain_ext10(off, L, g, cap=10):
    """Chain extension at the suffix cap (ops/lz2._chain_extend role):
    where L[i]==cap and off[i+cap]==off[i], the match provably continues;
    segmented doubling counts consecutive links, L' = cap * links + cap.
    The terminal link's own tail (< cap bytes) is forgone — every claimed
    byte is verified, only ratio is (slightly) conservative."""
    nxt_off = _shift_up_any(off, cap)
    nxt_L = _shift_up_any(L, cap)
    cont = ((L == cap) & (nxt_off == off) & (off > 0)
            & (nxt_L >= 4) & (g + cap < BS)).astype(jnp.int32)
    r = cont
    for k in range(13):
        s = 1 << k
        nxt = _shift_up_any(r, cap * s)
        nxt = jnp.where(g + cap * s < BS, nxt, 0)
        r = r + jnp.where(r == s, nxt, 0)
    # links r: bytes i .. i+cap*r-1 all verified (each link has L==cap),
    # and the terminal position matched >= 4 more at the same offset.
    return jnp.where((L == cap) & (r > 0), cap * r + 4, L)


def _runlen_fwd(m_i32, r_t, cap_log=9):
    """Forward run length of ones starting at each position, capped at
    2^cap_log, runs cut at tile boundaries (r_t = within-tile index)."""
    r = m_i32
    for k in range(cap_log):
        s = 1 << k
        nxt = _shift_up_pow(r, s)
        nxt = jnp.where(r_t + s < TILE, nxt, 0)
        r = r + jnp.where(r == s, nxt, 0)
    return r


def _lane_cumsum_excl(x):
    """Exclusive prefix sum along lanes (within each 128-lane row)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    acc = x
    for k in range(7):
        s = 1 << k
        sh = pltpu.roll(acc, s, x.ndim - 1)
        acc = acc + jnp.where(lane >= s, sh, 0)
    return acc - x


def _lane_scan_rev(x, op, fill):
    """Reverse (suffix) scan along lanes with op in {min, max}."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    acc = x
    for k in range(7):
        s = 1 << k
        sh = pltpu.roll(acc, LANES - s, x.ndim - 1)
        sh = jnp.where(lane < LANES - s, sh, fill)
        acc = op(acc, sh)
    return acc


def _tile_reduce_max(x, neg):
    """Per-512-tile max of a natural (512,128) panel -> (1,128) tile row."""
    x3 = x.reshape(NT, 4, LANES)
    m = jnp.max(jnp.max(x3, axis=2, keepdims=True), axis=1, keepdims=True)
    return m.reshape(NT, 1).T  # (1, 128)


def _tile_first(x):
    """Value at each tile's first position -> (1,128) tile row."""
    x3 = x.reshape(NT, 4, LANES)
    return x3[:, 0, 0:1].T  # (128,1) -> (1,128)


def _per_pos(trow):
    """Broadcast a (1,128) tile row back to natural (512,128)."""
    tcol = trow.T  # (128, 1)
    return jnp.broadcast_to(tcol.reshape(NT, 1, 1),
                            (NT, 4, LANES)).reshape(ROWS, LANES)


def _nat_to_T(x, t_ref):
    """Natural (512,128) -> tile-major (512 steps, 128 tiles) scratch."""
    x3 = x.reshape(NT, 4, LANES)
    for a in range(4):
        t_ref[pl.ds(128 * a, 128), :] = x3[:, a, :].T


def _T_to_nat(t_ref):
    """Tile-major scratch -> natural (512,128) value."""
    parts = [t_ref[pl.ds(128 * a, 128), :].T[:, None, :] for a in range(4)]
    return jnp.concatenate(parts, axis=1).reshape(ROWS, LANES)


def _emit_kernel(blk_ref, off_ref, len_ref, out0_ref, out1_ref, rl_ref,
                 vT, LT, takeT, litT, *, cap=10):
    blk = blk_ref[0].astype(jnp.int32)
    off = off_ref[0]
    L = len_ref[0]
    rowi, lane = _iota2()
    g = rowi * LANES + lane
    r_t = g & (TILE - 1)

    # ---- A0. chain extension at the finder's suffix cap -------------------
    L = _chain_ext10(off, L, g, cap=cap)

    # ---- A. short-offset rle probes (ops/lz2._rle_lengths role) ----------
    for o in (1, 2, 3, 4, 8):
        m = (blk == _shift_down(blk, o)) & (g >= o)
        Lr = _runlen_fwd(m.astype(jnp.int32), r_t)
        better = (Lr > L) & (Lr >= 4)
        L = jnp.where(better, Lr, L)
        off = jnp.where(better, o, off)

    # ---- B. greedy tile parse (ops/lz2._parse role) -----------------------
    L_t = jnp.minimum(L, TILE - r_t)
    valid = L_t >= 4
    off = jnp.where(valid, off, 0)
    _nat_to_T(valid.astype(jnp.int32), vT)
    _nat_to_T(L_t, LT)

    def scan_body(it, p):
        for u in range(4):
            r = it * 4 + u
            vrow = vT[pl.ds(r, 1), :]
            Lrow = LT[pl.ds(r, 1), :]
            active = p == r
            take = active & (vrow > 0)
            lit = active & (vrow == 0)
            p = jnp.where(take, r + Lrow, jnp.where(active, p + 1, p))
            takeT[pl.ds(r, 1), :] = take.astype(jnp.int32)
            litT[pl.ds(r, 1), :] = lit.astype(jnp.int32)
        return p

    jax.lax.fori_loop(0, TILE // 4, scan_body,
                      jnp.zeros((1, LANES), jnp.int32))
    take = _T_to_nat(takeT) > 0
    lit = _T_to_nat(litT) > 0

    # ---- C. cross-tile chain merge (ops/lz2._merge_tile_chains port) ------
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
    # terminal-tile length contribution is gated by a_t (absorbed): a
    # terminal tile whose base op has a DIFFERENT offset contributes
    # nothing (matches lz2._merge_tile_chains; ungated, a chain ending at
    # a tile boundary followed by a different-offset op absorbed wrong
    # bytes — corrupt output, caught by crafted-input differential test)
    packed = jnp.where(~c_t, ((NT - 1 - tl) << 10)
                       | jnp.where(a_t, jnp.minimum(L0, 1023), 0), -1)
    filled = _lane_scan_rev(packed, jnp.maximum, -1)
    L_term = jnp.where(filled >= 0, filled & 1023, 0)

    def nxt(x, fill):
        return jnp.where(tl < NT - 1, pltpu.roll(x, LANES - 1, 1), fill)

    links = nxt(k_term, NT) - (tl + 1)
    W = links * TILE + nxt(L_term, 0)
    next_absorbed = nxt(a_t.astype(jnp.int32), 0) > 0
    is_recv = next_absorbed & ~c_t
    receiver = ends_at_end & (_per_pos(is_recv.astype(jnp.int32)) > 0) \
        & (r_t == _per_pos(epos))
    addW = jnp.where(receiver, _per_pos(W), 0)
    absorbed = (_per_pos(a_t.astype(jnp.int32)) > 0) & (r_t == 0)
    take = take & ~absorbed
    L2 = L_t + addW

    # ---- D. emission (ops/lz2._emit_batched byte formulas) ----------------
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

    # row-local output offsets + the output-driven route
    lstart = _lane_cumsum_excl(outb)
    rowlen = jnp.sum(outb, axis=1, keepdims=True)  # (512, 1)
    hs = [h0, h1, h2, h3, h4, h5, h6]
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
        byte = jnp.zeros((ROWS, LANES), jnp.int32)
        for kk in range(7):
            byte = jnp.where(k == kk,
                             jnp.take_along_axis(hs[kk], idx, axis=1), byte)
        pay_at = jnp.take_along_axis(hl, idx, axis=1)
        is_lit = jnp.take_along_axis(lit_i, idx, axis=1) > 0
        byte = jnp.where((k == pay_at) & is_lit,
                         jnp.take_along_axis(blk, idx, axis=1), byte)
        byte = jnp.where(d < rowlen, byte, 0)
        if panel == 0:
            out0_ref[0] = byte.astype(jnp.uint8)
        else:
            out1_ref[0] = byte.astype(jnp.uint8)

    # row lengths as (4,128)
    parts = [rowlen[128 * a:128 * a + 128, :].T for a in range(4)]
    rl_ref[0] = jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "cap"))
def emit_blocks(blocks_u8, off, L, interpret: bool = False, cap: int = 10):
    """(NB,65536) u8 blocks + finder (off,L) -> (bytes0, bytes1, rowlens).

    bytes0/bytes1: (NB, 512, 128) u8 — the two output panels per row
    (row-local slots 0-127 / 128-255); rowlens: (NB, 4, 128) int32 (row
    r's length at [r >> 7, r & 127])."""
    nb = blocks_u8.shape[0]
    blk3 = blocks_u8.reshape(nb, ROWS, LANES)
    off3 = off.reshape(nb, ROWS, LANES)
    L3 = L.reshape(nb, ROWS, LANES)
    spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_emit_kernel, cap=cap),
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
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)
                        for _ in range(4)],
        interpret=interpret,
    )(blk3, off3, L3)


def assemble_bodies(b0, b1, rowlens):
    """Host assembly: (NB,512,128)x2 u8 + (NB,4,128) -> list of bodies.

    Native fast path (ct_s2_assemble_rows, ~6x the numpy mask); numpy
    fallback under COMPRESS_TPU_NONATIVE."""
    nb = b0.shape[0]
    b0n = np.ascontiguousarray(np.asarray(b0))
    b1n = np.ascontiguousarray(np.asarray(b1))
    rln = np.ascontiguousarray(np.asarray(rowlens).astype(np.int32))
    try:
        import ctypes

        from compress_tpu import _native

        lib = _native.raw()
        if lib is None or not hasattr(lib, "ct_s2_assemble_rows"):
            raise OSError
        if not getattr(assemble_bodies, "_proto", False):
            lib.ct_s2_assemble_rows.restype = ctypes.c_longlong
            lib.ct_s2_assemble_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_longlong, ctypes.c_char_p, ctypes.c_char_p]
            assemble_bodies._proto = True
        total = int(rln.sum())
        out = np.empty(total + 256, np.uint8)
        lens = np.empty(nb, np.int64)
        got = lib.ct_s2_assemble_rows(
            b0n.ctypes.data_as(ctypes.c_char_p),
            b1n.ctypes.data_as(ctypes.c_char_p),
            rln.ctypes.data_as(ctypes.c_char_p), nb,
            out.ctypes.data_as(ctypes.c_char_p),
            lens.ctypes.data_as(ctypes.c_char_p))
        assert got == total, (got, total)
        bodies = []
        o = 0
        for b in range(nb):
            bodies.append(out[o:o + int(lens[b])].tobytes())
            o += int(lens[b])
        return bodies
    except OSError:
        pass
    byts = np.concatenate([b0n, b1n], axis=2)  # (NB, 512, 256)
    rl = rln.reshape(nb, ROWS)
    slot = np.arange(ROW_OUT)[None, :]
    out = []
    for b in range(nb):
        mask = slot < rl[b][:, None]
        out.append(byts[b][mask].tobytes())
    return out
