"""TPU device zstd L1 block encoder.

One device "job" is a 1 MiB window of input encoded as 64 independent-ish
16 KiB zstd blocks that share the job's history (matches reach back through
the whole job, like the reference's window; blocks are only a framing
granularity). Everything heavy runs on device in one launch:

- LZ candidate search: the lz2 sort-based exact-nearest finder, plus a
  strided chain-extension pass that reconstructs long matches from the
  16-byte sort cap (reference enc_fast.go match extension).
- parse: lz2 position-scan greedy parse (tile = 512).
- sequence + literal extraction with per-block segmentation, compacted by
  log-shift (no sorts).
- huff0 literal encoding: per-job Kraft-repair code lengths (reference
  huff0/build_table.go setMaxHeight family), canonical codes, 4-stream
  bit-pack with device-side dynamic stream layout.
- FSE sequence encoding with the predefined tables (RFC 8878
  §3.1.1.3.2.2): the strictly sequential 3-state chain runs as one
  lax.scan over MAXSEQ steps with (blocks x 3) lanes; bit emission is a
  parallel bit-pack.

The host (zstd/device.py) only assembles headers and concatenates the
device-produced streams — the frameenc/blockenc byte-fiddling role
(SURVEY.md §7 "frame header logic in plain host code").

Bit-pack design: every bitstream item contributes to <= 3 little-endian
16-bit halves; halves are routed tile-locally with one one-hot matmul
(values are 16-bit, so the one-hot runs in f32 where sums < 2^24 stay
exact), seam halves are folded across tile boundaries, and the per-tile
buffers are compacted with the log-shift primitive.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.fse import core as fse_core
from compress_tpu.ops import lz2
from compress_tpu.ops.lz2 import (_chain_extend, _probe_offsets,
                                  _topk_offsets)
from compress_tpu.ops.common import compact_best, floor_log2, route_tiles
from compress_tpu.zstd import seqs as S

JOB = 1 << 20          # device job (window) size
BLOCK = 1 << 14        # zstd block size -> 64 blocks/job
TILE = 512
LCAP = lz2.L_CAP       # sort-carried match cap (16); chains extend it
MINMATCH = 6           # parse-time minimum match (cost model floor)


def _maxseq(block: int) -> int:
    """Hard bound on sequences per block (matches are >= MINMATCH long)."""
    return block // MINMATCH + 1

# bit-pack capacities (halves = 16-bit units)
LIT_TO = 384           # per-512-item tile: <= 512*11 bits = 352 halves
SEQ_TO = 384           # per-512-item tile: <= ~85 seqs * 69 bits = 276 halves


# ---------------------------------------------------------------------------
# Predefined FSE encode tables as device constants
# ---------------------------------------------------------------------------


def _predef_ctables():
    """(state_table, delta_nb, delta_fs, table_log) x (ll, of, ml), padded
    to common (3, 64)/(3, 64) shapes. Reference: zstd/fse_predefined.go."""
    specs = [
        (S.PREDEF_LL_NORM, S.PREDEF_LL_LOG),
        (S.PREDEF_OF_NORM, S.PREDEF_OF_LOG),
        (S.PREDEF_ML_NORM, S.PREDEF_ML_LOG),
    ]
    st = np.zeros((3, 64), np.int32)
    dnb = np.zeros((3, 64), np.int64)
    dfs = np.zeros((3, 64), np.int64)
    logs = np.zeros(3, np.int32)
    for k, (norm, log) in enumerate(specs):
        a, b, c = fse_core.build_ctable(np.asarray(norm, np.int64), log)
        st[k, : 1 << log] = a
        dnb[k, : len(b)] = b
        dfs[k, : len(c)] = c
        logs[k] = log
    return st, dnb, dfs, logs


_ST, _DNB, _DFS, _LOGS = _predef_ctables()

# ll/ml small-code tables (seqs.py ll_code/ml_code, device form)
_LL_SMALL = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
     16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 20, 20, 21, 21, 21, 21,
     22, 22, 22, 22, 22, 22, 22, 22, 23, 23, 23, 23, 23, 23, 23, 23] +
    [24] * 16, np.int32)
_ML_SMALL = np.array(
    list(range(32)) +
    [32, 32, 33, 33, 34, 34, 35, 35, 36, 36, 36, 36, 37, 37, 37, 37,
     38, 38, 38, 38, 38, 38, 38, 38, 39, 39, 39, 39, 39, 39, 39, 39],
    np.int32)


def _lut(table_np, idx, dtype=jnp.bfloat16):
    """Small-table lookup via one-hot matmul (values must fit dtype
    exactness: bf16 -> <=255, f32 -> < 2^24)."""
    t = jnp.asarray(table_np)
    oh = jax.nn.one_hot(idx, t.shape[0], dtype=dtype)
    prec = "highest" if dtype == jnp.float32 else None
    return jnp.einsum("...s,s->...", oh, t.astype(dtype),
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(jnp.int32)


def _ll_code(ll):
    small = _lut(_LL_SMALL, jnp.minimum(ll, 63))
    return jnp.where(ll >= 64, floor_log2(jnp.maximum(ll, 1)) + 19, small)


def _ml_code(ml):
    v = ml - 3
    small = _lut(_ML_SMALL, jnp.minimum(v, 63))
    mid = jnp.where(v < 80, 40, jnp.where(v < 96, 41, 42))
    return jnp.where(v < 64, small,
                     jnp.where(v >= 128, floor_log2(jnp.maximum(v, 1)) + 36, mid))


def _of_code(ofval):
    return floor_log2(jnp.maximum(ofval, 1))


# ---------------------------------------------------------------------------
# Huffman table build (per job): Kraft-repair length assignment
# ---------------------------------------------------------------------------


def _huff_build(hist, maxlog: int = 11):
    """hist: (J, 256) int32 -> (nbits (J,256), max_bits (J,), ok (J,)).

    l0 = ceil(-log2(p)) guarantees Kraft sum <= 2^maxlog; the deficit is
    redistributed by shortening codes of frequent symbols (a 256-step
    scan over symbols in descending-frequency order, two passes).
    maxlog < 11 trades a little ratio for shallow decode tables (the
    Pallas shared-table decoder selects over 2^(maxlog-7) table rows)."""
    J = hist.shape[0]
    total = jnp.sum(hist, axis=1, keepdims=True)
    present = hist > 0
    nz = jnp.sum(present.astype(jnp.int32), axis=1)
    # ceil(-log2(p)) = ceil(log2(total/h)) ; exact via floor_log2 on ratio
    # ceil(log2(x/y)) = floor(log2((x-1)//y)) + 1 for x > y; robust integer
    # form: smallest l with h*2^l >= total.
    h = jnp.maximum(hist, 1)
    ratio = (total + h - 1) // h                     # ceil(total/h) >= 1
    l0 = jnp.where(ratio > 1, floor_log2(ratio - 1) + 1, 1)
    l0 = jnp.clip(l0, 1, maxlog)
    l0 = jnp.where(present, l0, 0)
    kraft = jnp.sum(jnp.where(present, 1 << (maxlog - l0), 0), axis=1)
    deficit = (1 << maxlog) - kraft                      # >= 0 by construction

    # redistribute the deficit by single-level shortenings, best
    # gain-per-cost first (gain = hist, cost = 2^(11-l)); one step per
    # symbol per pass, re-ranked each pass
    iota = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (J, 256))
    d = deficit
    ls = l0

    def pass_(carry, col):
        dd = carry
        lcol, hcol = col
        cost = jnp.where(lcol > 1, 1 << (maxlog - lcol), 1 << 30)
        take = cost <= dd
        return dd - jnp.where(take, cost, 0), lcol - take.astype(jnp.int32)

    for _ in range(12):
        # score ~ hist * 2^l (gain per kraft-unit), eligible symbols first
        score = jnp.where((ls > 1) & present, -(hist << jnp.clip(ls, 0, maxlog)), 1)
        _, sym_s, l_s, h_s = jax.lax.sort((score, iota, ls, hist),
                                          dimension=1, num_keys=1)
        d, l_s2 = jax.lax.scan(pass_, d, (l_s.T, h_s.T))
        _, ls = jax.lax.sort((sym_s, l_s2.T), dimension=1, num_keys=1)
    ok = (d == 0) & (nz >= 2)
    max_bits = jnp.max(ls, axis=1)
    return ls, max_bits, ok


def _canonical_codes_dev(nbits, max_bits):
    """Canonical codes per the RFC decode layout: table filled with nb
    DESCENDING, natural symbol order within a level; code = start >> (mb-nb).
    Device form of huff0.canonical_codes."""
    J = nbits.shape[0]
    present = nbits > 0
    span = jnp.where(present, 1 << (max_bits[:, None] - jnp.maximum(nbits, 1)), 0)
    # sort by (nb descending, symbol ascending)
    key = jnp.where(present, ((12 - nbits) << 9)
                    + jnp.arange(256, dtype=jnp.int32)[None, :], 1 << 22)
    _, sym_s, span_s = jax.lax.sort(
        (key, jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (J, 256)), span),
        dimension=1, num_keys=1)
    start_s = jnp.cumsum(span_s, axis=1) - span_s
    # unsort
    _, start = jax.lax.sort((sym_s, start_s), dimension=1, num_keys=1)
    code = jnp.where(present, start >> (max_bits[:, None] - jnp.maximum(nbits, 1)), 0)
    return code


# ---------------------------------------------------------------------------
# Bit-pack: items -> 16-bit halves (tile one-hot routing + log-shift)
# ---------------------------------------------------------------------------


def _bitpack_rows(values, nbits, dest_bit, to, region_end=None, T=512,
                  bytesplit: bool = False, max_item_bits: int = 26):
    """values/nbits/dest_bit: (R, I) with dest_bit monotone non-decreasing
    per row; values < 2^26, nbits <= 26. region_end: (R,) total half count
    of the output region — tiles claim gap/slack halves (e.g. the EOS half
    when a stream's bit count is a multiple of 16) so the compacted stream
    keeps them as zero padding. T = items per tile; callers must ensure
    T * max_bits_per_item / 16 + 2 <= to. Returns (halves (R, ntiles*to)
    int32 compacted to the row front, n_halves (R,)).

    bytesplit: route 8-bit planes with a bf16 one-hot instead of 16-bit
    planes in f32-highest — the route is HBM-bound on the materialized
    one-hot, so halving its bytes nearly halves the stage (products stay
    exact: one-hot x byte in bf16; MXU accumulates in f32).
    max_item_bits <= 17 drops the third half-plane entirely (an item
    then spans at most two halves: shift <= 15 plus 17 bits = 32)."""
    R, I = values.shape
    nt = I // T
    v = values.astype(jnp.uint32)
    s = (dest_bit & 15).astype(jnp.uint32)
    hidx = dest_bit >> 4
    p0 = ((v << s) & 0xFFFF).astype(jnp.int32)
    p1 = ((v >> (16 - s)) & 0xFFFF).astype(jnp.int32)
    live = nbits > 0
    p0 = jnp.where(live, p0, 0)
    p1 = jnp.where(live, p1, 0)
    planes16 = [p0, p1]
    if max_item_bits > 17:
        p2 = jnp.where(s > 0,
                       (v >> (32 - jnp.maximum(s, 1))) & 0xFFFF,
                       0).astype(jnp.int32)
        planes16.append(jnp.where(live, p2, 0))

    h3 = hidx.reshape(R, nt, T)
    tb = h3[:, :, 0]                                   # tile base half
    d0 = jnp.clip((h3 - tb[:, :, None]).reshape(R * nt, T), 0, to - 3)
    if bytesplit:
        planes8 = []
        for p in planes16:
            planes8 += [p & 0xFF, p >> 8]
        routed = route_tiles(d0, [p.reshape(R * nt, T) for p in planes8],
                             to, dtype=jnp.bfloat16)   # (N, K, to)
        buf = routed[:, 0] + (routed[:, 1] << 8)
        for j in range(1, len(planes16)):
            buf = buf + jnp.roll(
                routed[:, 2 * j] + (routed[:, 2 * j + 1] << 8), j, axis=-1)
    else:
        buf = route_tiles(d0, [p.reshape(R * nt, T) for p in planes16],
                          to, accumulate_shifts=len(planes16) - 1,
                          dtype=jnp.float32)
    buf = buf.reshape(R, nt, to)

    # per-tile max half actually touched
    end_bit = dest_bit + jnp.maximum(nbits, 1) - 1
    maxh = jnp.max(jnp.where(live, end_bit >> 4, -1).reshape(R, nt, T), axis=2)
    tile_alive = jnp.any(live.reshape(R, nt, T), axis=2)
    maxlocal = jnp.where(tile_alive, maxh - tb, -1)

    maxlocal = jnp.clip(maxlocal, -1, to - 1)

    # fold shared boundary half of tile t into tile t+1's slot 0
    if nt > 1:
        sh = tile_alive[:, :-1] & tile_alive[:, 1:] & (tb[:, 1:] == maxh[:, :-1])
        pick = jax.nn.one_hot(jnp.clip(maxlocal[:, :-1], 0, to - 1), to,
                              dtype=jnp.float32)           # (R, nt-1, to)
        seam = jnp.einsum("rtw,rtw->rt", pick, buf[:, :-1].astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision="highest").astype(jnp.int32)
        buf = buf.at[:, 1:, 0].add(jnp.where(sh, seam, 0))

    # ownership: live tile t claims [tb(t), tb(t+1) - 1]; the last live
    # tile claims up to region_end - 1 (covers gap + EOS slack halves,
    # which stay zero).
    if region_end is None:
        region_end = jnp.max(jnp.where(tile_alive, maxh, -1), axis=1) + 1
    if nt > 1:
        nxt_live = jnp.concatenate(
            [tile_alive[:, 1:], jnp.zeros((R, 1), bool)], axis=1)
        nxt_tb = jnp.concatenate(
            [tb[:, 1:], jnp.zeros((R, 1), jnp.int32)], axis=1)
        ub = jnp.where(nxt_live, nxt_tb - 1, region_end[:, None] - 1)
    else:
        ub = region_end[:, None] - 1
    ub_local = jnp.clip(ub - tb, -1, to - 1)

    w = jnp.arange(to, dtype=jnp.int32)[None, None, :]
    valid = tile_alive[:, :, None] & (w <= ub_local[:, :, None])
    alive, (halves,) = compact_best(valid.reshape(R, nt * to),
                                    [buf.reshape(R, nt * to)], plane_bits=16)
    n_halves = jnp.sum(alive.astype(jnp.int32), axis=1)
    return jnp.where(alive, halves, 0), n_halves


def _rep_offsets(off_v, ll_v, is_seq):
    """Offset values with repeat codes (zstd/encoder.go offsets_to_values).

    Blocks run in parallel, but the decoder's rep state flows across the
    whole frame — so the first 3 sequences of every block are forced to
    plain pushes (off+3), after which the in-block rep state is fully
    determined and rep codes 1-3 are safe."""
    R, MS = off_v.shape

    def step(carry, xs):
        r1, r2, r3, cnt = carry
        off, ll, live = xs
        ll0 = ll == 0
        val = jnp.where(~ll0 & (off == r1), 1,
              jnp.where(~ll0 & (off == r2), 2,
              jnp.where(~ll0 & (off == r3), 3,
              jnp.where(ll0 & (off == r2), 1,
              jnp.where(ll0 & (off == r3), 2,
              jnp.where(ll0 & (off == r1 - 1) & (off > 0), 3, off + 3))))))
        val = jnp.where(cnt < 3, off + 3, val)
        # state update (mirrors the decoder's rep handling)
        swap = ((~ll0 & (val == 2)) | (ll0 & (val == 1)))
        rot = ((~ll0 & (val == 3)) | (ll0 & (val == 2)))
        push = val > 3
        push3 = ll0 & (val == 3)                  # pushes off = r1-1
        n1 = jnp.where(swap, r2, jnp.where(rot, r3,
             jnp.where(push | push3, off, r1)))
        n2 = jnp.where(swap, r1, jnp.where(rot | push | push3, r1, r2))
        n3 = jnp.where(rot | push | push3, r2, r3)
        n1 = jnp.where(live, n1, r1)
        n2 = jnp.where(live, n2, r2)
        n3 = jnp.where(live, n3, r3)
        val = jnp.where(live, val, 0)
        return (n1, n2, n3, cnt + live.astype(jnp.int32)), val

    init = (jnp.ones(R, jnp.int32), jnp.full(R, 4, jnp.int32),
            jnp.full(R, 8, jnp.int32), jnp.zeros(R, jnp.int32))
    _, vals = jax.lax.scan(
        step, init, (off_v.T, ll_v.T, is_seq.T))
    return vals.T


# ---------------------------------------------------------------------------
# FSE table build (per job, real tables) + sequence state chains
# ---------------------------------------------------------------------------

FSE_LOGS = (9, 8, 9)   # ll, of, ml accuracy logs (RFC max 9/8/9)
FSE_SZ = 512           # padded table size (1 << max log)
NSYM = 64              # padded symbol alphabet (ll 36, of <=32, ml 53)


def _normalize_count(hist, log):
    """Reference fse normalizeCount, vectorized: norm (N, NSYM) summing to
    exactly 2^log with every present symbol >= 1. Largest-remainder
    distribution for surpluses; a 64-step scan steals from the largest
    norms for deficits."""
    N = hist.shape[0]
    size = 1 << log
    total = jnp.sum(hist, axis=1, keepdims=True)
    present = hist > 0
    scaled = hist * size
    base = scaled // jnp.maximum(total, 1)
    rem = scaled % jnp.maximum(total, 1)
    norm = jnp.where(present, jnp.maximum(base, 1), 0)
    diff = size - jnp.sum(norm, axis=1)                 # + => distribute

    iota = jnp.broadcast_to(jnp.arange(NSYM, dtype=jnp.int32), (N, NSYM))
    key = jnp.where(present & (norm == jnp.maximum(base, 1)) & (base >= 1),
                    -rem, jnp.where(present, -rem, 1 << 30))
    _, sym_s = jax.lax.sort((key, iota), dimension=1, num_keys=1)
    _, rank = jax.lax.sort((sym_s, iota), dimension=1, num_keys=1)
    add = present & (rank < jnp.maximum(diff, 0)[:, None])
    norm = norm + add.astype(jnp.int32)

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
    return norm


def _fse_build(codes, is_seq, nj, log):
    """Build per-job encode tables for one code kind.

    codes: (R, MS) symbol codes, is_seq mask. Returns dict with
    state_table (nj, FSE_SZ), delta_nb/delta_fs (nj, NSYM), norm (nj, NSYM),
    log_arr (nj,), rle (nj,), rle_sym (nj,)."""
    R, MS = codes.shape
    size = 1 << log
    oh = jax.nn.one_hot(codes, NSYM, dtype=jnp.bfloat16)
    hist = jnp.einsum("ri,ris->rs", is_seq.astype(jnp.bfloat16), oh,
                      preferred_element_type=jnp.float32)
    hist = jnp.sum(hist.reshape(nj, R // nj, NSYM), axis=1).astype(jnp.int32)
    distinct = jnp.sum((hist > 0).astype(jnp.int32), axis=1)
    rle = distinct <= 1
    rle_sym = jnp.argmax(hist, axis=1).astype(jnp.int32)

    norm = _normalize_count(hist, log)
    # spread: slot k of the co-prime walk gets the symbol whose cumulative
    # norm covers k (fse_core.spread_symbols with no -1 entries)
    cumul = jnp.cumsum(norm, axis=1) - norm             # exclusive (nj, NSYM)
    cum_incl = cumul + norm
    kk = jnp.arange(size, dtype=jnp.int32)
    step_ = (size >> 1) + (size >> 3) + 3
    pk = (kk * step_) % size
    sym_of_k = jnp.sum((kk[None, :, None] >= cum_incl[:, None, :])
                       .astype(jnp.int32), axis=2)      # (nj, size)
    spread = route_tiles(jnp.broadcast_to(pk, (nj, size)), [sym_of_k],
                         size)[:, 0]
    # rank of slot u within its symbol (spread order)
    oh_sp = jax.nn.one_hot(spread, NSYM, dtype=jnp.float32)
    cum_sp = jnp.cumsum(oh_sp, axis=1) - oh_sp
    r_u = jnp.einsum("nus,nus->nu", oh_sp, cum_sp,
                     precision="highest").astype(jnp.int32)
    cumul_of_u = jnp.einsum("nus,ns->nu", oh_sp, cumul.astype(jnp.float32),
                            precision="highest").astype(jnp.int32)
    dest = jnp.clip(cumul_of_u + r_u, 0, size - 1)
    state_table = route_tiles(dest, [size + jnp.broadcast_to(kk, (nj, size))],
                              size, dtype=jnp.float32)[:, 0]
    if size < FSE_SZ:
        state_table = jnp.pad(state_table, ((0, 0), (0, FSE_SZ - size)))

    maxbits = log - floor_log2(jnp.maximum(norm - 1, 1))
    delta_nb = jnp.where(norm > 1, (maxbits << 16) - (norm << maxbits),
                         (log << 16) - size)
    delta_fs = cumul - norm
    log_arr = jnp.where(rle, 0, log) * jnp.ones(nj, jnp.int32)
    return dict(st=state_table, dnb=delta_nb, dfs=delta_fs, norm=norm,
                log=log_arr, rle=rle, rle_sym=rle_sym)


def _fse_scan(ll_c, of_c, ml_c, n_seqs, tabs, nblk):
    """Per-seq state-write (value, nbits) for the 3 streams plus flush.

    tabs: list of 3 dicts from _fse_build (ll, of, ml order)."""
    R, MS = ll_c.shape
    syms = jnp.stack([ll_c, of_c, ml_c], axis=1)        # (R, 3, MS)

    def expand(x):
        return jnp.repeat(x[:, None], nblk, axis=1).reshape((R,) + x.shape[1:])

    st_t = jnp.stack([expand(t["st"]) for t in tabs], axis=1)    # (R,3,512)
    dnb_t = jnp.stack([expand(t["dnb"]) for t in tabs], axis=1)  # (R,3,64)
    dfs_t = jnp.stack([expand(t["dfs"]) for t in tabs], axis=1)
    logs = jnp.stack([expand(t["log"]) for t in tabs], axis=1)   # (R,3)
    rle = jnp.stack([expand(t["rle"]) for t in tabs], axis=1)    # (R,3)
    sizes = jnp.where(rle, 1, 1 << jnp.where(rle, 0, logs))

    def lut64_2(t1, t2, idx):
        oh = jax.nn.one_hot(idx, NSYM, dtype=jnp.float32)
        tt = jnp.stack([t1, t2], axis=-1).astype(jnp.float32)
        r = jnp.einsum("rks,rkst->rkt", oh, tt, precision="highest")
        return r[..., 0].astype(jnp.int32), r[..., 1].astype(jnp.int32)

    def lut512(table, idx):
        oh = jax.nn.one_hot(idx, FSE_SZ, dtype=jnp.float32)
        return jnp.einsum("rks,rks->rk", oh, table.astype(jnp.float32),
                          precision="highest").astype(jnp.int32)

    n = n_seqs[:, None]                                 # (R, 1)

    # init states (cinit at seq n-1) precomputed outside the scan
    oh_last = jax.nn.one_hot(jnp.maximum(n_seqs - 1, 0), MS,
                             dtype=jnp.float32)          # (R, MS)
    sym_last = jnp.einsum("rm,rkm->rk", oh_last, syms.astype(jnp.float32),
                          precision="highest").astype(jnp.int32)
    dnb0, dfs0 = lut64_2(dnb_t, dfs_t, sym_last)
    nb0 = (dnb0 + (1 << 15)) >> 16
    im = (nb0 << 16) - dnb0
    lu0 = jnp.clip((im >> jnp.clip(nb0, 0, 16)) + dfs0, 0, FSE_SZ - 1)
    st_init = jnp.where(rle, 0, lut512(st_t, lu0) - sizes)

    def step(carry, xs):
        st = carry                                       # (R, 3) state idx
        sym, i = xs                                      # sym (R, 3), i scalar
        is_init = i == (n - 1)
        is_live = i < (n - 1)
        dnb, dfs = lut64_2(dnb_t, dfs_t, sym)
        nb = (st + sizes + dnb) >> 16
        nbc = jnp.clip(nb, 0, 16)
        val = (st + sizes) & ((1 << nbc) - 1)
        lu = jnp.clip(((st + sizes) >> nbc) + dfs, 0, FSE_SZ - 1)
        st_enc = jnp.where(rle, 0, lut512(st_t, lu) - sizes)
        new_st = jnp.where(is_init, st_init, jnp.where(is_live, st_enc, st))
        out_val = jnp.where(is_live & ~rle, val, 0)
        out_nb = jnp.where(is_live & ~rle, nb, 0)
        return new_st, (out_val, out_nb)

    idx_rev = jnp.arange(MS - 1, -1, -1, dtype=jnp.int32)
    syms_rev = jnp.flip(syms, axis=2).transpose(2, 0, 1)  # (MS, R, 3)
    st0 = jnp.zeros((R, 3), jnp.int32)
    st_fin, (vals, nbs) = jax.lax.scan(step, st0, (syms_rev, idx_rev),
                                       unroll=4)
    st_val = vals.transpose(1, 2, 0)                    # (R, 3, MS) write order
    st_nb = nbs.transpose(1, 2, 0)
    return st_val, st_nb, st_fin, logs


# ---------------------------------------------------------------------------
# Main device encoder
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("job", "block", "tile", "debug", "level"))
def zstd_encode_jobs(jobs, job: int = JOB, block: int = BLOCK,
                     tile: int = TILE, debug: bool = False,
                     prefixes=None, has_prefix=None, level: int = 2):
    """jobs: (NJ, job) uint8. Returns a dict of device tensors for host
    assembly (see zstd/device.py).

    prefixes: optional (NJ, PRE) uint8 overlap history (the previous job's
    tail — reference enc_jobs.go overlap prefix, SURVEY §2.9 P3). Matches
    may reach into the prefix; nothing is emitted for it. has_prefix: (NJ,)
    bool — jobs without real history (frame start) must not match into the
    zero-filled prefix.

    level (r3, VERDICT r2 missing #4 — the enc_fast/dfast/better ladder in
    the sort paradigm): 1 = nearest sort candidates only (fastest);
    2 = + chain extension and top-K offset probing (default, dfast-class);
    3 = + doubled probe budget and second-pass chain extension
    (better-class). Higher levels emit strictly richer candidate sets, so
    sizes are monotone non-increasing in level."""
    nj = jobs.shape[0]
    nblk = job // block
    maxseq = _maxseq(block)
    R = nj * nblk
    pre = 0 if prefixes is None else prefixes.shape[1]
    assert pre % tile == 0
    span = pre + job
    if prefixes is not None:
        full = jnp.concatenate([prefixes, jobs], axis=1)
        if has_prefix is None:
            has_prefix = jnp.ones((nj,), bool)
    else:
        full = jobs
        has_prefix = jnp.zeros((nj,), bool)

    # ---- LZ find + chain extension + parse --------------------------------
    def find_one(b, hp):
        v32, words = lz2._values(b, span)
        off_s, L_s = lz2._candidates_lengths(v32, words, span)
        if level >= 2:
            L_s = _chain_extend(off_s, L_s, span)
        off_r, L_r = lz2._rle_lengths(b, span)
        use_r = L_r > L_s
        off = jnp.where(use_r, off_r, off_s)
        L = jnp.where(use_r, L_r, L_s)
        if level >= 2:
            top = _topk_offsets(off_s, L_s, span)
            off_t, L_t_ = _probe_offsets(b, top, span)
            use_t = L_t_ > L
            off = jnp.where(use_t, off_t, off)
            L = jnp.where(use_t, L_t_, L)
        if level >= 3:
            # second probe round over offsets popular among the positions
            # the first round left short (the lazy-deepening analogue)
            resid = jnp.where(L < 8, off_s, 0)
            top2 = _topk_offsets(resid, L_s, span)
            off_t2, L_t2 = _probe_offsets(b, top2, span)
            use2 = L_t2 > L
            off = jnp.where(use2, off_t2, off)
            L = jnp.where(use2, L_t2, L)
        # a sequence costs ~2.5-3 bytes; short matches are net losses
        # (reference enc_fast hashes 6 bytes for the same reason)
        min_l = MINMATCH + (off >= 1024) + (off >= 65536)
        L = jnp.where(L >= min_l, L, 0)
        if pre:
            # drop matches reaching into a non-existent prefix
            p = jnp.arange(span, dtype=jnp.int32)
            L = jnp.where(~hp & (off > p - pre), 0, L)
            off = off[pre:]
            L = L[pre:]
        return lz2._parse(off, L, job, tile, cap=tile)

    take, lit, L_t, off = jax.vmap(find_one)(full, has_prefix)  # (nj, job)

    # ---- per-block sequence fields ----------------------------------------
    pos_in_blk = (jnp.arange(job, dtype=jnp.int32) % block)[None, :]
    end_mark = jnp.where(take, pos_in_blk + L_t, -1).reshape(nj, nblk, block)
    prev_end = jax.lax.cummax(end_mark, axis=2)
    prev_end_excl = jnp.concatenate(
        [jnp.full((nj, nblk, 1), -1, jnp.int32), prev_end[:, :, :-1]], axis=2)
    prev_end_excl = jnp.maximum(prev_end_excl, 0).reshape(nj, job)
    ll = jnp.where(take, pos_in_blk - prev_end_excl, 0)
    ofval = jnp.where(take, off, 0)  # raw offsets; rep codes applied below

    take_b = take.reshape(R, block)
    n_seqs = jnp.sum(take_b.astype(jnp.int32), axis=1)
    # pack (ll<<10 | ml) so the compaction moves 2 arrays, not 3
    lm = (ll << 10) | L_t
    _, (lm_c_, of_c_) = compact_best(
        take_b, [lm.reshape(R, block), ofval.reshape(R, block)],
        plane_bits=32)
    ll_v = lm_c_[:, :maxseq] >> 10
    ml_v = lm_c_[:, :maxseq] & 1023
    of_v = of_c_[:, :maxseq]

    # ---- literals: compaction + histogram ---------------------------------
    lit_b = lit.reshape(R, block)
    byte_b = jobs.reshape(R, block).astype(jnp.int32)
    lit_cnt = jnp.sum(lit_b.astype(jnp.int32), axis=1)
    _, (lits,) = compact_best(lit_b, [jnp.where(lit_b, byte_b, 0)],
                              plane_bits=8)

    oh_lit = jax.nn.one_hot(byte_b, 256, dtype=jnp.bfloat16)
    hist = jnp.einsum("rb,rbs->rs", lit_b.astype(jnp.bfloat16), oh_lit,
                      preferred_element_type=jnp.float32).astype(jnp.int32)

    nbits_t, max_bits, huff_ok = _huff_build(hist)       # per block
    codes_t = _canonical_codes_dev(nbits_t, max_bits)

    # ---- per-literal code lookup ------------------------------------------
    oh = jax.nn.one_hot(lits, 256, dtype=jnp.bfloat16)
    htabs = jnp.stack([codes_t & 0xFF, codes_t >> 8, nbits_t], axis=-1)
    ln = jnp.einsum("rns,rsk->rnk", oh, htabs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    lcode = ln[:, :, 0] | (ln[:, :, 1] << 8)
    lnb = ln[:, :, 2]
    idx = jnp.arange(block, dtype=jnp.int32)[None, :]
    is_lit = idx < lit_cnt[:, None]
    lnb = jnp.where(is_lit, lnb, 0)
    lcode = jnp.where(is_lit, lcode, 0)

    # ---- stream split + bit destinations (device layout: streams 4..1) ----
    seg = (lit_cnt[:, None] + 3) >> 2                    # quarter size
    q = jnp.clip(idx // jnp.maximum(seg, 1), 0, 3)
    cs = jnp.cumsum(lnb, axis=1)                         # inclusive
    oh_q = jax.nn.one_hot(q, 4, dtype=jnp.bfloat16)
    bq = jnp.einsum("ri,riq->rq", lnb.astype(jnp.bfloat16), oh_q,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    # within-quarter inclusive cumsum = cs - (bits of earlier quarters)
    oh_qf = oh_q.astype(jnp.float32)
    prev_bits = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(bq, axis=1)[:, :-1]], axis=1)
    prev_of_q = jnp.einsum("riq,rq->ri", oh_qf, prev_bits.astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision="highest").astype(jnp.int32)
    c_in_q = cs - prev_of_q
    bq_of_i = jnp.einsum("riq,rq->ri", oh_qf, bq.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision="highest").astype(jnp.int32)
    # stream half spans (cover the EOS bit) and descending layout bases
    sh = (bq + 16) >> 4                                  # (R, 4)
    sbase = jnp.stack([sh[:, 1] + sh[:, 2] + sh[:, 3],
                       sh[:, 2] + sh[:, 3],
                       sh[:, 3],
                       jnp.zeros_like(sh[:, 0])], axis=1)  # (R, 4)
    sbase_of_i = jnp.einsum("riq,rq->ri", oh_qf, sbase.astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision="highest").astype(jnp.int32)
    dest_bit = 16 * sbase_of_i + (bq_of_i - c_in_q)
    dest_bit = jnp.where(is_lit, dest_bit, 0)
    # flip to ascending order for the bit-pack
    lit_halves, lit_nh = _bitpack_rows(
        jnp.flip(lcode, axis=1), jnp.flip(lnb, axis=1),
        jnp.flip(dest_bit, axis=1), LIT_TO,
        region_end=sbase[:, 0] + sh[:, 0])

    # ---- sequence codes + extras ------------------------------------------
    si = jnp.arange(maxseq, dtype=jnp.int32)[None, :]
    is_seq = si < n_seqs[:, None]
    of_v = _rep_offsets(of_v, ll_v, is_seq)
    ll_c = jnp.where(is_seq, _ll_code(ll_v), 0)
    ml_c = jnp.where(is_seq, _ml_code(jnp.maximum(ml_v, 3)), 0)
    of_c = jnp.where(is_seq, _of_code(jnp.maximum(of_v, 1)), 0)

    llx_v = ll_v - _lut(np.asarray(S.LL_BASELINE, np.int32), jnp.minimum(ll_c, 35),
                        dtype=jnp.float32)
    llx_n = _lut(np.asarray(S.LL_BITS, np.int32), jnp.minimum(ll_c, 35))
    mlx_v = ml_v - _lut(np.asarray(S.ML_BASELINE, np.int32), jnp.minimum(ml_c, 52),
                        dtype=jnp.float32)
    mlx_n = _lut(np.asarray(S.ML_BITS, np.int32), jnp.minimum(ml_c, 52))
    ofx_v = of_v - (1 << jnp.clip(of_c, 0, 30))
    ofx_n = of_c
    llx_v = jnp.where(is_seq, llx_v, 0); llx_n = jnp.where(is_seq, llx_n, 0)
    mlx_v = jnp.where(is_seq, mlx_v, 0); mlx_n = jnp.where(is_seq, mlx_n, 0)
    ofx_v = jnp.where(is_seq, ofx_v, 0); ofx_n = jnp.where(is_seq, ofx_n, 0)

    tabs = [_fse_build(c, is_seq, nj, lg)
            for c, lg in zip((ll_c, of_c, ml_c), FSE_LOGS)]
    st_val, st_nb, st_fin, logs = _fse_scan(ll_c, of_c, ml_c, n_seqs,
                                            tabs, nblk)

    # item layout per seq (write order, seq MS-1 first), LSB-first packing
    # fuses consecutive writes: [of|ml|ll states (<=26b), llx|mlx (<=21b),
    # ofx (<=21b)] — 3 bit-pack items per sequence instead of 6.
    def flipseq(x):
        return jnp.flip(x, axis=1)

    s_of_v, s_ml_v, s_ll_v = st_val[:, 1], st_val[:, 2], st_val[:, 0]
    s_of_n, s_ml_n, s_ll_n = st_nb[:, 1], st_nb[:, 2], st_nb[:, 0]
    sh1 = jnp.clip(s_of_n, 0, 16)
    sh2 = jnp.clip(s_of_n + s_ml_n, 0, 26)
    states_v = s_of_v | (s_ml_v << sh1) | (s_ll_v << sh2)
    states_n = s_of_n + s_ml_n + s_ll_n
    fx_llx_v, fx_llx_n = flipseq(llx_v), flipseq(llx_n)
    fx_mlx_v, fx_mlx_n = flipseq(mlx_v), flipseq(mlx_n)
    x2_v = fx_llx_v | (fx_mlx_v << jnp.clip(fx_llx_n, 0, 16))
    x2_n = fx_llx_n + fx_mlx_n
    items_v = jnp.stack([states_v, x2_v, flipseq(ofx_v)], axis=2)
    items_n = jnp.stack([states_n, x2_n, flipseq(ofx_n)], axis=2)
    items_v = items_v.reshape(R, maxseq * 3)
    items_n = items_n.reshape(R, maxseq * 3)
    # flush states (ml, of, ll packed) + pad to a 512 multiple
    has_seq = (n_seqs > 0)[:, None]
    fsh1 = jnp.clip(logs[:, 2], 0, 16)
    fsh2 = jnp.clip(logs[:, 2] + logs[:, 1], 0, 26)
    fl_v = (st_fin[:, 2] | (st_fin[:, 1] << fsh1)
            | (st_fin[:, 0] << fsh2))[:, None]
    fl_n = jnp.where(has_seq,
                     (logs[:, 2] + logs[:, 1] + logs[:, 0])[:, None], 0)
    pad = (-(maxseq * 3 + 1)) % 512
    items_v = jnp.concatenate(
        [items_v, jnp.where(has_seq, fl_v, 0),
         jnp.zeros((R, pad), jnp.int32)], axis=1)
    items_n = jnp.concatenate(
        [items_n, fl_n, jnp.zeros((R, pad), jnp.int32)], axis=1)
    seq_bits_cum = jnp.cumsum(items_n, axis=1)
    seq_dest = seq_bits_cum - items_n
    # 3 items/seq, worst ~68 bits/seq -> 256-item tiles bound at 362 halves
    seq_total_bits = seq_bits_cum[:, -1]
    seq_halves, seq_nh = _bitpack_rows(items_v, items_n, seq_dest, SEQ_TO,
                                       region_end=(seq_total_bits + 16) >> 4,
                                       T=256)

    extra = {}
    if debug:
        extra = dict(dbg_items_v=items_v, dbg_items_n=items_n,
                     dbg_seq_dest=seq_dest,
                     dbg_codes=codes_t.reshape(nj, nblk, 256),
                     dbg_lits=lits.reshape(nj, nblk, block),
                     dbg_lnb=lnb.reshape(nj, nblk, block),
                     dbg_lcode=lcode.reshape(nj, nblk, block))
    return dict(
        **extra,
        n_seqs=n_seqs.reshape(nj, nblk),
        lit_cnt=lit_cnt.reshape(nj, nblk),
        ll=ll_v.reshape(nj, nblk, maxseq),
        ml=ml_v.reshape(nj, nblk, maxseq),
        ofv=of_v.reshape(nj, nblk, maxseq),
        nbits=nbits_t.reshape(nj, nblk, 256),
        max_bits=max_bits.reshape(nj, nblk),
        huff_ok=huff_ok.reshape(nj, nblk),
        stream_bits=bq.reshape(nj, nblk, 4),
        lit_halves=lit_halves.reshape(nj, nblk, -1),
        lit_nh=lit_nh.reshape(nj, nblk),
        seq_halves=seq_halves.reshape(nj, nblk, -1),
        seq_nh=seq_nh.reshape(nj, nblk),
        seq_total_bits=seq_total_bits.reshape(nj, nblk),
        fse_norm=jnp.stack([t["norm"] for t in tabs], axis=1),   # (nj,3,64)
        fse_log=jnp.stack([jnp.where(t["rle"], 0, lg)
                           for t, lg in zip(tabs, FSE_LOGS)], axis=1),
        fse_rle=jnp.stack([t["rle"] for t in tabs], axis=1),
        fse_rle_sym=jnp.stack([t["rle_sym"] for t in tabs], axis=1),
    )
