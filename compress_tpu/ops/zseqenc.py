"""Pallas zstd sequence-encode kernels — the serial per-block chains.

Two kernels with lanes = blocks and a grid over sequence chunks (scratch
carries the per-lane state across grid steps):

1. `rep_scan` (forward): repeat-offset resolution — offset values become
   rep codes 1-3 / off+3 pushes with the decoder's exact rep-state
   machine (mirror of ops/zdev._rep_offsets; reference
   zstd/encoder.go offsets_to_values). First 3 sequences of every block
   are forced plain pushes so each block's rep state is self-contained.

2. `fse_chain` (backward): the 3-stream FSE encode state chain.  Tables
   are BATCH-SHARED with accuracy log <= 7 so each state table fits one
   128-lane row (one lane-gather per stream per step); per-seq
   delta_nb/delta_fs are precomputed in XLA (parallel) and packed into
   one int32 per stream.  RLE streams need no flag: the caller dopes
   (dnb=-size, dfs=-size, table[:]=size), which makes every step emit
   zero bits and keep state 0 — exactly zdev._fse_scan's rle branch.
   The three per-seq state writes are fused into ONE (value, nbits) item
   (of | ml << nb_of | ll << (nb_of+nb_ml), <= 21 bits at log 7).

These replace lax.scan chains whose step bodies are too small to beat
XLA's per-step overhead.  Role parity: the sequence half of
`zstd/enc_fast.go` + `zstd/fse_encoder.go` hot loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 512          # sequence steps per grid chunk
FSE_LOG = 7      # batch-shared accuracy log (ll/of/ml all <= 7)
SIZE = 1 << FSE_LOG


def _rep_kernel(n_ref, of_ref, ll_ref, out_ref, st):
    g = pl.program_id(0)
    base = g * C
    shp = n_ref[0].shape

    @pl.when(g == 0)
    def _init():
        st[0] = jnp.full(shp, 1, jnp.int32)
        st[1] = jnp.full(shp, 4, jnp.int32)
        st[2] = jnp.full(shp, 8, jnp.int32)
        st[3] = jnp.zeros(shp, jnp.int32)

    n = n_ref[0]

    def step(i, carry):
        r1, r2, r3, cnt = carry
        off = of_ref[pl.ds(i, 1)][0]
        ll = ll_ref[pl.ds(i, 1)][0]
        live = (base + i) < n
        ll0 = ll == 0
        val = jnp.where(~ll0 & (off == r1), 1,
              jnp.where(~ll0 & (off == r2), 2,
              jnp.where(~ll0 & (off == r3), 3,
              jnp.where(ll0 & (off == r2), 1,
              jnp.where(ll0 & (off == r3), 2,
              jnp.where(ll0 & (off == r1 - 1) & (off > 0), 3, off + 3))))))
        val = jnp.where(cnt < 3, off + 3, val)
        swap = ((~ll0 & (val == 2)) | (ll0 & (val == 1)))
        rot = ((~ll0 & (val == 3)) | (ll0 & (val == 2)))
        push = val > 3
        push3 = ll0 & (val == 3)
        n1 = jnp.where(swap, r2, jnp.where(rot, r3,
             jnp.where(push | push3, off, r1)))
        n2 = jnp.where(swap, r1, jnp.where(rot | push | push3, r1, r2))
        n3 = jnp.where(rot | push | push3, r2, r3)
        n1 = jnp.where(live, n1, r1)
        n2 = jnp.where(live, n2, r2)
        n3 = jnp.where(live, n3, r3)
        out_ref[pl.ds(i, 1)] = jnp.where(live, val, 0)[None]
        return (n1, n2, n3, cnt + live.astype(jnp.int32))

    carry = (st[0], st[1], st[2], st[3])
    carry = jax.lax.fori_loop(0, C, step, carry)
    st[0], st[1], st[2], st[3] = carry


@functools.partial(jax.jit, static_argnames=("interpret",))
def rep_scan(of_v, ll_v, n_seqs, interpret: bool = False):
    """(R, MS) raw offsets + literal lengths + (R,) counts -> offset
    VALUES (rep codes applied), zdev._rep_offsets-compatible."""
    R, MS = of_v.shape
    assert MS % C == 0
    nr = max(2, -(-R // 128))  # nr >= 2: Mosaic gather rejects (1,128) panels
    Rp = nr * 128

    def prep(x):
        return jnp.pad(x, ((0, Rp - R), (0, 0))).T.reshape(MS, nr, 128)

    spec = pl.BlockSpec((C, nr, 128), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rep_kernel,
        grid=(MS // C,),
        in_specs=[pl.BlockSpec((1, nr, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM), spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((MS, nr, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, nr, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.pad(n_seqs, (0, Rp - R)).reshape(1, nr, 128), prep(of_v),
      prep(ll_v))
    return out.reshape(MS, Rp).T[:R]


def _fse_kernel(n_ref, pll_ref, pof_ref, pml_ref, tab_ref,
                val_ref, nb_ref, fin_ref, st):
    g = pl.program_id(0)
    ngrid = pl.num_programs(0)
    shp = n_ref[0].shape

    @pl.when(g == 0)
    def _init():
        st[0] = jnp.zeros(shp, jnp.int32)
        st[1] = jnp.zeros(shp, jnp.int32)
        st[2] = jnp.zeros(shp, jnp.int32)

    n = n_ref[0]
    base = (ngrid - 1 - g) * C

    def tab_row(row):
        return jnp.broadcast_to(tab_ref[row:row + 1, :], shp)

    t_ll = tab_row(0)
    t_of = tab_row(1)
    t_ml = tab_row(2)

    def one(stream_st, pk, table):
        dfs = (pk & 511) - 128
        dnb = (pk >> 9) - 128
        nb = (stream_st + SIZE + dnb) >> 16
        nbc = jnp.clip(nb, 0, 16)
        val = (stream_st + SIZE) & ((1 << nbc) - 1)
        lu = jnp.clip(((stream_st + SIZE) >> nbc) + dfs, 0, SIZE - 1)
        st_enc = jnp.take_along_axis(table, lu, axis=1) - SIZE
        # init (first live step, reverse order): state from cinit
        nb0 = jnp.clip((dnb + (1 << 15)) >> 16, 0, 16)
        im = (nb0 << 16) - dnb
        lu0 = jnp.clip((im >> nb0) + dfs, 0, SIZE - 1)
        st_init = jnp.take_along_axis(table, lu0, axis=1) - SIZE
        return val, nb, st_enc, st_init

    def step(j, carry):
        s_ll, s_of, s_ml = carry
        i = C - 1 - j
        gi = base + i
        is_init = gi == (n - 1)
        is_live = gi < (n - 1)
        v_ll, n_ll, e_ll, i_ll = one(s_ll, pll_ref[pl.ds(i, 1)][0], t_ll)
        v_of, n_of, e_of, i_of = one(s_of, pof_ref[pl.ds(i, 1)][0], t_of)
        v_ml, n_ml, e_ml, i_ml = one(s_ml, pml_ref[pl.ds(i, 1)][0], t_ml)
        ns_ll = jnp.where(is_init, i_ll, jnp.where(is_live, e_ll, s_ll))
        ns_of = jnp.where(is_init, i_of, jnp.where(is_live, e_of, s_of))
        ns_ml = jnp.where(is_init, i_ml, jnp.where(is_live, e_ml, s_ml))
        # fused write order (of, ml, ll) LSB-first — zdev item layout
        sh1 = jnp.clip(n_of, 0, 16)
        sh2 = jnp.clip(n_of + n_ml, 0, 26)
        vv = v_of | (v_ml << sh1) | (v_ll << sh2)
        nn = n_of + n_ml + n_ll
        val_ref[pl.ds(i, 1)] = jnp.where(is_live, vv, 0)[None]
        nb_ref[pl.ds(i, 1)] = jnp.where(is_live, nn, 0)[None]
        return ns_ll, ns_of, ns_ml

    carry = (st[0], st[1], st[2])
    carry = jax.lax.fori_loop(0, C, step, carry)
    st[0], st[1], st[2] = carry
    fin_ref[0] = st[0]
    fin_ref[1] = st[1]
    fin_ref[2] = st[2]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fse_chain(pk_ll, pk_of, pk_ml, n_seqs, tables, interpret: bool = False):
    """Backward FSE encode chain over batch-shared log-7 tables.

    pk_*: (R, MS) packed per-seq (dnb+128)<<9 | (dfs+128) for each
    stream; tables: (3, 128) i32 state tables (ll, of, ml rows; RLE
    streams doped by the caller).  Returns (val, nb) each (R, MS) —
    the fused 3-state write per sequence — and st_fin (R, 3)
    (ll, of, ml final states, biased by -SIZE like zdev's scan)."""
    R, MS = pk_ll.shape
    assert MS % C == 0
    nr = max(2, -(-R // 128))  # nr >= 2: Mosaic gather rejects (1,128) panels
    Rp = nr * 128

    def prep(x):
        return jnp.pad(x, ((0, Rp - R), (0, 0))).T.reshape(MS, nr, 128)

    spec = pl.BlockSpec((C, nr, 128), lambda g: (MS // C - 1 - g, 0, 0),
                        memory_space=pltpu.VMEM)
    val, nb, fin = pl.pallas_call(
        _fse_kernel,
        grid=(MS // C,),
        in_specs=[pl.BlockSpec((1, nr, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(spec, spec,
                   pl.BlockSpec((3, nr, 128), lambda g: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((MS, nr, 128), jnp.int32),
            jax.ShapeDtypeStruct((MS, nr, 128), jnp.int32),
            jax.ShapeDtypeStruct((3, nr, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((3, nr, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.pad(n_seqs, (0, Rp - R)).reshape(1, nr, 128),
      prep(pk_ll), prep(pk_of), prep(pk_ml), tables)
    val = val.reshape(MS, Rp).T[:R]
    nb = nb.reshape(MS, Rp).T[:R]
    fin = fin.reshape(3, Rp).T[:R]                       # (R, 3) ll/of/ml
    return val, nb, fin


def pack_deltas(dnb, dfs):
    """(…) delta_nb/delta_fs -> packed int32 (dnb+128)<<9 | (dfs+128)."""
    return ((dnb + 128) << 9) | (dfs + 128)


def doped_tables(tabs):
    """Batch-shared tables from zdev._fse_build outputs (nj=1, log 7):
    (3,128) state tables + per-symbol packed deltas (3, NSYM), with RLE
    streams doped so the kernel naturally emits zero bits."""
    import numpy as np

    st = np.zeros((3, SIZE), np.int32)
    pk = np.zeros((3, 64), np.int32)
    for k, t in enumerate(tabs):
        rle = bool(np.asarray(t["rle"])[0])
        if rle:
            st[k, :] = SIZE
            pk[k, :] = int(pack_deltas(-SIZE + 0, -SIZE))
        else:
            st[k, :] = np.asarray(t["st"])[0][:SIZE]
            dnb = np.asarray(t["dnb"])[0]
            dfs = np.asarray(t["dfs"])[0]
            pk[k, :] = pack_deltas(dnb.astype(np.int64),
                                   dfs.astype(np.int64)).astype(np.int32)
    return st, pk
