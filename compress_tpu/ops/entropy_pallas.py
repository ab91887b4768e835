"""Pallas TPU huff0 decode — the `huff0/decompress_amd64.s` analogue.

Shared-table chunked Huffman decode: every chunk (K symbols of one of the
4X streams) advances in lock-step across a (R,128)-chunk panel, so one
vector op serves 32k chunks.  The per-container dtable was the structural
blocker for lane-parallel decode (a per-lane table lookup needs either a
cross-row gather — unavailable on TPU — or tiny per-container matmuls);
sharing ONE table across the batch (ops/entropy.huff0_encode_blocks
shared_table=True, the reference's treeless/repeat-table reuse taken to
its limit, huff0/huff0.go:44-62) turns the lookup into TB = 2^max_bits/128
broadcast lane-gathers.

Per symbol step:
  - halfword pair select from the chunk's 52-byte window (NH-way where),
  - 16-bit funnel shift -> the max_bits-bit peek below `lbit`,
  - TB-way broadcast take_along_axis into the packed (sym | nb<<8) table,
  - lbit -= nb (masked by the chunk's symbol count).

Measured ~0.3 ns/symbol class on a v5e (vs 12 ns/symbol for the XLA
scan version of ops/entropy_dec.py) — see bench.py huff0 rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 256  # chunk rows per grid step (R*128 = 32k chunks, ~3.4 MB windows)


def _kern(hw_ref, lbit_ref, nsym_ref, tab_ref, out_ref, endl_ref, *, k,
          max_bits, nh, tb):
    lbp0 = lbit_ref[0]
    nsym = nsym_ref[0]
    mb = max_bits
    mask = (1 << mb) - 1

    def step(i, lbp):
        bp = lbp - mb
        bpc = jnp.maximum(bp, 0)
        hsel = bpc >> 4
        s = bpc & 15
        h0 = jnp.zeros_like(lbp)
        h1 = jnp.zeros_like(lbp)
        for j in range(nh):
            w = hw_ref[j]
            h0 = jnp.where(hsel == j, w, h0)
            if j >= 1:
                h1 = jnp.where(hsel == j - 1, w, h1)
        w32 = jax.lax.shift_right_logical(h0, s) | (h1 << (16 - s))
        val = (w32 << (bpc - bp)) & mask
        hi = val >> 7
        lo = val & 127
        e = jnp.zeros_like(lbp)
        for q in range(tb):
            row = jnp.broadcast_to(tab_ref[q:q + 1, :], lbp.shape)
            g = jnp.take_along_axis(row, lo, axis=1)
            e = jnp.where(hi == q, g, e) if tb > 1 else g
        sym = e & 255
        nb = jax.lax.shift_right_logical(e, 8)
        active = i < nsym
        out_ref[pl.ds(i, 1)] = jnp.where(active, sym,
                                         0).astype(jnp.uint8)[None]
        return jnp.where(active, lbp - nb, lbp)

    endl_ref[0] = jax.lax.fori_loop(0, k, step, lbp0)


@functools.partial(jax.jit,
                   static_argnames=("k", "max_bits", "interpret"))
def huff0_decode_chunks_shared(windows, lbit, nsym, table_packed,
                               k: int = 32, max_bits: int = 8,
                               interpret: bool = False):
    """windows: (NC, win) uint8; lbit/nsym: (NC,) int32; table_packed:
    (2^max_bits,) int32 entries sym | nb<<8 (decode index = the top
    max_bits bits of the 11-bit peek, i.e. bits [lbit-max_bits, lbit)).
    Returns (syms (NC, k) uint8, end_lbit (NC,) int32)."""
    nc, win = windows.shape
    nh = (win + 1) // 2
    tb = max(1, (1 << max_bits) // 128)
    ncp = -(-nc // (R * 128)) * (R * 128)
    nr = ncp // 128
    w = jnp.pad(windows, ((0, ncp - nc), (0, win % 2)))
    hw = (w[:, 0::2].astype(jnp.int32)
          | (w[:, 1::2].astype(jnp.int32) << 8))        # (ncp, nh)
    hw = hw.reshape(nr, 128, nh).transpose(2, 0, 1)     # (nh, nr, 128)
    lb = jnp.pad(lbit, (0, ncp - nc)).reshape(1, nr, 128)
    ns = jnp.pad(nsym, (0, ncp - nc)).reshape(1, nr, 128)
    tab = jnp.pad(table_packed.astype(jnp.int32),
                  (0, tb * 128 - table_packed.shape[0])).reshape(tb, 128)

    grid = nr // R
    kern = functools.partial(_kern, k=k, max_bits=max_bits, nh=nh, tb=tb)
    syms, endl = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((nh, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, nr, 128), jnp.uint8),
            jax.ShapeDtypeStruct((1, nr, 128), jnp.int32),
        ),
        interpret=interpret,
    )(hw, lb, ns, tab)
    syms = syms.transpose(1, 2, 0).reshape(ncp, k)[:nc]
    return syms, endl.reshape(ncp)[:nc]
