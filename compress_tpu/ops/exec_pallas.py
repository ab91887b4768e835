"""Pallas LZ execute kernel — the seqdec/s2-decode execute tier in VMEM.

Replaces ops/execute.execute_rounds' XLA round graph (measured 0.21 GB/s
resident) for single-block frames: the (1024,128) byte arena lives in
VMEM for the whole block, pieces stream through in 128-piece chunks, and
each round is three fused stages per chunk:

  1. strip gather: one-hot row matmuls pull each piece's two source rows
     from the arena (bf16 — byte values <= 255 are exact),
  2. lane rotate by (src - dst) mod 128 via an in-kernel dynamic lane
     gather (take_along_axis is native in Mosaic; the XLA path needed a
     DFT phase-shift trick because XLA lowers batched lane gathers
     pathologically),
  3. masked scatter back via the transposed one-hot matmul.

Piece layout: round-major slots exactly like ops/execute.pack_plans
(src, dst, length) padded per round; this kernel consumes the SAME plan
tensors transposed to (B, total). Chunks are 128 pieces = one (128, AR)
one-hot matmul pair per side.

Role parity: zstd/seqdec_amd64.s executeSimple + s2/decode_amd64.s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AR = 1024   # arena rows: 512 literal + 512 output
CH = 512    # pieces per chunk (measured: 128 -> 512 is +14% on chip;
            # per-chunk one-hot builds + loop overhead amortize)


def _exec_kernel(lit_ref, src_ref, dst_ref, len_ref, out_ref, arena, acc,
                 *, caps):
    # arena: VMEM (AR, 128) f32 scratch; literals into rows 0..511
    arena[0:512, :] = lit_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
    arena[512:AR, :] = jnp.zeros((512, 128), jnp.bfloat16)
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
    piota = jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (AR, CH), 0)

    base = 0
    for cap in caps:
        nch = -(-cap // CH)

        def chunk_body(c, _, base=base, cap=cap):
            lo = base + c * CH
            # piece fields load as (1, CH) lane rows; the strip-side ops
            # need them as (CH, 1) columns — small .T relayouts
            s_l = src_ref[0, 0:1, pl.ds(lo, CH)]       # (1, CH)
            d_l = dst_ref[0, 0:1, pl.ds(lo, CH)]
            ln_l = len_ref[0, 0:1, pl.ds(lo, CH)]
            s = s_l.T                                   # (CH, 1)
            d = d_l.T
            ln = ln_l.T
            live = (piota + (c * CH) < cap) & (ln > 0)
            b0 = d & 127
            g0 = s - b0
            delta = g0 % 128
            b0_l = d_l & 127
            g0_l = s_l - b0_l
            delta_l = g0_l % 128
            r0_raw = (g0_l - delta_l) // 128  # may be -1 (clip AFTER +1)
            r0_l = jnp.clip(r0_raw, 0, AR - 1)
            r1_l = jnp.clip(r0_raw + 1, 0, AR - 1)
            oh0 = (rows_i == r0_l).astype(jnp.bfloat16)
            oh1 = (rows_i == r1_l).astype(jnp.bfloat16)
            ab = arena[:]
            row0 = jax.lax.dot_general(
                oh0, ab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (CH, 128)
            row1 = jax.lax.dot_general(
                oh1, ab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            idx = (lane + delta) % 128
            rot0 = jnp.take_along_axis(row0, idx, axis=1)
            rot1 = jnp.take_along_axis(row1, idx, axis=1)
            strip = jnp.where(lane + delta < 128, rot0, rot1)
            mask = live & (lane >= b0) & (lane < b0 + ln)
            strip = jnp.where(mask, strip, 0.0)
            ohd = (rows_i == (d >> 7).T).astype(jnp.bfloat16)
            addm = jax.lax.dot_general(
                ohd, strip.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (AR, 128)
            # round-local accumulator: chunks of one round are
            # independent (round-r pieces read only rounds < r), so the
            # arena stays CONSTANT within a round and the MXU pipeline
            # is not serialized through it
            acc[:] = acc[:] + addm.astype(jnp.bfloat16)
            return 0

        acc[:] = jnp.zeros((AR, 128), jnp.bfloat16)
        jax.lax.fori_loop(0, nch, chunk_body, 0)
        arena[:] = arena[:] + acc[:]
        base += cap

    out_ref[0] = arena[512:AR, :].astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("caps", "interpret"))
def execute_rounds_pallas(lit_rows, src, dst, length, caps,
                          interpret: bool = False):
    """lit_rows (B, 512, 128) u8; src/dst/length (total, B) round-major
    (ops/execute.pack_plans layout); caps: per-round capacities.
    Returns (B, 512, 128) u8 output rows. Single-block frames only
    (sources < AR*128; HIST pieces are not supported here)."""
    B = lit_rows.shape[0]
    total = src.shape[0]
    # pad one chunk of dead slots: each round's last chunk may read past
    # its cap (masked), and an out-of-bounds pl.ds start would CLAMP and
    # silently re-execute earlier slots
    pad = CH
    srcT = jnp.pad(src.T, ((0, 0), (0, pad))).reshape(B, 1, total + pad)
    dstT = jnp.pad(dst.T, ((0, 0), (0, pad))).reshape(B, 1, total + pad)
    lenT = jnp.pad(length.T, ((0, 0), (0, pad))).reshape(B, 1, total + pad)
    total = total + pad
    kern = functools.partial(_exec_kernel, caps=tuple(int(c) for c in caps))
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 512, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, total), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, total), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, total), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 512, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 512, 128), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((AR, 128), jnp.bfloat16),
                        pltpu.VMEM((AR, 128), jnp.bfloat16)],
        interpret=interpret,
    )(lit_rows, srcT, dstT, lenT)
