"""Measure Mosaic support + cost of dynamic gathers inside Pallas kernels.

Decides the r4 finder/parse design:
  G1: take_along_axis axis=1 (within-row lane gather)   — known good (emit uses it)
  G2: take_along_axis axis=0 (per-lane row gather)      — needed for parse doubling
  G3: arbitrary flat gather via (row, lane) two-phase   — needed for match verify/extend

Each runs 50x inside one kernel invocation per block over 256 blocks so
per-stage cost is measurable above launch overhead.
"""

import sys, time, functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 128
REP = 50


def run(name, kernel, nb=64):
    x = jnp.asarray(np.random.randint(0, 1 << 20, (nb, ROWS, LANES), np.int32))
    idx = jnp.asarray(np.random.randint(0, ROWS, (nb, ROWS, LANES), np.int32))
    spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda a, i: pl.pallas_call(
            kernel, grid=(nb,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32))(a, i))
        r = f(x, idx)
        r.block_until_ready()
        t0 = time.perf_counter()
        f(x, idx).block_until_ready()
        dt = time.perf_counter() - t0
        per = dt / (nb * REP) * 1e6
        print(f"{name:30s} {per:9.3f} us/op-per-block   total {dt*1e3:.1f} ms")
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:200]}")


def k_lane(x_ref, i_ref, o_ref):
    x = x_ref[0]
    i = i_ref[0] & (LANES - 1)
    acc = x
    for _ in range(REP):
        acc = jnp.take_along_axis(acc, i, axis=1)
    o_ref[0] = acc


def k_row(x_ref, i_ref, o_ref):
    x = x_ref[0]
    i = i_ref[0]
    acc = x
    for _ in range(REP):
        acc = jnp.take_along_axis(acc, i & (ROWS - 1), axis=0)
    o_ref[0] = acc


def k_flat(x_ref, i_ref, o_ref):
    # arbitrary flat gather: row phase then lane phase
    x = x_ref[0]
    gi = i_ref[0] & (ROWS * LANES - 1)
    acc = x
    for _ in range(REP):
        r = (gi + acc) & (ROWS * LANES - 1)
        rowi = r >> 7
        lanei = r & (LANES - 1)
        t = jnp.take_along_axis(x, rowi, axis=0)       # align rows per lane?? wrong semantics but cost-representative
        acc = jnp.take_along_axis(t, lanei, axis=1)
    o_ref[0] = acc


def k_sort1(x_ref, i_ref, o_ref):
    # single-panel bitonic compare-exchange stage cost (static roll partner)
    x = x_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    up = (row & 1) == 0
    acc = x
    for _ in range(REP):
        fwd = pltpu.roll(acc, ROWS - 1, 0)
        bwd = pltpu.roll(acc, 1, 0)
        p = jnp.where(up, fwd, bwd)
        less = p < acc
        acc = jnp.where(less == up, p, acc)
    o_ref[0] = acc


def main():
    run("lane gather (axis=1)", k_lane)
    run("row gather (axis=0)", k_row)
    run("flat gather (2-phase)", k_flat)
    run("1-panel CE stage (roll)", k_sort1)


if __name__ == "__main__":
    main()
