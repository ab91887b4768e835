"""Ablate the row-scan kernel: where do the ms/step go?

Variants (env V=...):
  full   - gather + chase + arena rewrite (correct)
  nodot  - skip one-hot dots (wrong results, timing only)
  nowrite- skip arena rewrite
  nochase- skip chase
  bf16   - arenas + dots in bf16
  bare   - kernel does only out_ref[0] = lit (pipeline floor)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_rowscan import synth_block

ROWS, LANES = 512, 128
B = 8
V = os.environ.get("V", "full")


def kernel(srow_ref, slane_ref, lit_ref, out_ref, *arenas):
    t = pl.program_id(0)
    srow = srow_ref[0]
    slane = slane_ref[0]
    lit = lit_ref[0]
    if V == "bare":
        out_ref[0] = lit
        return
    adt = jnp.bfloat16 if V == "bf16" else jnp.float32

    lane2 = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    gathered_rows = []
    for b in range(B):
        if V == "nodot":
            gathered_rows.append(lit[b])
            continue
        ohr = (jax.lax.broadcasted_iota(jnp.int32, (LANES, ROWS), 1)
               == jnp.maximum(srow[b], 0)[:, None]).astype(adt)
        rows = jnp.dot(ohr, arenas[b][:],
                       preferred_element_type=jnp.float32)
        g = jnp.sum(jnp.where(lane2 == slane[b][:, None], rows, 0.0), axis=1)
        gathered_rows.append(g)
    gathered = jnp.stack(gathered_rows)

    val = jnp.where(lit >= 0.0, lit, jnp.where(srow >= 0, gathered, 0.0))
    resolved = (lit >= 0.0) | (srow >= 0)

    if V != "nochase":
        ptr = jnp.where(resolved,
                        jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1),
                        slane)
        res_f = resolved.astype(jnp.float32)
        for _ in range(7):
            ohp = (jax.lax.broadcasted_iota(
                jnp.int32, (B, LANES, LANES), 2) == ptr[:, :, None])
            pv = jnp.sum(jnp.where(ohp, val[:, None, :], 0.0), axis=2)
            pr = jnp.sum(jnp.where(ohp, res_f[:, None, :], 0.0), axis=2)
            pp = jnp.sum(jnp.where(ohp, ptr[:, None, :].astype(
                jnp.float32), 0.0), axis=2)
            take = (res_f < 0.5) & (pr > 0.5)
            val = jnp.where(take, pv, val)
            res_f = jnp.maximum(res_f, take.astype(jnp.float32))
            ptr = jnp.where(res_f > 0.5, ptr, pp.astype(jnp.int32))

    if V != "nowrite":
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) == t)
        for b in range(B):
            arenas[b][:] = jnp.where(rowmask, val[b][None].astype(adt),
                                     arenas[b][:])
    out_ref[0] = val


def main():
    adt = jnp.bfloat16 if V == "bf16" else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ROWS,),
        in_specs=[pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), adt) for _ in range(B)],
    )
    fn = jax.jit(pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, B, LANES), jnp.float32),
    ))
    rng = np.random.default_rng(0)
    blocks = [synth_block(rng) for _ in range(B)]
    srow = jnp.asarray(np.stack([b[1].reshape(ROWS, LANES)
                                 for b in blocks], 1))
    slane = jnp.asarray(np.stack([b[2].reshape(ROWS, LANES)
                                  for b in blocks], 1))
    lit = jnp.asarray(np.stack([b[3].reshape(ROWS, LANES)
                                for b in blocks], 1))
    want = np.stack([b[0].reshape(ROWS, LANES) for b in blocks], 1)
    out = fn(srow, slane, lit)
    out.block_until_ready()
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = fn(srow, slane, lit)
    np.asarray(out.ravel()[0:1])
    dt = (time.time() - t0) / iters
    exact = (np.asarray(out) == want).all()
    print(f"V={V}: {dt*1e3:.2f} ms/call  {dt/ROWS*1e6:.0f} us/step  "
          f"exact={exact}")


if __name__ == "__main__":
    main()
