"""Minimal Mosaic repros: which construct faults?

T1: dynamic single-row store to 2D VMEM scratch at program_id row.
T2: T1 + one-hot dot read of the scratch.
T3: T2 with the one-hot built from an input index row.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 128


def run(name, kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ROWS,),
        in_specs=[pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.float32)],
    )
    fn = jax.jit(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, 8, LANES), jnp.float32),
    ))
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (ROWS, 8, LANES)).astype(np.float32))
    try:
        out = fn(x)
        got = np.asarray(out)
        print(f"{name}: OK sum={got.sum():.0f}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}")


def t1(in_ref, out_ref, arena):
    t = pl.program_id(0)
    v = in_ref[0]                       # (8, LANES)
    arena[pl.ds(t, 1)] = v[0][None]
    out_ref[0] = v


def t2(in_ref, out_ref, arena):
    t = pl.program_id(0)
    v = in_ref[0]
    arena[pl.ds(t, 1)] = v[0][None]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (LANES, ROWS), 1)
          == 3).astype(jnp.float32)
    rows = jnp.dot(oh, arena[:], preferred_element_type=jnp.float32)
    out_ref[0] = v + rows[0][None] * 0.0


def t3(in_ref, out_ref, arena):
    t = pl.program_id(0)
    v = in_ref[0]
    arena[pl.ds(t, 1)] = v[0][None]
    idx = jnp.minimum(v[0].astype(jnp.int32), ROWS - 1)  # (LANES,)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (LANES, ROWS), 1)
          == idx[:, None]).astype(jnp.float32)
    rows = jnp.dot(oh, arena[:], preferred_element_type=jnp.float32)
    out_ref[0] = v + rows[:, 0][None] * 0.0


def main():
    print("devices:", jax.devices())
    run("T1 store-only", t1)
    run("T2 +static one-hot dot", t2)
    run("T3 +data one-hot dot", t3)


if __name__ == "__main__":
    main()
