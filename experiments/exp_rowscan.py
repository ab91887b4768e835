"""Row-scan LZ execute in Pallas: arena in VMEM scratch, grid over rows.

Per grid step t (row of 128 output bytes, all blocks in lockstep):
  1. gather source bytes from rows < t via one-hot matmul on the MXU
     (arena is VMEM-resident -> no HBM amplification),
  2. place literals,
  3. resolve within-row chains (overlap copies) by 7 pointer-doubling
     substeps (one-hot matmuls on 128x128),
  4. write row t to the arena scratch + output.

Synthetic ops include overlapping copies to exercise the chase.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512
LANES = 128


def make_kernel(B):
    def kernel(srow_ref, slane_ref, lit_ref, out_ref, arena):
        t = pl.program_id(0)
        # per-byte params for row t
        srow = srow_ref[0]          # (B, LANES) int32 src row (<t) or -1
        slane = slane_ref[0]        # (B, LANES) src lane, or local ptr
        lit = lit_ref[0]            # (B, LANES) f32 literal value or -1

        # 1. gather from earlier rows: one-hot over ROWS on the MXU
        ohr = jax.nn.one_hot(jnp.maximum(srow, 0), ROWS, dtype=jnp.bfloat16)
        rows = jax.lax.dot_general(
            ohr, arena[:],  # (B,LANES,ROWS) x (ROWS,B,LANES)
            dimension_numbers=(((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)     # (B, LANES, LANES)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
        gsel = jnp.where(lane == slane[:, :, None], rows, 0.0)
        gathered = jnp.sum(gsel, axis=-1)           # (B, LANES)

        val = jnp.where(lit >= 0.0, lit, jnp.where(srow >= 0, gathered, 0.0))
        resolved = (lit >= 0.0) | (srow >= 0)

        # 3. within-row chains: srow == -1 and slane = local source lane
        def chase(i, carry):
            val, resolved, ptr = carry
            ohp = jax.nn.one_hot(ptr, LANES, dtype=jnp.bfloat16)
            m = jax.lax.dot_general(
                ohp, jnp.stack(
                    [val, resolved.astype(jnp.float32),
                     ptr.astype(jnp.float32)], axis=-1).astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (B, LANES, 3)
        # take value+resolved+ptr at ptr position
            pv, pr, pp = m[..., 0], m[..., 1], m[..., 2]
            take = (~resolved) & (pr > 0.5)
            val = jnp.where(take, pv, val)
            resolved = resolved | take
            ptr = jnp.where(resolved, ptr, pp.astype(jnp.int32))
            return val, resolved, ptr

        ptr0 = jnp.where(resolved,
                         jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1),
                         slane)
        val, resolved, _ = jax.lax.fori_loop(
            0, 7, chase, (val, resolved, ptr0))

        arena[pl.ds(t, 1)] = val[None].astype(jnp.bfloat16)
        out_ref[0] = val

    return kernel


def build(B):
    kernel = make_kernel(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ROWS,),
        in_specs=[
            pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, LANES), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((ROWS, B, LANES), jnp.bfloat16)],
    )
    return jax.jit(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, B, LANES), jnp.float32),
    ))


def synth_block(rng, overlap_frac=0.15):
    """Random decode-order ops; returns (out_bytes, srow, slane, lit)."""
    n = ROWS * LANES
    out = np.zeros(n, np.int64)
    srow = np.full(n, -1, np.int32)
    slane = np.zeros(n, np.int32)
    lit = np.full(n, -1.0, np.float32)
    pos = 0
    while pos < n:
        if pos < 600 or rng.random() < 0.35:
            L = int(rng.integers(1, 30))
            L = min(L, n - pos)
            vals = rng.integers(0, 256, L)
            out[pos : pos + L] = vals
            lit[pos : pos + L] = vals
            pos += L
        else:
            L = int(rng.integers(4, 90))
            L = min(L, n - pos)
            if rng.random() < overlap_frac:
                off = int(rng.integers(1, max(2, min(L, pos))))
            else:
                off = int(rng.integers(L, pos)) if pos > L else pos
            for j in range(L):
                s = pos + j - off
                out[pos + j] = out[s]
                if s // LANES == (pos + j) // LANES:
                    srow[pos + j] = -1
                    slane[pos + j] = s % LANES
                    lit[pos + j] = -1.0
                else:
                    srow[pos + j] = s // LANES
                    slane[pos + j] = s % LANES
                    lit[pos + j] = -1.0
            pos += L
    # within-row literal ptr: literal bytes are their own resolution
    return out, srow, slane, lit


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for B in (8, 32, 64):
        blocks = [synth_block(rng) for _ in range(B)]
        srow = np.stack([b[1].reshape(ROWS, LANES) for b in blocks], 1)
        slane = np.stack([b[2].reshape(ROWS, LANES) for b in blocks], 1)
        lit = np.stack([b[3].reshape(ROWS, LANES) for b in blocks], 1)
        want = np.stack([b[0].reshape(ROWS, LANES) for b in blocks], 1)
        fn = build(B)
        t0 = time.time()
        out = fn(jnp.asarray(srow), jnp.asarray(slane), jnp.asarray(lit))
        out.block_until_ready()
        tc = time.time() - t0
        got = np.asarray(out)
        bad = np.flatnonzero(got != want)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            out = fn(jnp.asarray(srow), jnp.asarray(slane),
                     jnp.asarray(lit))
        np.asarray(out.ravel()[0:1])
        dt = (time.time() - t0) / iters
        mb = B * ROWS * LANES / 1e6
        print(f"B={B}: compile {tc:.1f}s  {dt*1e3:.2f} ms/call "
              f"({mb:.0f} MB) -> {mb/1e3/dt:.2f} GB/s  "
              f"exact={len(bad) == 0} (bad {len(bad)})")


if __name__ == "__main__":
    main()
