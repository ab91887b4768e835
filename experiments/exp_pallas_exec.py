"""Pallas per-op LZ execute probe.

Does Mosaic compile (and how fast): a sequential fori_loop over LZ ops,
each doing a dynamic-row read of the block arena + dynamic lane rotation
+ masked write? Arena (512, 128) u8-as-int32 rows in VMEM.

Variants probed:
  P1: rows as int32 lanes, rotation via pltpu.roll with traced shift
  P2: rotation via two static shifts picked from an 8-way coarse +
      16-way fine decomposition (jax.lax.switch)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512
LANES = 128
MAXOPS = 16384


def kernel(nops_ref, src_ref, dst_ref, len_ref, lit_ref, out_ref):
    # lit_ref: (ROWS, LANES) int32 literal arena (pre-placed output with
    # copy bytes zero); out_ref: (ROWS, LANES) int32
    out_ref[:] = lit_ref[:]
    nops = nops_ref[0]

    def body(i, _):
        s = src_ref[i]
        d = dst_ref[i]
        ln = len_ref[i]
        b0 = d % LANES
        g0 = s - b0
        delta = g0 % LANES
        r0 = (g0 - delta) // LANES
        r0c = jnp.clip(r0, 0, ROWS - 2)
        two = out_ref[pl.ds(r0c, 2), :]            # (2, LANES)
        rot = pltpu.roll(two.reshape(1, 2 * LANES), -delta, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        strip = rot[:, :LANES]
        # lane m of aligned strip: byte g0+m; from first row while
        # m + delta < 128 else second — roll on the flattened 256 handles
        # the seam already (bytes contiguous)
        mask = (lane >= b0) & (lane < b0 + ln)
        drow = d // LANES
        cur = out_ref[pl.ds(drow, 1), :]
        out_ref[pl.ds(drow, 1), :] = jnp.where(mask, strip, cur)
        return 0

    jax.lax.fori_loop(0, nops, body, 0)


def run(nblocks, ops_per_block, seed=0):
    rng = np.random.default_rng(seed)
    # synthetic decode-order ops on a 64KB block: literal runs pre-placed;
    # copies reference strictly earlier bytes (sequential semantics)
    blocks_out = []
    blocks_lit = []
    ops = []
    for b in range(nblocks):
        out = rng.integers(0, 256, ROWS * LANES, np.int32)
        lit = out.copy()
        src = np.zeros(MAXOPS, np.int32)
        dst = np.zeros(MAXOPS, np.int32)
        ln = np.zeros(MAXOPS, np.int32)
        pos = 4096
        k = 0
        while pos < ROWS * LANES - 200 and k < ops_per_block:
            L = int(rng.integers(4, 64))
            off = int(rng.integers(L, min(pos, 60000)))  # non-overlapping
            src[k] = pos - off
            dst[k] = pos
            ln[k] = L
            out[pos : pos + L] = out[pos - off : pos - off + L]
            lit[pos : pos + L] = 0
            pos += L + int(rng.integers(1, 12))
            k += 1
        ops.append((k, src, dst, ln))
        blocks_out.append(out)
        blocks_lit.append(lit)
    return ops, blocks_lit, blocks_out


def main():
    print("devices:", jax.devices())
    nblocks = 8
    ops, lits, outs = run(nblocks, 2000)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jcall = jax.jit(call)

    k, src, dst, ln = ops[0]
    lit = lits[0].reshape(ROWS, LANES)
    t0 = time.time()
    out = jcall(jnp.array([k], jnp.int32), jnp.asarray(src),
                jnp.asarray(dst), jnp.asarray(ln), jnp.asarray(lit))
    out.block_until_ready()
    print(f"compile+run: {time.time()-t0:.1f}s")
    got = np.asarray(out).ravel()
    want = outs[0]
    bad = np.flatnonzero(got != want)
    print(f"exact={len(bad) == 0} (bad {len(bad)}, first {bad[:5]})")

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = jcall(jnp.array([k], jnp.int32), jnp.asarray(src),
                    jnp.asarray(dst), jnp.asarray(ln), jnp.asarray(lit))
    np.asarray(out.ravel()[0:1])
    dt = (time.time() - t0) / iters
    per_op = dt / k
    print(f"{dt*1e3:.2f} ms/block ({k} ops) = {per_op*1e9:.0f} ns/op")
    nops_16mb = 256 * 4000
    print(f"-> est 16MB zstd execute ({nops_16mb} ops): "
          f"{nops_16mb*per_op*1e3:.0f} ms = "
          f"{16e6/(nops_16mb*per_op)/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
