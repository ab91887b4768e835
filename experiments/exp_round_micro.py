"""Micro-bench: one execute-gather round, alternative formulations.

Run on the real chip. Measures ms/round for a (B, 64K) in-block gather.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B = 16
P = 1 << 16
T = 512
L = 128


def bench(fn, args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    dt = (time.time() - t0) / iters
    gbs = B * P / dt / 1e9
    print(f"{name}: {dt*1e3:.2f} ms/round  ({gbs:.2f} Gbyte/s gathered)")
    return dt


def main():
    rng = np.random.default_rng(0)
    src = rng.integers(0, P, (B, P), np.int32)
    V = rng.integers(-1, 256, (B, T, L)).astype(np.int16)
    st = jnp.asarray(src >> 7)
    sl = jnp.asarray(src & 127)
    Vj = jnp.asarray(V)
    print("devices:", jax.devices())

    # A: one-hot einsum (round-1 style)
    @jax.jit
    def rnd_a(V, st, sl):
        oh_t = jax.nn.one_hot(st, T, dtype=jnp.bfloat16)
        oh_l = jax.nn.one_hot(sl, L, dtype=jnp.bfloat16)
        rows = jnp.einsum("bpt,btl->bpl", oh_t,
                          V.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return jnp.sum(rows * oh_l, axis=-1)

    # B: row take_along_axis + mask-sum lane select (int16)
    @jax.jit
    def rnd_b(V, st, sl):
        rows = jnp.take_along_axis(V, st[:, :, None], axis=1)  # (B,P,L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        return jnp.sum(jnp.where(lane == sl[:, :, None],
                                 rows.astype(jnp.int32), 0), axis=-1)

    # C: row gather via one-hot matmul but bf16 (no lane select cost calc)
    @jax.jit
    def rnd_c(V, st, sl):
        rows = jnp.take_along_axis(V, st[:, :, None], axis=1)
        # lane select via dynamic_slice-free dot in int32
        oh_l = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
                == sl[:, :, None]).astype(jnp.int16)
        return jnp.sum(rows * oh_l, axis=-1, dtype=jnp.int32)

    # D: byte gather flattened (XLA native gather baseline)
    @jax.jit
    def rnd_d(V, st, sl):
        vf = V.reshape(B, P)
        idx = st * L + sl
        return jnp.take_along_axis(vf, idx, axis=1)

    bench(rnd_a, (Vj, st, sl), 5, "A one-hot einsum")
    bench(rnd_b, (Vj, st, sl), 20, "B row-gather + where-sum")
    bench(rnd_c, (Vj, st, sl), 20, "C row-gather + int16 mask dot")
    bench(rnd_d, (Vj, st, sl), 5, "D flat byte gather")


if __name__ == "__main__":
    main()
