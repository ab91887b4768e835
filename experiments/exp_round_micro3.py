"""Micro-bench 3: op-row-scale one-hot gather einsum + route einsum.

The op-space execute does, per round:
  1. rows[b,r,l] = sum_s onehot(row_idx[b,r], 512)[s] * V[b,s,l]   (gather)
  2. out[b,s,l] += sum_r onehot(dst_row[b,r], 512)[s] * rows[b,r,l] (route)
Does XLA fuse the one-hots at (B=256, R=8K, S=512, L=128)?
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B = 256
R = 8192   # op-rows per block (padded)
S = 512    # rows per 64KB block
L = 128


def bench(fn, args, iters, name):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    V = jnp.asarray(rng.integers(0, 257, (B, S, L)).astype(np.float32),
                    jnp.bfloat16)
    row_idx = jnp.asarray(rng.integers(0, S, (B, R), np.int32))
    strips = jnp.asarray(rng.integers(0, 257, (B, R, L)).astype(np.float32),
                         jnp.bfloat16)

    @jax.jit
    def gather_rows(V, idx):
        oh = jax.nn.one_hot(idx, S, dtype=jnp.bfloat16)  # (B,R,S)
        return jnp.einsum("brs,bsl->brl", oh, V,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def route_rows(strips, idx):
        oh = jax.nn.one_hot(idx, S, dtype=jnp.bfloat16)  # (B,R,S)
        return jnp.einsum("brs,brl->bsl", oh, strips,
                          preferred_element_type=jnp.float32)

    # variant: bf16 dot_general with int8 one-hot via comparison masks,
    # chunked over R to bound any materialization
    @jax.jit
    def gather_rows_chunked(V, idx):
        outs = []
        CH = 2048
        for lo in range(0, R, CH):
            oh = jax.nn.one_hot(idx[:, lo:lo + CH], S, dtype=jnp.bfloat16)
            outs.append(jnp.einsum("brs,bsl->brl", oh, V,
                                   preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=1)

    bench(gather_rows, (V, row_idx), 10, f"gather 'brs,bsl->brl' R={R}")
    bench(route_rows, (strips, row_idx), 10, f"route  'brs,brl->bsl' R={R}")
    bench(gather_rows_chunked, (V, row_idx), 10, "gather chunked 2K")

    # offset structure of real data: distinct offsets + top-k coverage
    from compress_tpu import s2
    sys.path.insert(0, "/root/repo/experiments")
    from exp_execute import parse_ops, load_corpus
    data = load_corpus(16 << 20)
    BLK = 1 << 16
    dist, top64, top128, nops_tot = [], [], [], 0
    for i in range(0, len(data), BLK):
        ops = parse_ops(s2.encode(data[i:i + BLK]))
        nops_tot += len(ops)
        offs = np.array([o[2] for o in ops if o[0] == 1])
        lens = np.array([o[1] for o in ops if o[0] == 1])
        u, inv = np.unique(offs, return_inverse=True)
        byc = np.bincount(inv, weights=lens)
        order = np.argsort(byc)[::-1]
        dist.append(len(u))
        tot = byc.sum()
        top64.append(byc[order[:64]].sum() / tot)
        top128.append(byc[order[:128]].sum() / tot)
    print(f"ops total {nops_tot}; distinct offsets/blk mean "
          f"{np.mean(dist):.0f}; top64 cov {np.mean(top64)*100:.1f}%  "
          f"top128 cov {np.mean(top128)*100:.1f}%")


if __name__ == "__main__":
    main()
