"""A/B: compact_route (two one-hot routings) vs compact_logshift.

The log-shift compactions were measured at ~32 ms (s2 emit, (256, 73728))
and ~50 ms (zstd bit-pack) per 16 MB on the healthy r1 chip — ~log2(N)
full HBM read+write passes. compact_route replaces them with two MXU
einsums (the measured-fast route_tiles pattern). This times both on
emit-realistic shapes, plus the s2 device encode end-to-end with the
current default.

Run on a HEALTHY chip only (bench.py calib_matmul_ms < 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.ops import common as C
from compress_tpu.ops import lz2


def _timeit(fn, *args, iters=8):
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[0:1])
    return (time.perf_counter() - t) / iters


def main():
    rng = np.random.default_rng(3)
    shapes = [
        ("s2-emit", (256, 73728), 8, 0.35),     # bytes, text-like density
        ("zstd-bitpack", (256, 73728), 16, 0.5),
        ("zstd-seqs", (16, 65536), 32, 0.05),
    ]
    for name, (B, N), bits, dens in shapes:
        mask = jnp.asarray(rng.random((B, N)) < dens)
        hi = 256 if bits == 8 else (1 << 16) if bits == 16 else (1 << 26)
        pay = jnp.asarray(rng.integers(0, hi, (B, N), dtype=np.int32))
        ls = jax.jit(lambda v, a: C.compact_logshift(v, [a])[1][0])
        rt = jax.jit(lambda v, a, b=bits: C.compact_route(v, [a],
                                                          plane_bits=b)[1][0])
        t_ls = _timeit(ls, mask, pay)
        t_rt = _timeit(rt, mask, pay)
        print(f"{name} ({B}x{N}, {bits}b): logshift {t_ls*1e3:.2f} ms  "
              f"route {t_rt*1e3:.2f} ms  ({t_ls/t_rt:.2f}x)")

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()
    big = (data * 43)[: 16 << 20]
    arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(-1, lz2.B))
    t = _timeit(lambda a: lz2.s2_encode_blocks(a)[1], arr, iters=4)
    print(f"s2_encode_blocks e2e (default compaction): "
          f"{len(big)/t/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
