"""Stage timing for the device s2 encoder on a healthy chip.

Times each stage of ops/lz2.py separately on 16 MB Twain-replica so the
optimization target is measured, not guessed.  Run on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from compress_tpu.ops import lz2 as lz


def timeit(fn, *args, iters=4, name=""):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[0:1]) if hasattr(x, "ravel") else x, r)
    t = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[0:1]) if hasattr(x, "ravel") else x, r)
    dt = (time.perf_counter() - t) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return r, dt


def main():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    target = 16 << 20
    big = (data * (target // len(data) + 1))[:target]
    nb = len(big) // lz.B
    arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, lz.B))
    bs, tile = lz.B, lz.TILE
    print(f"blocks={nb} block={bs} tile={tile}")

    # full pipeline
    _, dt_full = timeit(lambda a: lz.s2_encode_blocks(a), arr,
                        name="FULL s2_encode_blocks")
    print(f"  -> {len(big)/dt_full/1e9:.3f} GB/s")

    # stage 1: values
    f_values = jax.jit(jax.vmap(lambda b: lz._values(b, bs)))
    (v32, words), _ = timeit(f_values, arr, name="values (word build)")

    # stage 2: candidates+lengths (the 2 sorts)
    f_cand = jax.jit(jax.vmap(lambda v, w: lz._candidates_lengths(v, list(w), bs),
                              in_axes=(0, 0)))
    words_st = jnp.stack(words, 0) if isinstance(words, (list, tuple)) else words
    def cand_call(v, w):
        return f_cand(v, tuple(w[i] for i in range(w.shape[0])))
    # simpler: jit a fused fn from block
    f_cand2 = jax.jit(jax.vmap(
        lambda b: lz._candidates_lengths(*lz._values(b, bs), bs)))
    (off_s, L_s), dt_cand = timeit(f_cand2, arr, name="values+cand (2 sorts)")

    # stage 3: rle lengths
    f_rle = jax.jit(jax.vmap(lambda b: lz._rle_lengths(b, bs)))
    (off_r, L_r), _ = timeit(f_rle, arr, name="rle_lengths")

    # merge
    use_r = L_r > L_s
    off = jnp.where(use_r, off_r, off_s)
    L = jnp.where(use_r, L_r, L_s)

    # stage 4: parse scan
    f_parse = jax.jit(jax.vmap(lambda o, l: lz._parse(o, l, bs, tile, cap=tile)))
    (take, lit, L_t, offp), _ = timeit(f_parse, off, L, name="parse scan")

    # stage 5: merge tile chains
    f_merge = jax.jit(lambda t, li, lt, o: lz._merge_tile_chains(t, li, lt, o, bs, tile))
    (take2, lit2, L2, off2), _ = timeit(f_merge, take, lit, L_t, offp,
                                        name="merge_tile_chains")

    # stage 6: emission
    f_emit = jax.jit(lambda bl, t, li, lt, o: lz._emit_batched(bl, t, li, lt, o, bs, tile))
    (out, total), _ = timeit(f_emit, arr, take2, lit2, L2, off2, name="emit_batched")

    # sub-stage: just the two lax.sorts on this data shape, isolated
    pos = jnp.arange(bs, dtype=jnp.int32)
    f_sort5 = jax.jit(jax.vmap(
        lambda v, w0, w1, w2: jax.lax.sort((v, pos, w0, w1, w2), dimension=0, num_keys=2)))
    w0, w1, w2 = words
    timeit(f_sort5, v32, w0, w1, w2, name="sort 5-operand 2-key")
    f_sort3 = jax.jit(jax.vmap(
        lambda p, c, l: jax.lax.sort((p, c, l), dimension=0, num_keys=1)))
    timeit(f_sort3, jnp.broadcast_to(pos, (nb, bs)).astype(jnp.int32), off_s, L_s,
           name="sort 3-operand 1-key")
    f_sort2 = jax.jit(jax.vmap(
        lambda v: jax.lax.sort((v, pos), dimension=0, num_keys=1)))
    timeit(f_sort2, v32, name="sort 2-operand 1-key")


if __name__ == "__main__":
    main()
