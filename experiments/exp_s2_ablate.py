"""Marginal-cost ablation of the s2 device encoder (healthy chip).

The staged timings overstate (HBM materialization between stages); this
replaces one stage at a time with a cheap stub inside the SAME jit and
reports the full-pipeline delta — the true marginal cost of each stage.
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

bs, tile = lz.B, lz.TILE


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
    print(f"{name:36s} {dt*1e3:9.2f} ms   {16.78/dt/1000:7.3f} GB/s")
    return dt


def pipeline(blocks, *, cand=True, rle=True, ext_words=lz._SUFFIX_WORDS,
             merge=True, emit=True, parse=True):
    def find(b):
        if cand:
            v32, words = lz._values(b, bs)
            off_s, L_s = lz._candidates_lengths(v32, words[:ext_words] if ext_words else [], bs)
        else:
            off_s = jnp.zeros(bs, jnp.int32)
            L_s = jnp.zeros(bs, jnp.int32)
        if rle:
            off_r, L_r = lz._rle_lengths(b, bs)
            use_r = L_r > L_s
            off = jnp.where(use_r, off_r, off_s)
            L = jnp.where(use_r, L_r, L_s)
        else:
            off, L = off_s, L_s
        if parse:
            return lz._parse(off, L, bs, tile, cap=tile)
        # stub parse: everything literal
        z = jnp.zeros(bs, bool)
        return z, jnp.ones(bs, bool), jnp.minimum(L, 1), off

    take, lit, L_t, off = jax.vmap(find)(blocks)
    if merge:
        take, lit, L_t, off = lz._merge_tile_chains(take, lit, L_t, off, bs, tile)
    if emit:
        return lz._emit_batched(blocks, take, lit, L_t, off, bs, tile)
    return (jnp.sum(take.astype(jnp.int32) + L_t + off, axis=1),
            jnp.sum(lit, axis=1))


def main():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    target = 16 << 20
    big = (data * (target // len(data) + 1))[:target]
    nb = len(big) // bs
    arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, bs))

    f = lambda **kw: jax.jit(lambda a: pipeline(a, **kw))
    t_full = timeit(f(), arr, name="full")
    timeit(f(rle=False), arr, name="- rle")
    timeit(f(cand=False), arr, name="- cand (sorts): rle only")
    timeit(f(ext_words=1), arr, name="- 2 suffix words (L cap 8)")
    timeit(f(ext_words=0), arr, name="- all suffix words (L=4 flat)")
    timeit(f(merge=False), arr, name="- merge_tile_chains")
    timeit(f(emit=False), arr, name="- emit (reduce stub)")
    timeit(f(parse=False), arr, name="- parse (all-literal stub)")
    timeit(f(cand=False, rle=False, parse=False, merge=False),
           arr, name="emit only (all-literal)")


if __name__ == "__main__":
    main()
