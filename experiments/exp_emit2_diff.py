"""Differential: lzemit2 (doubling parse) vs lzemit v1 — CPU interpret."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from compress_tpu.ops import lzemit, lzemit2, lzkern

rng = np.random.default_rng(3)
tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
datas = {
    "twain": np.frombuffer(tw[:65536], np.uint8),
    "rand4": rng.integers(0, 4, 65536).astype(np.uint8),
    "zeros": np.zeros(65536, np.uint8),
    "rand256": rng.integers(0, 256, 65536).astype(np.uint8),
    "period7": np.frombuffer(
        (bytes(rng.integers(0, 9, 7, np.uint8)) * 9500)[:65536], np.uint8),
}
blocks = np.stack(list(datas.values()))
off, L = lzkern.find_matches_blocks(jnp.asarray(blocks), interpret=True)
a0, a1, ar = lzemit.emit_blocks(jnp.asarray(blocks), off, L, interpret=True)
b0, b1, br = lzemit2.emit_blocks(jnp.asarray(blocks), off, L, interpret=True)
bad = 0
for i, name in enumerate(datas):
    same = (np.array_equal(np.asarray(a0[i]), np.asarray(b0[i]))
            and np.array_equal(np.asarray(a1[i]), np.asarray(b1[i]))
            and np.array_equal(np.asarray(ar[i]), np.asarray(br[i])))
    print(name, "IDENTICAL" if same else "DIFF")
    bad += not same
sys.exit(1 if bad else 0)
