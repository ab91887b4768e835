"""Pallas match-finder kernel (ops/lzkern.py) — interpret-mode checks.

Validates the bitonic 2-sort finder against a numpy oracle: exact
nearest-previous-equal 4-gram candidates with suffix lengths capped at
L_CAP, sentinel handling at the block tail. Runs on the CPU mesh via
interpret=True (the conftest forces JAX_PLATFORMS=cpu)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from compress_tpu.ops import lzkern


def _oracle(block, l_cap=lzkern.L_CAP):
    bs = len(block)
    b = np.concatenate([block, np.zeros(16, np.uint8)]).astype(np.uint32)
    v = b[:bs] | (b[1:bs+1] << 8) | (b[2:bs+2] << 16) | (b[3:bs+3] << 24)
    order = np.lexsort((np.arange(bs), v))
    vs = v[order]
    same = np.concatenate([[False], vs[1:] == vs[:-1]])
    cand_s = np.where(same, np.concatenate([[-1], order[:-1]]), -1)
    cand = np.full(bs, -1, np.int64)
    cand[order] = cand_s
    wrapped = np.concatenate([block, block[:16]])  # kernel reads wrap
    off = np.zeros(bs, np.int32)
    L = np.zeros(bs, np.int32)
    sent = bs - 3
    for i in range(bs):
        c = cand[i]
        if c < 0 or i >= sent or c >= sent:
            continue
        l = 4
        while l < l_cap and wrapped[c + l] == wrapped[i + l]:
            l += 1
        l = min(l, bs - i)
        if l >= 4:
            off[i] = i - c
            L[i] = l
    return off, L


def test_finder_matches_oracle():
    rng = np.random.default_rng(7)
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()[:65536]
    blocks = np.stack([
        rng.integers(0, 4, 65536).astype(np.uint8),
        np.frombuffer(tw, np.uint8),
    ])
    off, L = lzkern.find_matches_blocks(jax.numpy.asarray(blocks),
                                        interpret=True)
    off = np.asarray(off)
    L = np.asarray(L)
    for i in range(blocks.shape[0]):
        ro, rl = _oracle(blocks[i])
        assert (off[i] == ro).all(), f"block {i} offsets differ"
        assert (L[i] == rl).all(), f"block {i} lengths differ"
