"""Pallas parse+emit kernel (ops/lzemit.py) — interpret-mode checks.

The full Pallas pipeline (bitonic finder -> emit kernel -> host
assembly) must produce S2 block bodies that the host decoder round-trips
bit-exactly, across literal-heavy, match-heavy, periodic, and
incompressible shapes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu import s2  # noqa: E402
from compress_tpu.ops import lzemit, lzkern  # noqa: E402
from compress_tpu.utils.varint import put_uvarint  # noqa: E402


def _datasets():
    rng = np.random.default_rng(3)
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    return {
        "twain": np.frombuffer(tw[:65536], np.uint8),
        "rand4": rng.integers(0, 4, 65536).astype(np.uint8),
        "zeros": np.zeros(65536, np.uint8),
        "rand256": rng.integers(0, 256, 65536).astype(np.uint8),
        "period7": np.frombuffer(
            (bytes(rng.integers(0, 9, 7, np.uint8)) * 9500)[:65536],
            np.uint8),
    }


def test_pipeline_roundtrip_and_quality():
    datas = _datasets()
    blocks = np.stack(list(datas.values()))
    off, L = lzkern.find_matches_blocks(jnp.asarray(blocks), interpret=True)
    b0, b1, rl = lzemit.emit_blocks(jnp.asarray(blocks), off, L,
                                    interpret=True)
    bodies = lzemit.assemble_bodies(b0, b1, rl)
    sizes = {}
    for i, (name, d) in enumerate(datas.items()):
        hdr = bytearray()
        put_uvarint(hdr, 65536)
        assert s2.decode(bytes(hdr) + bodies[i]) == d.tobytes(), name
        sizes[name] = len(bodies[i])
    # quality spot checks: chain extension collapses periodic data, text
    # compresses in the expected band, random stays near-raw
    assert sizes["period7"] < 100
    assert sizes["zeros"] < 32
    assert 36000 < sizes["twain"] < 41000
    assert sizes["rand256"] <= 66000


def test_emit_v2_bit_identical_to_v1():
    """lzemit2 (pointer-doubling parse) must reproduce lzemit's outputs
    bit-for-bit — the parse rewrite is an optimization, not a semantic
    change (the kernel path now ships v2, ops/lz2.py
    s2_encode_blocks_kern)."""
    from compress_tpu.ops import lzemit2

    datas = _datasets()
    blocks = np.stack(list(datas.values()))
    off, L = lzkern.find_matches_blocks(jnp.asarray(blocks), interpret=True)
    a0, a1, ar = lzemit.emit_blocks(jnp.asarray(blocks), off, L,
                                    interpret=True)
    b0, b1, br = lzemit2.emit_blocks(jnp.asarray(blocks), off, L,
                                     interpret=True)
    for i, name in enumerate(datas):
        assert np.array_equal(np.asarray(a0[i]), np.asarray(b0[i])), name
        assert np.array_equal(np.asarray(a1[i]), np.asarray(b1[i])), name
        assert np.array_equal(np.asarray(ar[i]), np.asarray(br[i])), name


def test_assemble_native_matches_numpy():
    """ct_s2_assemble_rows vs the numpy mask fallback."""
    import os

    rng = np.random.default_rng(7)
    nb = 13
    b0 = rng.integers(0, 255, (nb, 512, 128), np.uint8)
    b1 = rng.integers(0, 255, (nb, 512, 128), np.uint8)
    rl = rng.integers(0, 257, (nb, 4, 128)).astype(np.int32)
    fast = lzemit.assemble_bodies(b0, b1, rl)
    byts = np.concatenate([b0, b1], axis=2)
    rl2 = rl.reshape(nb, 512)
    slot = np.arange(256)[None, :]
    for b in range(nb):
        mask = slot < rl2[b][:, None]
        assert fast[b] == byts[b][mask].tobytes(), b


def test_merge_terminal_gate():
    """Crafted block: a period-3 run ends EXACTLY at a 512-tile boundary
    and the next tile's base op has a different offset (5). The cross-tile
    chain merge must NOT absorb the terminal tile's length (the gate in
    lz2._merge_tile_chains) — ungated, both kernels emitted corrupt
    output (found 2026-08-20 by differential construction)."""
    from compress_tpu.ops import lzemit2
    from compress_tpu.s2 import block as s2block

    rng = np.random.default_rng(0)
    blk = rng.integers(0, 256, 65536, dtype=np.uint8)
    p0 = 100
    pat = np.array([65, 66, 67], np.uint8)
    idx = np.arange(p0, 1024)
    blk[idx] = pat[(idx - p0) % 3]
    for i in range(1024, 1032):
        blk[i] = blk[i - 5]
    src = blk.tobytes()
    blocks = jnp.asarray(blk[None, :])
    off, L = lzkern.find_matches_blocks(blocks, interpret=True)
    for mod in (lzemit, lzemit2):
        b0, b1, rl = mod.emit_blocks(blocks, off, L, interpret=True)
        body = mod.assemble_bodies(b0, b1, rl)[0]
        pre = bytearray()
        put_uvarint(pre, len(src))
        assert s2block.decode(bytes(pre) + body) == src, mod.__name__
