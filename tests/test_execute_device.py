"""Device LZ-execute kernel: plan + rounds must reproduce blocks exactly.

Reference role: zstd/seqdec_amd64.s & s2/decode_amd64.s (sequence
execution); here validated against the original input bytes (execute of a
correct op stream must reproduce the source exactly)."""

import pathlib
import sys

import numpy as np
import pytest

from compress_tpu import s2
from compress_tpu.ops import execute as X

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "experiments"))


def _ops_for(block):
    from exp_execute import parse_ops

    enc = s2.encode(bytes(block))
    ops = parse_ops(enc)
    kinds = np.array([o[0] for o in ops])
    lens = np.array([o[1] for o in ops])
    offs = np.array([o[2] for o in ops])
    return kinds, lens, offs


def _lit_rows(block, kinds, lens):
    lits = []
    pos = 0
    for k in range(len(kinds)):
        if kinds[k] == 0:
            lits.append(block[pos : pos + lens[k]])
        pos += lens[k]
    buf = b"".join(bytes(x) for x in lits)
    arr = np.zeros(512 * 128, np.float32)
    arr[: len(buf)] = np.frombuffer(buf, np.uint8)
    return arr.reshape(512, 128)


def _run_blocks(blocks, max_rounds):
    plans = []
    lit = []
    for blk in blocks:
        kinds, lens, offs = _ops_for(blk)
        plans.append(X.plan_block_ops(kinds, lens, offs,
                                      max_rounds=max_rounds))
        lit.append(_lit_rows(blk, kinds, lens))
    src, dst, length, caps = X.pack_plans(plans)
    out = X.execute_rounds_jit(np.stack(lit), src, dst, length, caps)
    out = np.asarray(out, np.float32).reshape(len(blocks), -1)
    for i, blk in enumerate(blocks):
        want = np.frombuffer(bytes(blk), np.uint8)
        got = out[i, : len(want)]
        assert (got == want).all(), (
            f"block {i} mismatch at {np.flatnonzero(got != want)[:5]}")
    return plans


CORPUS = pathlib.Path("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt")


@pytest.mark.parametrize("max_rounds", [1, 2, 4, 8])
def test_execute_twain_blocks(max_rounds):
    data = CORPUS.read_bytes()
    blocks = [data[i : i + (1 << 16)] for i in (0, 1 << 16, 1 << 17)]
    plans = _run_blocks(blocks, max_rounds)
    for p in plans:
        assert p["n_rounds"] <= max_rounds + 1


def test_execute_structured_inputs():
    rng = np.random.default_rng(7)
    zeros = bytes(1 << 14)
    rle = bytes([65]) * 5000 + bytes([66]) * 5000
    periodic = bytes(rng.integers(0, 255, 37, dtype=np.uint8)) * 700
    rnd = rng.integers(0, 256, 1 << 14, dtype=np.uint8).tobytes()
    mixed = rle + rnd[:3000] + rle
    _run_blocks([zeros, rle, periodic, rnd, mixed], max_rounds=4)


def test_execute_capacity_reuse():
    """Packing with explicit caps (jit cache reuse across inputs)."""
    data = CORPUS.read_bytes()
    blocks = [data[: 1 << 15], data[1 << 15 : 1 << 16]]
    plans = [X.plan_block_ops(*_ops_for(b), max_rounds=3) for b in blocks]
    _, _, _, caps = X.pack_plans(plans)
    src, dst, length, caps2 = X.pack_plans(plans, round_caps=list(caps))
    assert caps2 == caps
