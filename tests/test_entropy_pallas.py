"""Shared-table Pallas huff0 decode (ops/entropy_pallas.py) — interpret
mode on the CPU mesh; bit-exactness vs the host decoder across shapes.
The on-chip compiled-vs-interpret differential runs in tools/chip_sweep."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from compress_tpu import huff0  # noqa: E402


def _blocks():
    rng = np.random.default_rng(11)
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    return {
        "twain": np.frombuffer((tw * 2)[: 8 * 16384],
                               np.uint8).reshape(8, 16384),
        "skew": rng.choice(8, (4, 16384), p=[.6, .2, .1, .04, .03, .02,
                                             .005, .005]).astype(np.uint8),
        "uniform16": rng.integers(0, 16, (4, 16384)).astype(np.uint8),
    }


@pytest.mark.parametrize("name", list(_blocks()))
@pytest.mark.parametrize("max_log", [8, 9])
def test_shared_roundtrip_pallas(name, max_log):
    arr = _blocks()[name]
    conts, accel = huff0.compress_4x_batch(
        arr, return_accel=True, shared_table=True, max_log=max_log)
    assert all(c is not None for c in conts)
    # host oracle accepts the containers (format-valid)
    for i, c in enumerate(conts):
        assert huff0.decompress_4x(c) == arr[i].tobytes()
    # pallas shared kernel (interpret on CPU) bit-exact
    outs = huff0.decompress_4x_batch(conts, accel=accel, engine="pallas")
    for i, o in enumerate(outs):
        assert o == arr[i].tobytes()


def test_shared_single_symbol_batch_falls_back():
    arr = np.zeros((3, 4096), np.uint8)
    conts, accel = huff0.compress_4x_batch(arr, return_accel=True,
                                           shared_table=True, max_log=8)
    assert all(c is None for c in conts)  # incompressible contract
    outs = huff0.decompress_4x_batch(conts, accel=accel)
    assert outs == [None, None, None]


def test_shared_table_identical_across_blocks():
    arr = _blocks()["twain"]
    conts, _ = huff0.compress_4x_batch(arr, return_accel=True,
                                       shared_table=True, max_log=8)
    # every container serializes the same table bytes
    tables = set()
    for c in conts:
        from compress_tpu.utils.varint import read_uvarint

        _, pos = read_uvarint(bytes(c))
        _, _, mb, end = huff0.read_table(bytes(c), pos)
        tables.add(bytes(c)[pos:end])
        assert mb <= 8
    assert len(tables) == 1
