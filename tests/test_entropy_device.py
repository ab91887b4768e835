"""Batched device entropy coders vs the host block codecs (CPU backend)."""

import numpy as np
import pytest

from compress_tpu import fse, huff0


@pytest.fixture(scope="module")
def corpus():
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    rng = np.random.default_rng(11)
    L = 4096
    blocks = [
        tw[:L], tw[L:2*L], tw[5*L:6*L],
        bytes(L),                                      # RLE -> None
        rng.integers(0, 256, L, np.uint8).tobytes(),   # incompressible
        (b"abcdef" * (L // 6 + 1))[:L],
        rng.integers(0, 8, L, np.uint8).tobytes(),     # low-entropy
    ]
    return np.stack([np.frombuffer(b, np.uint8) for b in blocks]), blocks


def test_huff0_batch_roundtrip(corpus):
    arr, blocks = corpus
    outs = huff0.compress_4x_batch(arr)
    n_ok = 0
    for blob, orig in zip(outs, blocks):
        if blob is None:
            continue
        n_ok += 1
        assert huff0.decompress_4x(blob) == orig
        assert len(blob) < len(orig)
    assert n_ok >= 4


def test_fse_batch_roundtrip(corpus):
    arr, blocks = corpus
    outs = fse.compress_batch(arr)
    n_ok = 0
    for blob, orig in zip(outs, blocks):
        if blob is None:
            continue
        n_ok += 1
        assert fse.decompress(blob) == orig
        assert len(blob) < len(orig)
    assert n_ok >= 3


def test_huff0_batch_matches_host_sizes(corpus):
    arr, blocks = corpus
    outs = huff0.compress_4x_batch(arr)
    for blob, orig in zip(outs, blocks):
        if blob is None:
            continue
        try:
            host = huff0.compress_4x(orig)
        except Exception:
            continue
        assert len(blob) <= int(len(host) * 1.03) + 8


def test_fse_batch_high_entropy_bitpack_bound():
    """Near-worst per-item bit widths (dense 8-9 bit state writes) must not
    overflow the bit-pack tile window (regression: T=512 tiles clipped)."""
    rng = np.random.default_rng(0)
    p = np.ones(201)
    p[0] = 220.0
    p /= p.sum()
    blocks = rng.choice(201, size=(8, 4096), p=p).astype(np.uint8)
    outs = fse.compress_batch(blocks)
    n_ok = 0
    for blob, row in zip(outs, blocks):
        if blob is None:
            continue
        n_ok += 1
        assert fse.decompress(blob) == row.tobytes()
    assert n_ok >= 6
