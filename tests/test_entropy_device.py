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


def test_huff0_device_decode_bit_exact(corpus):
    """Device chunked decode (checkpoint side channel) == host decoder
    (reference role: huff0/decompress_amd64.s)."""
    arr, blocks = corpus
    outs, accel = huff0.compress_4x_batch(arr, return_accel=True)
    got = huff0.decompress_4x_batch(outs, accel=accel)
    host = huff0.decompress_4x_batch(outs)  # host fallback path
    for g, h, blob, orig in zip(got, host, outs, blocks):
        if blob is None:
            assert g is None and h is None
            continue
        assert g == h == orig


@pytest.mark.parametrize("L", [512, 1024, 4096, 16384])
def test_huff0_device_decode_sizes(L):
    """Device-encoded blocks at every supported size decode exactly."""
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    arr = np.frombuffer((tw * 2)[: 3 * L], np.uint8).reshape(3, L)
    outs, accel = huff0.compress_4x_batch(arr, return_accel=True)
    got = huff0.decompress_4x_batch(outs, accel=accel)
    for i, blob in enumerate(outs):
        if blob is not None:
            assert got[i] == arr[i].tobytes(), (L, i)


@pytest.mark.parametrize("L", [97, 333, 1000, 4001])
def test_huff0_device_decode_foreign_containers(L):
    """Host-encoded (arbitrary-size) containers with host-derived
    checkpoints (make_accel): exercises partial chunks and uneven
    stream splits on the device decoder."""
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    conts = [huff0.compress_4x(tw[i * L : (i + 1) * L]) for i in range(3)]
    accel = huff0.make_accel(conts)
    got = huff0.decompress_4x_batch(conts, accel=accel)
    for i in range(3):
        assert got[i] == tw[i * L : (i + 1) * L], (L, i)


def test_huff0_device_decode_detects_corruption():
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    arr = np.frombuffer(tw[:8192], np.uint8).reshape(1, 8192)
    outs, accel = huff0.compress_4x_batch(arr, return_accel=True)
    blob = bytearray(outs[0])
    blob[-3] ^= 0x5A  # flip bits near the end of the last stream
    try:
        got = huff0.decompress_4x_batch([bytes(blob)], accel=accel)
        assert got[0] != arr[0].tobytes()
    except huff0.CorruptError:
        pass


def test_fse_device_decode_bit_exact(corpus):
    """Chunked 2-state FSE decode on device == host decoder."""
    arr, blocks = corpus
    outs = fse.compress_batch(arr)
    accel = fse.make_accel(outs)
    got = fse.decompress_batch(outs, accel=accel)
    host = fse.decompress_batch(outs)
    for g, h, blob, orig in zip(got, host, outs, blocks):
        if blob is None:
            assert g is None and h is None
            continue
        assert g == h == orig


@pytest.mark.parametrize("n", [300, 1001, 4096])
def test_fse_device_decode_sizes(n):
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    conts = [fse.compress(tw[i * n : (i + 1) * n], table_log=9)
             for i in range(3)]
    accel = fse.make_accel(conts)
    got = fse.decompress_batch(conts, accel=accel)
    for i, c in enumerate(conts):
        if c is not None:
            assert got[i] == tw[i * n : (i + 1) * n], (n, i)


def test_fse_device_decode_foreign_log_falls_back():
    """Non-9 table logs use the host decoder transparently."""
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    c = fse.compress(tw[:3000], table_log=11)
    accel = fse.make_accel([c])
    got = fse.decompress_batch([c], accel=accel)
    assert got[0] == fse.decompress(c)


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
