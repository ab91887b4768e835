"""End-to-end batched device decode of small zstd frames.

All three heavy stages on device: huff0 literal scan, 3-state sequence
scan, arena LZ execute. Reference roles: zstd/seqdec_amd64.s +
huff0/decompress_amd64.s + the decode loop of zstd/blockdec.go."""

import numpy as np
import pytest
import zstandard

from compress_tpu import zstd as Z
from compress_tpu.zstd.device_dec import decompress_frames_device

TW = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()


def test_device_decode_our_frames():
    rng = np.random.default_rng(2)
    pieces = [TW[i * 60000 : (i + 1) * 60000] for i in range(4)]
    pieces += [bytes(1000),                                   # raw/RLE path
               rng.integers(0, 256, 50000, np.uint8).tobytes()]  # raw block
    for lvl in (1, 3):
        frames = [Z.compress(p, level=lvl) for p in pieces]
        got = decompress_frames_device(frames)
        for i, p in enumerate(pieces):
            assert got[i] == p, (lvl, i)


def test_device_decode_libzstd_frames():
    """Foreign frames: decoded on device when they fit the supported
    shape, host-fallback otherwise — either way bit-exact."""
    pieces = [TW[:50000], TW[50000:110000],
              open("/root/reference/testdata/html.txt", "rb").read()[:44000]]
    for lvl in (3, 19):
        c = zstandard.ZstdCompressor(level=lvl)
        frames = [c.compress(p) for p in pieces]
        got = decompress_frames_device(frames)
        for i, p in enumerate(pieces):
            assert got[i] == p, (lvl, i)


def test_device_decode_multiblock_falls_back():
    data = TW[: 300000]  # > 128KB -> multi-block -> host fallback
    frame = Z.compress(data, level=2)
    got = decompress_frames_device([frame])
    assert got[0] == data
