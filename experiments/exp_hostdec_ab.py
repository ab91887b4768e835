"""Paired A/B of the native host zstd decoder (run under each git state).

Usage: python experiments/exp_hostdec_ab.py [label]
Prints best-of-N decode GB/s on three shapes: 16 MB Twain-replica (L2),
match-heavy (zeros+noise periodic), seq-heavy (short-match text L1).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from compress_tpu.zstd.encoder import compress as zc
from compress_tpu import zstd as Z

label = sys.argv[1] if len(sys.argv) > 1 else "cur"

twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
big = (twain * (16 * 1024 * 1024 // len(twain) + 1))[: 16 * 1024 * 1024]

rng = np.random.default_rng(7)
period = bytes(rng.integers(0, 256, 512, dtype=np.uint8))
matchy = (period * (8 * 1024 * 1024 // 512))[: 8 * 1024 * 1024]

words = [bytes(rng.integers(97, 123, rng.integers(2, 6), dtype=np.uint8)) for _ in range(500)]
seqy = b" ".join(words[rng.integers(0, 500)] for _ in range(1_500_000))[: 8 * 1024 * 1024]

# literal-heavy: skewed byte soup, no matches -> pure huffman decode
lity = rng.choice(
    np.arange(64, dtype=np.uint8), size=8 * 1024 * 1024,
    p=np.arange(64, 0, -1) / np.arange(64, 0, -1).sum()).tobytes()

for name, data, lvl in [("twain16M_L2", big, 2), ("matchy8M_L1", matchy, 1),
                        ("seqy8M_L1", seqy, 1), ("lity8M_L1", lity, 1)]:
    blob = zc(data, level=lvl)
    out = Z.decompress(blob)
    assert out == data, name
    best = 0.0
    for _ in range(8):
        t = time.perf_counter()
        Z.decompress(blob)
        best = max(best, len(data) / (time.perf_counter() - t))
    print(f"{label} {name}: {best/1e9:.3f} GB/s (ratio {len(blob)/len(data):.3f})")
