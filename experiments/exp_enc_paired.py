"""Paired same-run host encode A/B vs libzstd (VM speed swings +-60%;
alternate per iteration, take best-of for both)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import zstandard

from compress_tpu import zstd as tz


def pair(name, ours_fn, lib_fn, data, iters=9):
    bo = bl = 0.0
    so = sl = None
    for _ in range(iters):
        t = time.perf_counter()
        a = ours_fn(data)
        bo = max(bo, len(data) / (time.perf_counter() - t))
        t = time.perf_counter()
        b = lib_fn(data)
        bl = max(bl, len(data) / (time.perf_counter() - t))
        so, sl = len(a), len(b)
    print(f"{name:18s} ours {bo/1e6:7.1f} MB/s ({so} B)  lib {bl/1e6:7.1f} MB/s"
          f" ({sl} B)  speed {bo/bl:5.2f}x  size {so/sl:6.4f}x")
    return bo, bl


def main():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    big = (data * (8 << 20 // len(data) + 1))[: 2 << 20]
    pairs = [(1, 1), (2, 3), (3, 7), (4, 11)]
    if len(sys.argv) > 1:
        pairs = [p for p in pairs if p[0] == int(sys.argv[1])]
    for lo, ll in pairs:
        c = zstandard.ZstdCompressor(level=ll)
        pair(f"L{lo} vs libzstd-{ll}",
             lambda d, lo=lo: tz.compress(d, level=lo),
             lambda d, c=c: c.compress(d), big)


if __name__ == "__main__":
    main()
