"""s2c — compress files to .s2/.snappy streams (reference: s2/cmd/s2c).

Flags mirror the reference's set: -blocksize, -snappy, -pad, -index, -safe,
-rm, -o, -c (stdout), -verify, -bench, -device (our TPU path).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time


def parse_size(s: str) -> int:
    s = s.strip().upper()
    mult = 1
    for suf, m in (("K", 1 << 10), ("M", 1 << 20), ("G", 1 << 30)):
        if s.endswith(suf):
            mult = m
            s = s[:-1]
            break
    return int(s) * mult


def main(argv=None):
    ap = argparse.ArgumentParser(prog="s2c", description=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("-blocksize", default="1M", help="max block size (examples: 64K, 256K, 1M, 4M)")
    ap.add_argument("-snappy", action="store_true", help="generate snappy-compatible output")
    ap.add_argument("-pad", default="1", help="pad size to a multiple of this value")
    ap.add_argument("-index", action="store_true", help="add a seek index")
    ap.add_argument("-safe", action="store_true", help="do not overwrite output files")
    ap.add_argument("-rm", action="store_true", help="delete source files on success")
    ap.add_argument("-o", default="", help="write output to this file (single input)")
    ap.add_argument("-c", action="store_true", help="write to stdout")
    ap.add_argument("-verify", action="store_true", help="decompress and verify output")
    ap.add_argument("-bench", type=int, default=0, help="benchmark n iterations instead of writing")
    ap.add_argument("-device", action="store_true", help="use the TPU device encoder")
    args = ap.parse_args(argv)

    from compress_tpu.s2 import stream as s2stream

    block_size = parse_size(args.blocksize)
    pad = parse_size(args.pad) if args.pad != "1" else 0

    for path in args.files:
        data = sys.stdin.buffer.read() if path == "-" else open(path, "rb").read()
        if args.bench:
            best = None
            for _ in range(args.bench):
                t = time.time()
                _compress(data, args, block_size, pad)
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            print(f"{path}: {len(data) / best / 1e6:.1f} MB/s", file=sys.stderr)
            continue
        out = _compress(data, args, block_size, pad)
        if args.verify:
            got = s2stream.Reader(io.BytesIO(out)).read()
            if got != data:
                print(f"{path}: VERIFY FAILED", file=sys.stderr)
                return 1
        if args.c:
            sys.stdout.buffer.write(out)
            continue
        dst = args.o or path + (".snappy" if args.snappy else ".s2")
        if args.safe and os.path.exists(dst):
            print(f"{dst}: exists (use without -safe to overwrite)", file=sys.stderr)
            return 1
        with open(dst, "wb") as f:
            f.write(out)
        ratio = len(out) / max(len(data), 1) * 100
        print(f"{path} -> {dst} ({len(data)} -> {len(out)} bytes, {ratio:.2f}%)",
              file=sys.stderr)
        if args.rm and path != "-":
            os.unlink(path)
    return 0


def _compress(data, args, block_size, pad):
    import io as _io

    from compress_tpu.s2 import stream as s2stream

    if args.device and not args.snappy:
        from compress_tpu.parallel import s2_stream_encode_device

        return s2_stream_encode_device(data)
    buf = _io.BytesIO()
    w = s2stream.Writer(buf, block_size=block_size, snappy=args.snappy,
                        padding=pad, add_index=args.index)
    w.write(data)
    w.close()
    return buf.getvalue()


if __name__ == "__main__":
    sys.exit(main())
