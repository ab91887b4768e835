"""s2d — decompress .s2/.snappy streams (reference: s2/cmd/s2d).

Flags: -c (stdout), -o, -safe, -rm, -verify, -bench, -offset/-tail (random
access via the seek index), -block (treat input as a raw block).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

from compress_tpu.cli.s2c import parse_size


def main(argv=None):
    ap = argparse.ArgumentParser(prog="s2d", description=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("-c", action="store_true", help="write to stdout")
    ap.add_argument("-o", default="", help="output filename")
    ap.add_argument("-safe", action="store_true")
    ap.add_argument("-rm", action="store_true")
    ap.add_argument("-bench", type=int, default=0)
    ap.add_argument("-offset", default="", help="start at uncompressed offset (needs index)")
    ap.add_argument("-tail", default="", help="return last N bytes (needs index)")
    ap.add_argument("-block", action="store_true", help="input is a raw S2 block")
    args = ap.parse_args(argv)

    from compress_tpu import s2
    from compress_tpu.s2 import stream as s2stream
    from compress_tpu.s2.seek import ReadSeeker

    for path in args.files:
        blob = sys.stdin.buffer.read() if path == "-" else open(path, "rb").read()

        def decode():
            if args.block:
                return s2.decode(blob)
            if args.offset or args.tail:
                rs = ReadSeeker(io.BytesIO(blob))
                if args.tail:
                    rs.seek(-parse_size(args.tail), io.SEEK_END)
                else:
                    rs.seek(parse_size(args.offset))
                return rs.read()
            return s2stream.Reader(io.BytesIO(blob)).read()

        if args.bench:
            best = None
            for _ in range(args.bench):
                t = time.time()
                out = decode()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            print(f"{path}: {len(out) / best / 1e6:.1f} MB/s", file=sys.stderr)
            continue
        out = decode()
        if args.c:
            sys.stdout.buffer.write(out)
            continue
        dst = args.o
        if not dst:
            for suf in (".s2", ".snappy", ".sz"):
                if path.endswith(suf):
                    dst = path[: -len(suf)]
                    break
            else:
                dst = path + ".decoded"
        if args.safe and os.path.exists(dst):
            print(f"{dst}: exists", file=sys.stderr)
            return 1
        with open(dst, "wb") as f:
            f.write(out)
        print(f"{path} -> {dst} ({len(blob)} -> {len(out)} bytes)", file=sys.stderr)
        if args.rm and path != "-":
            os.unlink(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
