"""Measure ops/execute.py on the real chip at 16MB: device ms, GB/s,
piece counts (side-channel size) vs max_rounds."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax

from compress_tpu import s2
from compress_tpu.ops import execute as X
from exp_execute import parse_ops, load_corpus

BLK = 1 << 16


def main():
    n = 16 << 20
    # de-duplicated-ish corpus: Twain blocks with per-block byte rotation
    # so cross-block repetition doesn't inflate op counts
    raw = load_corpus(n)
    data = bytearray(raw)
    for i in range(0, n, BLK):
        rot = (i // BLK) % 251
        blk = np.frombuffer(raw[i : i + BLK], np.uint8)
        data[i : i + BLK] = ((blk.astype(np.int32) + rot) % 256
                             ).astype(np.uint8).tobytes()
    data = bytes(data)
    blocks = [data[i : i + BLK] for i in range(0, n, BLK)]
    print("devices:", jax.devices())

    all_ops = []
    t0 = time.time()
    for blk in blocks:
        ops = parse_ops(s2.encode(blk))
        kinds = np.array([o[0] for o in ops])
        lens = np.array([o[1] for o in ops])
        offs = np.array([o[2] for o in ops])
        all_ops.append((kinds, lens, offs))
    print(f"parse: {time.time()-t0:.1f}s, "
          f"ops/blk={np.mean([len(k[0]) for k in all_ops]):.0f}")

    lit_rows = []
    for blk, (kinds, lens, offs) in zip(blocks, all_ops):
        lits = []
        pos = 0
        for k in range(len(kinds)):
            if kinds[k] == 0:
                lits.append(blk[pos : pos + lens[k]])
            pos += lens[k]
        buf = b"".join(lits)
        arr = np.zeros(512 * 128, np.float32)
        arr[: len(buf)] = np.frombuffer(buf, np.uint8)
        lit_rows.append(arr.reshape(512, 128))
    lit_rows = np.stack(lit_rows)

    for mr in (1, 2, 4, 8):
        t0 = time.time()
        plans = [X.plan_block_ops(k, l, o, max_rounds=mr)
                 for k, l, o in all_ops]
        tplan = time.time() - t0
        pieces = sum(len(p["src"]) for p in plans)
        src, dst, length, caps = X.pack_plans(plans)
        pad_total = src.shape[0] * src.shape[1]
        t0 = time.time()
        out = X.execute_rounds_jit(lit_rows, src, dst, length, caps)
        out.block_until_ready()
        tcomp = time.time() - t0
        t0 = time.time()
        out = X.execute_rounds_jit(lit_rows, src, dst, length, caps)
        np.asarray(out.ravel()[0:1])
        dt = time.time() - t0
        got = np.asarray(out, np.float32).reshape(len(blocks), -1)
        want = np.frombuffer(data, np.uint8).reshape(len(blocks), -1)
        ok = (got == want).all()
        print(f"max_rounds={mr}: rounds_caps={caps} pieces={pieces} "
              f"padded={pad_total} plan={tplan:.1f}s compile={tcomp:.1f}s "
              f"device={dt*1e3:.1f}ms -> {n/dt/1e9:.2f} GB/s exact={ok}")


if __name__ == "__main__":
    main()
