"""Experiment: device LZ-execute via tiled one-hot gather rounds.

Question this answers (gates the whole device-decode design):
  1. What is the copy-chain depth distribution of real LZ op streams
     (64KB-block s2 ops on Twain)? -> number of resolve rounds needed.
  2. How fast is one resolve round on the real chip when the per-byte
     gather is expressed as (512-tile one-hot matmul) x (128-lane rowwise
     select) inside each 64KB block?

Run ON THE REAL CHIP (no JAX_PLATFORMS override):
    python experiments/exp_execute.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

BLK = 1 << 16  # 64KB blocks
TWAIN = "/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt"


def load_corpus(n):
    data = open(TWAIN, "rb").read()
    return (data * (n // len(data) + 1))[:n]


def parse_ops(block):
    """Return per-op (is_copy, length, offset) from an s2 block body."""
    from compress_tpu.utils.varint import read_uvarint

    n, pos = read_uvarint(block)
    src = block[pos:]
    s = 0
    ops = []
    offset = 0
    while s < len(src):
        tag = src[s]
        t = tag & 3
        if t == 0:
            x = tag >> 2
            if x < 60:
                s += 1
            else:
                nb = x - 59
                x = int.from_bytes(src[s + 1 : s + 1 + nb], "little")
                s += 1 + nb
            L = x + 1
            s += L
            ops.append((0, L, 0))
        elif t == 1:
            toff = ((tag & 0xE0) << 3) | src[s + 1]
            L = (tag >> 2) & 7
            s += 2
            if toff == 0:
                if L == 5:
                    L = src[s] + 4
                    s += 1
                elif L == 6:
                    L = int.from_bytes(src[s : s + 2], "little") + 256
                    s += 2
                elif L == 7:
                    L = int.from_bytes(src[s : s + 3], "little") + 65536
                    s += 3
                L += 4
            else:
                offset = toff
                L += 4
            ops.append((1, L, offset))
        elif t == 2:
            offset = int.from_bytes(src[s + 1 : s + 3], "little")
            L = 1 + (tag >> 2)
            s += 3
            ops.append((1, L, offset))
        else:
            offset = int.from_bytes(src[s + 1 : s + 5], "little")
            L = 1 + (tag >> 2)
            s += 5
            ops.append((1, L, offset))
    return ops


def build_block_arrays(data):
    """Per-byte is_copy / src index arrays for every 64KB block."""
    from compress_tpu import s2

    blocks = [data[i : i + BLK] for i in range(0, len(data), BLK)]
    srcs, is_copies, vals = [], [], []
    nops_all = []
    for blk in blocks:
        enc = s2.encode(blk)
        ops = parse_ops(enc)
        nops_all.append(len(ops))
        kinds = np.array([o[0] for o in ops], np.int64)
        lens = np.array([o[1] for o in ops], np.int64)
        offs = np.array([o[2] for o in ops], np.int64)
        assert lens.sum() == len(blk)
        per_byte_op = np.repeat(np.arange(len(ops)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(blk), dtype=np.int64)
        rel = pos - starts[per_byte_op]
        is_copy = kinds[per_byte_op] == 1
        src = np.where(is_copy, pos - offs[per_byte_op], pos)
        v = np.frombuffer(blk, np.uint8)
        if len(blk) < BLK:  # pad final block with literals
            pad = BLK - len(blk)
            src = np.concatenate([src, np.arange(len(blk), BLK)])
            is_copy = np.concatenate([is_copy, np.zeros(pad, bool)])
            v = np.concatenate([v, np.zeros(pad, np.uint8)])
        srcs.append(src)
        is_copies.append(is_copy)
        vals.append(v)
        del rel
    print(f"blocks={len(blocks)} mean_ops/blk={np.mean(nops_all):.0f}")
    return (np.stack(srcs).astype(np.int32), np.stack(is_copies),
            np.stack(vals))


def host_depth(src, is_copy):
    """Rounds needed until all bytes resolve (value-round semantics)."""
    B, N = src.shape
    resolved = ~is_copy
    rounds = 0
    bidx = np.arange(B)[:, None]
    while not resolved.all():
        res_src = resolved[bidx, src]
        newly = (~resolved) & res_src
        if not newly.any():
            raise RuntimeError("stuck — self-referential op?")
        resolved |= newly
        rounds += 1
        frac = resolved.mean()
        print(f"  round {rounds}: resolved {frac*100:.2f}%")
    return rounds


# ---------------------------------------------------------------------------
# Device round kernel: V' = gather(V, src) where resolved, in-block
# ---------------------------------------------------------------------------


def make_round(n_tiles=512, lanes=128):
    def one_round(V, res, st, oh_l):
        # V, res: (B, n_tiles, lanes) bf16 / bool
        # st: (B, P) int32 source-tile id; oh_l: (B, P, lanes) bf16
        B = V.shape[0]
        P = st.shape[1]
        oh_t = jax.nn.one_hot(st, n_tiles, dtype=jnp.bfloat16)  # (B,P,T)
        rows_v = jnp.einsum("bpt,btl->bpl", oh_t, V,
                            preferred_element_type=jnp.float32)
        rows_r = jnp.einsum("bpt,btl->bpl", oh_t,
                            res.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        v_src = jnp.sum(rows_v * oh_l, axis=-1)  # (B, P)
        r_src = jnp.sum(rows_r * oh_l, axis=-1) > 0.5
        v_flat = V.reshape(B, P)
        res_flat = res.reshape(B, P)
        take = (~res_flat) & r_src
        v_new = jnp.where(take, v_src.astype(jnp.bfloat16), v_flat)
        res_new = res_flat | take
        return v_new.reshape(V.shape), res_new.reshape(res.shape)

    return one_round


def run_device(src, is_copy, vals, rounds, sub_batch=16):
    B, P = src.shape
    lanes = 128
    n_tiles = P // lanes
    one_round = make_round(n_tiles, lanes)

    @jax.jit
    def execute(V0, res0, st, sl):
        oh_l = jax.nn.one_hot(sl, lanes, dtype=jnp.bfloat16)
        def body(carry, _):
            V, res = carry
            V, res = one_round(V, res, st, oh_l)
            return (V, res), 0
        (V, res), _ = jax.lax.scan(body, (V0, res0), None, length=rounds)
        return V, res

    st = src >> 7
    sl = src & 127
    V0 = np.where(is_copy, 0, vals).astype(np.float32)
    res0 = ~is_copy

    outs = []
    t_total = 0.0
    for lo in range(0, B, sub_batch):
        hi = min(lo + sub_batch, B)
        args = (
            jnp.asarray(V0[lo:hi].reshape(hi - lo, n_tiles, lanes),
                        jnp.bfloat16),
            jnp.asarray(res0[lo:hi].reshape(hi - lo, n_tiles, lanes)),
            jnp.asarray(st[lo:hi]),
            jnp.asarray(sl[lo:hi]),
        )
        V, res = execute(*args)  # warm compile on first
        V.block_until_ready()
        t0 = time.time()
        V, res = execute(*args)
        np.asarray(V.ravel()[0:1])  # force 1-elem read
        t_total += time.time() - t0
        outs.append((np.asarray(V, np.float32), np.asarray(res)))
    return outs, t_total


def main():
    n = 16 << 20
    data = load_corpus(n)
    print("building op arrays...")
    t0 = time.time()
    src, is_copy, vals = build_block_arrays(data)
    print(f"  {time.time()-t0:.1f}s; copy frac {is_copy.mean()*100:.1f}%")

    print("host depth analysis:")
    rounds = host_depth(src, is_copy)
    print(f"depth = {rounds} rounds")

    print(f"device execute ({rounds} rounds)...")
    print("devices:", jax.devices())
    outs, dt = run_device(src, is_copy, vals, rounds)
    V = np.concatenate([o[0] for o in outs])
    res = np.concatenate([o[1] for o in outs])
    assert res.all(), f"unresolved {100*(1-res.mean()):.3f}%"
    got = V.reshape(V.shape[0], -1).astype(np.uint8)
    want = vals
    ok = (got == want).all()
    print(f"bit-exact: {ok}")
    gbps = n / dt / 1e9
    print(f"execute: {dt*1e3:.1f} ms for 16MB -> {gbps:.2f} GB/s/chip")


if __name__ == "__main__":
    main()
