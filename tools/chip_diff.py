"""On-chip differential sweep: compiled Mosaic vs interpret mode for
every Pallas kernel, over hostile shapes (the `noasm` contract analogue
— SURVEY §4.5; reference: the asm/noasm build-tag differential tests).

Run ON the TPU (no env override):  python tools/chip_diff.py
Each kernel runs the same inputs compiled and interpreted; any mismatch
is a Mosaic lowering bug (the class that produced the +1 offset
corruption from default-precision MXU dots, found 2026-08-20).
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _datasets():
    rng = np.random.default_rng(3)
    tw = np.frombuffer(open(
        "/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb"
    ).read()[:65536], np.uint8).copy()
    html = np.frombuffer(open(
        "/root/reference/testdata/html.txt", "rb").read(), np.uint8)
    html = np.tile(html, 65536 // len(html) + 1)[:65536].copy()
    rand = rng.integers(0, 256, 65536, dtype=np.uint8)
    zeros = np.zeros(65536, np.uint8)
    period = np.tile(rng.integers(0, 256, 777, dtype=np.uint8),
                     65536 // 777 + 1)[:65536].copy()
    ramp = (np.arange(65536) & 255).astype(np.uint8)
    # crafted merge-gate case
    crafted = rng.integers(0, 256, 65536, dtype=np.uint8)
    idx = np.arange(100, 1024)
    crafted[idx] = np.array([65, 66, 67], np.uint8)[(idx - 100) % 3]
    for i in range(1024, 1032):
        crafted[i] = crafted[i - 5]
    return [tw, html, rand, zeros, period, ramp, crafted]


def main() -> int:
    import jax.numpy as jnp

    from compress_tpu.ops import lzemit, lzemit2, lzkern, zparse, zseqenc

    blocks = np.stack(_datasets())
    bj = jnp.asarray(blocks)
    bad = 0

    def diff(name, a, b):
        nonlocal bad
        eq = all(np.array_equal(np.asarray(x), np.asarray(y))
                 for x, y in zip(a, b))
        print(f"{name:28s} {'OK' if eq else 'MISMATCH'}", flush=True)
        bad += 0 if eq else 1
        return eq

    # finder (both variants)
    f_c = lzkern.find_matches_blocks(bj)
    f_i = lzkern.find_matches_blocks(bj, interpret=True)
    diff("lzkern finder", f_c, f_i)
    diff("lzkern finder slim",
         lzkern.find_matches_blocks(bj, slim=True),
         lzkern.find_matches_blocks(bj, slim=True, interpret=True))

    off, L = f_c
    diff("lzemit v1", lzemit.emit_blocks(bj, off, L),
         lzemit.emit_blocks(bj, off, L, interpret=True))
    diff("lzemit2", lzemit2.emit_blocks(bj, off, L),
         lzemit2.emit_blocks(bj, off, L, interpret=True))

    zp_c = zparse.parse_blocks(bj, off, L)
    zp_i = zparse.parse_blocks(bj, off, L, interpret=True)
    diff("zparse", zp_c, zp_i)

    ll_v, ml_v, of_raw, lits, n_seqs, lit_cnt = zp_c
    rs_c = zseqenc.rep_scan(of_raw, ll_v, n_seqs)
    rs_i = zseqenc.rep_scan(of_raw, ll_v, n_seqs, interpret=True)
    diff("zseqenc rep_scan", (rs_c,), (rs_i,))

    from compress_tpu.ops import zenc2

    (pk_ll, pk_of, pk_ml, tables, extras, norm, rle3,
     rle_sym3) = zenc2._codes_stage(ll_v, ml_v, rs_c, n_seqs)
    diff("zseqenc fse_chain",
         zseqenc.fse_chain(pk_ll, pk_of, pk_ml, n_seqs, tables),
         zseqenc.fse_chain(pk_ll, pk_of, pk_ml, n_seqs, tables,
                           interpret=True))

    packed_tab = jnp.zeros((bj.shape[0], 2, 128), jnp.int32) + (
        jnp.arange(128, dtype=jnp.int32)[None, None, :] | (7 << 16))
    diff("zenc2 litlut",
         zenc2._litlut(lits, packed_tab),
         zenc2._litlut(lits, packed_tab, interpret=True))

    # whole-pipeline frame check vs host decoder
    from compress_tpu import zstd as Z
    from compress_tpu.zstd import device as ZD

    data = blocks.reshape(-1).tobytes()[: 4 << 16]
    blob = ZD.compress_device(data + data, engine="v2", job=1 << 19)
    ok = Z.decompress(blob) == data + data
    print(f"{'v2 compiled frame roundtrip':28s} {'OK' if ok else 'FAIL'}")
    bad += 0 if ok else 1

    print("chip_diff:", "ALL OK" if bad == 0 else f"{bad} MISMATCHES")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
