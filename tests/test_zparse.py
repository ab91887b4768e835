"""ops/zparse.py — Pallas zstd parse+extract kernel vs a serial oracle.

The oracle replicates, in numpy + the XLA reference pieces, exactly what
the kernel computes: chain extension at the finder cap, short-offset rle
probes, zstd gating, greedy tile parse + cross-tile merge
(lz2._parse/_merge_tile_chains), then serial sequence/literal extraction.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu.ops import lz2, lzkern, zparse  # noqa: E402

BS = 65536
TILE = 512
CAP = 10


def _chain_ext_np(off, L):
    cont = np.zeros(BS, bool)
    idx = np.arange(BS - CAP)
    cont[:BS - CAP] = ((L[:BS - CAP] == CAP) & (off[CAP:] == off[:BS - CAP])
                       & (off[:BS - CAP] > 0) & (L[CAP:] >= 4))
    r = np.zeros(BS + CAP, np.int64)
    for i in range(BS - CAP - 1, -1, -1):
        r[i] = 1 + r[i + CAP] if cont[i] else 0
    r = r[:BS]
    return np.where((L == CAP) & (r > 0), CAP * r + 4, L)


def _rle_np(blk, off, L):
    for o in (1, 2, 3, 4, 8):
        m = np.zeros(BS, bool)
        m[o:] = blk[o:] == blk[:-o]
        run = np.zeros(BS + 1, np.int64)
        for i in range(BS - 1, -1, -1):
            if m[i]:
                run[i] = 1 + (run[i + 1] if (i % TILE) != TILE - 1 else 0)
        run = run[:BS]
        better = (run > L) & (run >= 4)
        L = np.where(better, run, L)
        off = np.where(better, o, off)
    return off, L


def _gate_np(off, L):
    min_l = 6 + (off >= 1024).astype(np.int64) + (off >= 65536).astype(np.int64)
    return np.where(L >= min_l, L, 0)


def _extract_np(blk, take, lit, L2, off):
    """Serial sequence/literal extraction from the parsed op masks."""
    lls, mls, ofs, lits = [], [], [], []
    run = 0
    for p in range(BS):
        if take[p]:
            lls.append(run)
            mls.append(int(L2[p]))
            ofs.append(int(off[p]))
            run = 0
        elif lit[p]:
            lits.append(blk[p])
            run += 1
    return (np.array(lls, np.int64), np.array(mls, np.int64),
            np.array(ofs, np.int64), np.array(lits, np.uint8))


def _oracle(blk, off0, L0):
    off = np.asarray(off0, np.int64)
    L = np.asarray(L0, np.int64)
    L = _chain_ext_np(off, L)
    off, L = _rle_np(blk, off, L)
    L = _gate_np(off, L)
    take, lit, L_t, offj = lz2._parse(jnp.asarray(off.astype(np.int32)),
                                      jnp.asarray(L.astype(np.int32)),
                                      BS, TILE, cap=TILE)
    take, lit, L2, offj = lz2._merge_tile_chains(
        take[None], lit[None], L_t[None], offj[None], BS, TILE)
    return _extract_np(blk, np.asarray(take[0]), np.asarray(lit[0]),
                       np.asarray(L2[0]), np.asarray(offj[0]))


def _datasets():
    rng = np.random.default_rng(3)
    tw = np.frombuffer(open(
        "/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb"
    ).read()[:BS], np.uint8).copy()
    html = np.frombuffer(open(
        "/root/reference/testdata/html.txt", "rb").read(), np.uint8)
    html = np.tile(html, BS // len(html) + 1)[:BS].copy()
    rand = rng.integers(0, 256, BS, dtype=np.uint8)
    zeros = np.zeros(BS, np.uint8)
    period = np.tile(rng.integers(0, 256, 777, dtype=np.uint8),
                     BS // 777 + 1)[:BS].copy()
    # the merge-gate crafted case
    crafted = rng.integers(0, 256, BS, dtype=np.uint8)
    idx = np.arange(100, 1024)
    crafted[idx] = np.array([65, 66, 67], np.uint8)[(idx - 100) % 3]
    for i in range(1024, 1032):
        crafted[i] = crafted[i - 5]
    return dict(twain=tw, html=html, rand=rand, zeros=zeros,
                period=period, crafted=crafted)


def test_zparse_matches_oracle():
    datas = _datasets()
    blocks = np.stack(list(datas.values()))
    bj = jnp.asarray(blocks)
    off, L = lzkern.find_matches_blocks(bj, interpret=True)
    ll, ml, of, lits, n_seqs, lit_cnt = zparse.parse_blocks(
        bj, off, L, interpret=True)
    offn, Ln = np.asarray(off), np.asarray(L)
    for i, name in enumerate(datas):
        el, em, eo, elit = _oracle(blocks[i], offn[i], Ln[i])
        ns = int(np.asarray(n_seqs)[i])
        lc = int(np.asarray(lit_cnt)[i])
        assert ns == len(el), (name, ns, len(el))
        assert lc == len(elit), (name, lc, len(elit))
        assert np.array_equal(np.asarray(ll)[i][:ns], el), name
        assert np.array_equal(np.asarray(ml)[i][:ns], em), name
        assert np.array_equal(np.asarray(of)[i][:ns], eo), name
        assert np.array_equal(np.asarray(lits)[i][:lc], elit), name
        # padding stays zero
        assert not np.asarray(ll)[i][ns:].any(), name
        assert not np.asarray(lits)[i][lc:].any(), name


def test_zparse_long_range_offsets():
    """LDM-style channel: offsets exceeding the in-block position (job
    history reach) flow through gating/parse/extraction untouched."""
    rng = np.random.default_rng(9)
    blk = rng.integers(0, 256, BS, dtype=np.uint8)
    off = np.zeros(BS, np.int32)
    L = np.zeros(BS, np.int32)
    # synthetic long-range matches (verification is the caller's job)
    for p, o, ln in ((100, 1 << 20, 64), (5000, 200000, 40),
                     (TILE * 3, 70000, 33), (60000, 3 << 20, 100)):
        off[p] = o
        L[p] = ln
    bj = jnp.asarray(blk[None, :])
    ll, ml, of, lits, n_seqs, lit_cnt = zparse.parse_blocks(
        bj, jnp.asarray(off[None]), jnp.asarray(L[None]), interpret=True)
    el, em, eo, elit = _oracle(blk, off, L)
    ns = int(np.asarray(n_seqs)[0])
    assert ns == len(el)
    assert np.array_equal(np.asarray(of)[0][:ns], eo)
    assert np.array_equal(np.asarray(ml)[0][:ns], em)
    assert np.array_equal(np.asarray(ll)[0][:ns], el)
    assert int(np.asarray(lit_cnt)[0]) == len(elit)
