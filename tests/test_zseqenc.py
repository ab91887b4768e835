"""ops/zseqenc.py — Pallas sequence-encode kernels vs the zdev XLA scans."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu.ops import zdev, zseqenc  # noqa: E402

R, MS = 5, 1024


def _mk_seqs(seed=0):
    rng = np.random.default_rng(seed)
    n_seqs = np.array([0, 1, 3, 700, MS], np.int32)
    si = np.arange(MS)[None, :]
    is_seq = si < n_seqs[:, None]
    of_v = rng.integers(1, 70000, (R, MS)).astype(np.int32)
    # sprinkle repeats of recent offsets to exercise the rep machine
    for r in range(R):
        for i in range(2, MS):
            if rng.random() < 0.4:
                of_v[r, i] = of_v[r, i - rng.integers(1, 3)]
    ll_v = rng.integers(0, 50, (R, MS)).astype(np.int32)
    ll_v[rng.random((R, MS)) < 0.3] = 0
    of_v = np.where(is_seq, of_v, 0)
    ll_v = np.where(is_seq, ll_v, 0)
    return of_v, ll_v, n_seqs, is_seq


def test_rep_scan_matches_zdev():
    of_v, ll_v, n_seqs, is_seq = _mk_seqs()
    want = np.asarray(zdev._rep_offsets(jnp.asarray(of_v), jnp.asarray(ll_v),
                                        jnp.asarray(is_seq)))
    got = np.asarray(zseqenc.rep_scan(jnp.asarray(of_v), jnp.asarray(ll_v),
                                      jnp.asarray(n_seqs), interpret=True))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("rle_of", [False, True])
def test_fse_chain_matches_zdev(rle_of):
    rng = np.random.default_rng(7)
    _, _, n_seqs, is_seq = _mk_seqs()
    ll_c = np.where(is_seq, rng.integers(0, 36, (R, MS)), 0).astype(np.int32)
    ml_c = np.where(is_seq, rng.integers(0, 53, (R, MS)), 0).astype(np.int32)
    if rle_of:
        of_c = np.where(is_seq, 17, 0).astype(np.int32)
    else:
        of_c = np.where(is_seq, rng.integers(0, 31, (R, MS)), 0).astype(np.int32)

    log = zseqenc.FSE_LOG
    tabs = [zdev._fse_build(jnp.asarray(c), jnp.asarray(is_seq), 1, log)
            for c in (ll_c, of_c, ml_c)]
    st_val, st_nb, st_fin, logs = zdev._fse_scan(
        jnp.asarray(ll_c), jnp.asarray(of_c), jnp.asarray(ml_c),
        jnp.asarray(n_seqs), tabs, R)
    # zdev's fused item (write order: of, ml, ll LSB-first), flipped back
    # to natural seq order (zdev outputs are seq MS-1 first)
    s_of_v, s_ml_v, s_ll_v = (np.asarray(st_val[:, 1]),
                              np.asarray(st_val[:, 2]),
                              np.asarray(st_val[:, 0]))
    s_of_n, s_ml_n, s_ll_n = (np.asarray(st_nb[:, 1]),
                              np.asarray(st_nb[:, 2]),
                              np.asarray(st_nb[:, 0]))
    sh1 = np.clip(s_of_n, 0, 16)
    sh2 = np.clip(s_of_n + s_ml_n, 0, 26)
    want_v = np.flip(s_of_v | (s_ml_v << sh1) | (s_ll_v << sh2), axis=1)
    want_n = np.flip(s_of_n + s_ml_n + s_ll_n, axis=1)

    st_tab, pk_tab = zseqenc.doped_tables(tabs)
    pk_ll = pk_tab[0][ll_c]
    pk_of = pk_tab[1][of_c]
    pk_ml = pk_tab[2][ml_c]
    val, nb, fin = zseqenc.fse_chain(
        jnp.asarray(pk_ll), jnp.asarray(pk_of), jnp.asarray(pk_ml),
        jnp.asarray(n_seqs), jnp.asarray(st_tab), interpret=True)
    assert np.array_equal(np.asarray(nb), want_n)
    assert np.array_equal(np.asarray(val), want_v)
    assert np.array_equal(np.asarray(fin), np.asarray(st_fin))
