"""TPU device zstd encoder v2 — the Pallas-kernel pipeline.

Replaces ops/zdev.py's XLA-graph job encoder (0.047 GB/s across rounds
1-4; stage split per 16 MB: 102 ms XLA sort + 54 ms parse/extras +
~95 ms compactions + ~105 ms entropy/pack) with the kernel tier:

  1. ops/lzkern.py    — bitonic exact match finder per 64 KiB block.
  2. ops/zparse.py    — parse + gating + in-VMEM seq/literal extraction.
  3. XLA              — per-block huff0 literals (table build, MXU code
                        lookup, 4-stream bit-pack) + batch-shared FSE
                        table build + per-seq delta lookups.
  4. ops/zseqenc.py   — serial rep-offset + FSE state chains in VMEM.
  5. XLA              — MXU bit-pack of the sequence items.

Geometry: 64 KiB zstd blocks (the Pallas panel size; format max is
128 KiB).  The finder's matches are block-local; job-wide (and
into-the-overlap-prefix) candidates come from the winnowed LDM channel
(_ldm_channel), so the effective window is the whole job + prefix —
4 MiB + 512 KiB by default through zstd/device.py (the reference's L1
window scale, encoder_options.go:246-263).

FSE sequence tables are BATCH-SHARED at accuracy log 7 (vs zdev's
per-job 9/8/9): the serial chain kernel then needs one lane-gather per
stream per step.  Each job's first sequence block writes the (shared)
table, later blocks use Repeat_Mode — identical host assembly
(zstd/device.py).  Huffman literal tables stay per-block.

Output dict: the zdev.zstd_encode_jobs contract (zstd/device.py
assembles either).  Reference roles: zstd/enc_fast.go:39,
zstd/blockenc.go, the encodeblock asm tier (SURVEY §2.10).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.ops import lzkern, zparse, zseqenc
from compress_tpu.ops.zdev import (_huff_build, _canonical_codes_dev,
                                   _bitpack_rows, _fse_build, _lut,
                                   _ll_code, _ml_code, _of_code, LIT_TO)
from compress_tpu.zstd import seqs as S

BLOCK = 1 << 16        # 64 KiB — the Pallas panel size
MAXSEQ = zparse.MAXSEQ  # 12288
SEQ_TO = 208           # per-128-item tile: <= ~43 seqs * 73 bits + slack
FSE_LOG = zseqenc.FSE_LOG

LDM_STRIDE = 16        # long-range winnow window (1 anchor per window)
LDM_MIN = 24           # minimum accepted long-range match length


@functools.partial(jax.jit, static_argnames=("pre", "job"))
def _ldm_channel(full, has_prefix, pre: int, job: int):
    """Winnowed long-range match channel over the job+prefix span — the
    long-distance half of the reference's two-table strategy
    (zstd/enc_dfast.go long-table role; libzstd's LDM analogue),
    re-designed content-defined + sort-based + GATHER-FREE for the TPU
    (XLA gather runs ~85 Melem/s on chip; the first cut spent 2.5 s of a
    2.7 s pipeline in take_along_axis):

    - winnowing: every 8-byte window selects one anchor by argmin of a
      rolling fingerprint, so both copies of a repeat select the same
      content positions regardless of byte alignment (a strided grid
      only ever finds offsets divisible by the stride);
    - anchor-side values come from one-hot slot selects (elementwise,
      no gather); candidate-side values ride the SORT as payload
      (stable sort by 64-byte key hash: the adjacent equal key IS the
      nearest previous occurrence, and its payload words verify 24
      bytes exactly — hash collisions are rejected here);
    - a reach-propagation heal pass (static-shift max scan) lets
      anchors inside an earlier anchor's verified span inherit its
      offset (the two copies' winnowing grids only agree on ~half the
      anchors), then same-offset chains link by a segmented suffix
      scan — all static shifts, zero gathers.

    Returns per-byte (off, L) channels over the job region for the
    zparse merge; every claimed byte is verified."""
    nj, span = full.shape
    NS = span // LDM_STRIDE
    b = full.astype(jnp.int32)
    bp = jnp.pad(b, ((0, 0), (0, 96)))
    # aligned byte panel: B96[b, n, t] = byte at 16n + t, t in [0, 96) —
    # six aligned slices instead of 64 unaligned word-slice relayouts
    # (measured 2.2x on chip)
    panels = [bp[:, 16 * m: 16 * m + span].reshape(nj, NS, 16)
              for m in range(6)]
    B96 = jnp.concatenate(panels, axis=2)

    # winnowing: per-16-window argmin of a rolling 8-byte fingerprint
    w0w = (B96[..., 0:16] | (B96[..., 1:17] << 8)
           | (B96[..., 2:18] << 16) | (B96[..., 3:19] << 24))
    w1w = (B96[..., 4:20] | (B96[..., 5:21] << 8)
           | (B96[..., 6:22] << 16) | (B96[..., 7:23] << 24))
    hwin = ((w0w * jnp.int32(-1640531527)) ^ (w1w * jnp.int32(-2048144789))
            ) & jnp.int32(0x7FFFFFFF)
    d = jnp.argmin(hwin, axis=2).astype(jnp.int32)        # (nj, NS) in [0,16)
    oh_d = jax.nn.one_hot(d, LDM_STRIDE, dtype=jnp.int32)
    wi = jnp.broadcast_to(jnp.arange(NS, dtype=jnp.int32), (nj, NS))
    a = wi * LDM_STRIDE + d                               # anchor positions

    # anchor-relative bytes -> the 16 verification words (64 bytes)
    ABs = [jnp.sum(oh_d * jax.lax.dynamic_slice_in_dim(B96, t, 16, 2),
                   axis=2) for t in range(67)]
    NW = 16      # words carried as sort payload: 64 verified bytes (48
                 # costs +5% size on replicas for only ~4% speed)
    Ws = [ABs[4 * j] | (ABs[4 * j + 1] << 8) | (ABs[4 * j + 2] << 16)
          | (ABs[4 * j + 3] << 24) for j in range(16)]
    # 64-byte key fingerprint (the reference LDM's minMatchLength scale):
    # an 8-byte key would send common 8-grams to NEAR candidates and
    # break replica chains; only 64-byte-repeating content should match.
    ha = Ws[0] * jnp.int32(-1640531527) ^ Ws[1] * jnp.int32(-2048144789)
    for k in range(1, 8):
        ha = (ha * jnp.int32(-1028477387)) ^ \
            (Ws[2 * k] * jnp.int32(-1640531527)) ^ \
            (Ws[2 * k + 1] * jnp.int32(-2048144789))

    srt = jax.lax.sort((ha, a) + tuple(Ws[:NW]), dimension=1,
                       num_keys=1)
    hs, a_s = srt[0], srt[1]
    Ws_s = srt[2:]

    def prev(x, fill):
        return jnp.concatenate(
            [jnp.full((nj, 1), fill, x.dtype), x[:, :-1]], axis=1)

    same = (hs == prev(hs, jnp.int32(-(1 << 31)))) \
        & (prev(a_s, 1 << 30) < a_s)
    c_s = prev(a_s, 0)
    # verified 4-byte groups against the previous (= nearest) occurrence
    lead_s = jnp.zeros((nj, NS), jnp.int32)
    live = same
    for j in range(NW):
        live = live & (Ws_s[j] == prev(Ws_s[j], -1))
        lead_s = lead_s + live.astype(jnp.int32)
    L_s = 4 * lead_s
    # unsort by anchor position, carrying (cand pos, L)
    _, c, L = jax.lax.sort((a_s, c_s, L_s), dimension=1, num_keys=1)
    L = jnp.minimum(L, jnp.maximum(span - a, 0))
    off = jnp.where(L > 0, a - c, 0)
    valid = L > 0

    def shl(x, s_, fill):                                 # x[i+s]
        return jnp.concatenate(
            [x[:, s_:], jnp.full((nj, s_), fill, x.dtype)], axis=1)

    def shr(x, s_, fill):                                 # x[i-s]
        return jnp.concatenate(
            [jnp.full((nj, s_), fill, x.dtype), x[:, :-s_]], axis=1)

    # two rounds of (reach-propagation heal, same-offset chain link):
    # the heal lets an anchor inside an earlier anchor's verified span
    # inherit its offset + remaining coverage (the two copies' winnowing
    # grids only agree on ~half the anchors; everything stays verified —
    # a subrange), the chain links same-offset runs by a segmented
    # suffix scan of the run end (anchor gaps are <= 15 bytes).  The
    # second round links through anchors whose healed spans were too
    # short to cover the next gap in round one.
    for _round in range(2):
        reach = jnp.where(valid, a + L, -1)
        roff = off
        for k in range(18):
            s_ = 1 << k
            if s_ >= NS:
                break
            sh_r = shr(reach, s_, -1)
            sh_o = shr(roff, s_, 0)
            take = sh_r > reach
            reach = jnp.where(take, sh_r, reach)
            roff = jnp.where(take, sh_o, roff)
        heal = (reach - a > L) & (reach > a) & (roff > 0) & (a - roff >= 0)
        off = jnp.where(heal, roff, off)
        L = jnp.where(heal, reach - a, L)
        valid = valid | heal

        cont = ((shl(off, 1, -1) == off) & valid & (shl(L, 1, 0) > 0)
                & (shl(a, 1, 1 << 30) <= a + L))
        endv = a + L
        R_ = jnp.where(cont, 0, endv)
        B_ = ~cont
        for k in range(18):
            s_ = 1 << k
            if s_ >= NS:
                break
            Rs = shl(R_, s_, 0)
            Bs = shl(B_, s_, True)
            R_ = jnp.where(B_, R_, Rs)
            B_ = B_ | Bs
        L = jnp.where(valid, R_ - a, 0)

    # gating: prefix reach + minimum length (healed offsets included)
    okpre = has_prefix[:, None] | (a - off >= pre)
    L = jnp.where(valid & okpre & (L >= LDM_MIN), L, 0)
    offv = jnp.where(L > 0, off, 0)

    # emit at anchor positions via per-window one-hot (no scatter)
    off_full = (oh_d * offv[:, :, None]).reshape(nj, span)
    L_full = (oh_d * L[:, :, None]).reshape(nj, span)
    return off_full[:, pre:], L_full[:, pre:]



def _litlut_kernel(lit_ref, tab_ref, code_ref, nb_ref):
    """Per-block Huffman code lookup: 2 broadcast lane-gathers + select
    instead of a (R, 64Ki, 256) one-hot einsum (which is HBM-bound on
    the materialized one-hot — measured ~11 ms per 16 MB)."""
    lit = lit_ref[0].astype(jnp.int32)
    shp = lit.shape
    t0 = jnp.broadcast_to(tab_ref[0, 0:1, :], shp)
    t1 = jnp.broadcast_to(tab_ref[0, 1:2, :], shp)
    idx = lit & 127
    g0 = jnp.take_along_axis(t0, idx, axis=1)
    g1 = jnp.take_along_axis(t1, idx, axis=1)
    e = jnp.where(lit < 128, g0, g1)          # code | nb << 16
    code_ref[0] = e & 0xFFFF
    nb_ref[0] = e >> 16


def _litlut(lits, packed_tab, interpret=False):
    """lits (R, BS) u8 + packed per-block tables (R, 2, 128) i32
    (code | nb<<16) -> (lcode, lnb) each (R, BS) i32."""
    import jax.experimental.pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu

    R = lits.shape[0]
    bs = lits.shape[1]
    rows = bs // 128
    spec = _pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0),
                         memory_space=_pltpu.VMEM)
    code, nb = _pl.pallas_call(
        _litlut_kernel,
        grid=(R,),
        in_specs=[spec,
                  _pl.BlockSpec((1, 2, 128), lambda b: (b, 0, 0),
                                memory_space=_pltpu.VMEM)],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((R, rows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((R, rows, 128), jnp.int32)),
        interpret=interpret,
    )(lits.reshape(R, rows, 128), packed_tab)
    return code.reshape(R, bs), nb.reshape(R, bs)


def _literal_stage(lits, lit_cnt, bs, interpret=False):
    """Per-block huff0 literal path on compacted literals (zdev's code at
    64 KiB block scale): table build, code lookup, 4-stream bit-pack."""
    R = lits.shape[0]
    idx = jnp.arange(bs, dtype=jnp.int32)[None, :]
    is_lit = idx < lit_cnt[:, None]
    litsi = lits.astype(jnp.int32)

    oh_lit = jax.nn.one_hot(litsi, 256, dtype=jnp.bfloat16)
    hist = jnp.einsum("rb,rbs->rs", is_lit.astype(jnp.bfloat16), oh_lit,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    nbits_t, max_bits, huff_ok = _huff_build(hist)
    codes_t = _canonical_codes_dev(nbits_t, max_bits)

    packed_tab = (codes_t | (nbits_t << 16)).reshape(R, 2, 128)
    lcode, lnb = _litlut(lits, packed_tab, interpret=interpret)
    lnb = jnp.where(is_lit, lnb, 0)
    lcode = jnp.where(is_lit, lcode, 0)

    seg = (lit_cnt[:, None] + 3) >> 2
    q = jnp.clip(idx // jnp.maximum(seg, 1), 0, 3)
    cs = jnp.cumsum(lnb, axis=1)
    oh_q = jax.nn.one_hot(q, 4, dtype=jnp.bfloat16)
    bq = jnp.einsum("ri,riq->rq", lnb.astype(jnp.bfloat16), oh_q,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    oh_qf = oh_q.astype(jnp.float32)
    prev_bits = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(bq, axis=1)[:, :-1]],
        axis=1)
    prev_of_q = jnp.einsum("riq,rq->ri", oh_qf, prev_bits.astype(jnp.float32),
                           precision="highest").astype(jnp.int32)
    c_in_q = cs - prev_of_q
    bq_of_i = jnp.einsum("riq,rq->ri", oh_qf, bq.astype(jnp.float32),
                         precision="highest").astype(jnp.int32)
    sh = (bq + 16) >> 4
    sbase = jnp.stack([sh[:, 1] + sh[:, 2] + sh[:, 3],
                       sh[:, 2] + sh[:, 3],
                       sh[:, 3],
                       jnp.zeros_like(sh[:, 0])], axis=1)
    sbase_of_i = jnp.einsum("riq,rq->ri", oh_qf, sbase.astype(jnp.float32),
                            precision="highest").astype(jnp.int32)
    dest_bit = 16 * sbase_of_i + (bq_of_i - c_in_q)
    dest_bit = jnp.where(is_lit, dest_bit, 0)
    # v2 geometry: T=256/to=192 halves the route's one-hot; literal
    # items are <= 11 bits so the third half-plane drops too
    lit_halves, lit_nh = _bitpack_rows(
        jnp.flip(lcode, axis=1), jnp.flip(lnb, axis=1),
        jnp.flip(dest_bit, axis=1), 192,
        region_end=sbase[:, 0] + sh[:, 0], T=256,
        bytesplit=True, max_item_bits=11)
    return nbits_t, max_bits, huff_ok, bq, lit_halves, lit_nh


@functools.partial(jax.jit, static_argnames=())
def _codes_stage(ll_v, ml_v, of_v2, n_seqs):
    """Codes + shared FSE tables + per-seq packed deltas (XLA glue)."""
    R, MS = ll_v.shape
    si = jnp.arange(MS, dtype=jnp.int32)[None, :]
    is_seq = si < n_seqs[:, None]
    ll_c = jnp.where(is_seq, _ll_code(ll_v), 0)
    ml_c = jnp.where(is_seq, _ml_code(jnp.maximum(ml_v, 3)), 0)
    of_c = jnp.where(is_seq, _of_code(jnp.maximum(of_v2, 1)), 0)

    tabs = [_fse_build(c, is_seq, 1, FSE_LOG)
            for c in (ll_c, of_c, ml_c)]
    # dope RLE streams so the chain kernel emits zero bits naturally
    size = 1 << FSE_LOG
    st_rows, pks = [], []
    for t, c in zip(tabs, (ll_c, of_c, ml_c)):
        rle = t["rle"][0]
        st_row = jnp.where(rle, size, t["st"][0][:size])
        dnb_row = jnp.where(rle, -size, t["dnb"][0])
        dfs_row = jnp.where(rle, -size, t["dfs"][0])
        # per-seq delta lookups (f32-exact: |dnb| < 2^24)
        dnb_i = _lut(dnb_row, c, dtype=jnp.float32)
        dfs_i = _lut(dfs_row, c, dtype=jnp.float32)
        pks.append(((dnb_i + 128) << 9) | (dfs_i + 128))
        st_rows.append(st_row)
    tables = jnp.stack(st_rows, axis=0).astype(jnp.int32)   # (3, 128)

    # extras (natural seq order)
    llx_v = ll_v - _lut(np.asarray(S.LL_BASELINE, np.int32),
                        jnp.minimum(ll_c, 35), dtype=jnp.float32)
    llx_n = _lut(np.asarray(S.LL_BITS, np.int32), jnp.minimum(ll_c, 35))
    mlx_v = ml_v - _lut(np.asarray(S.ML_BASELINE, np.int32),
                        jnp.minimum(ml_c, 52), dtype=jnp.float32)
    mlx_n = _lut(np.asarray(S.ML_BITS, np.int32), jnp.minimum(ml_c, 52))
    ofx_v = of_v2 - (1 << jnp.clip(of_c, 0, 30))
    ofx_n = of_c
    ex = [jnp.where(is_seq, x, 0) for x in
          (llx_v, llx_n, mlx_v, mlx_n, ofx_v, ofx_n)]
    norm = jnp.concatenate([t["norm"] for t in tabs], axis=0)   # (3, 64)
    rle3 = jnp.stack([t["rle"][0] for t in tabs])
    rle_sym3 = jnp.stack([t["rle_sym"][0] for t in tabs])
    return pks[0], pks[1], pks[2], tables, ex, norm, rle3, rle_sym3


@functools.partial(jax.jit, static_argnames=())
def _pack_stage(st_val, st_nb, st_fin, extras, rle3, n_seqs):
    """Assemble per-seq items (write order) and bit-pack the sequence
    stream (zdev layout: [fused states, llx|mlx, ofx] per seq + flush)."""
    R, MS = st_val.shape
    llx_v, llx_n, mlx_v, mlx_n, ofx_v, ofx_n = extras

    def flipseq(x):
        return jnp.flip(x, axis=1)

    fx_llx_v, fx_llx_n = flipseq(llx_v), flipseq(llx_n)
    fx_mlx_v, fx_mlx_n = flipseq(mlx_v), flipseq(mlx_n)
    x2_v = fx_llx_v | (fx_mlx_v << jnp.clip(fx_llx_n, 0, 16))
    x2_n = fx_llx_n + fx_mlx_n
    items_v = jnp.stack([flipseq(st_val), x2_v, flipseq(ofx_v)], axis=2)
    items_n = jnp.stack([flipseq(st_nb), x2_n, flipseq(ofx_n)], axis=2)
    items_v = items_v.reshape(R, MS * 3)
    items_n = items_n.reshape(R, MS * 3)

    has_seq = (n_seqs > 0)[:, None]
    log7 = jnp.where(rle3, 0, FSE_LOG)                   # (3,) ll/of/ml
    # flush packs (ml, of, ll) LSB-first
    fsh1 = jnp.clip(log7[2], 0, 16)
    fsh2 = jnp.clip(log7[2] + log7[1], 0, 26)
    fl_v = (st_fin[:, 2] | (st_fin[:, 1] << fsh1)
            | (st_fin[:, 0] << fsh2))[:, None]
    fl_n = jnp.where(has_seq, (log7[0] + log7[1] + log7[2])[None], 0)
    pad = (-(MS * 3 + 1)) % 512
    items_v = jnp.concatenate(
        [items_v, jnp.where(has_seq, fl_v, 0),
         jnp.zeros((R, pad), jnp.int32)], axis=1)
    items_n = jnp.concatenate(
        [items_n, fl_n, jnp.zeros((R, pad), jnp.int32)], axis=1)
    seq_bits_cum = jnp.cumsum(items_n, axis=1)
    seq_dest = seq_bits_cum - items_n
    seq_total_bits = seq_bits_cum[:, -1]
    seq_halves, seq_nh = _bitpack_rows(items_v, items_n, seq_dest, SEQ_TO,
                                       region_end=(seq_total_bits + 16) >> 4,
                                       T=128, bytesplit=True)
    return seq_halves, seq_nh, seq_total_bits


_lit_stage_jit = jax.jit(_literal_stage,
                         static_argnames=("bs", "interpret"))


@functools.partial(jax.jit,
                   static_argnames=("job", "block", "tile", "debug",
                                    "level", "ldm", "interpret"))
def zstd_encode_jobs_v2(jobs, job: int = 1 << 20, block: int = BLOCK,
                        tile: int = 512, debug: bool = False,
                        prefixes=None, has_prefix=None, level: int = 2,
                        ldm_channel=None, ldm: bool = True,
                        interpret: bool = False):
    """jobs: (NJ, job) uint8 -> zdev-contract dict for zstd/device.py.

    block must be 64 KiB (the kernel panel).  Matches are block-local
    unless `ldm_channel=(off, L)` (per-position long-range candidates
    over the flattened jobs) is provided.  `level` is accepted for
    engine signature parity (the kernel finder has one depth)."""
    assert block == BLOCK, "v2 pipeline runs on 64 KiB blocks"
    nj = jobs.shape[0]
    nblk = job // block
    R = nj * nblk
    blocks = jobs.reshape(R, block)

    off, L = lzkern.find_matches_blocks(blocks, interpret=interpret)
    if ldm_channel is None and ldm:
        pre = 0 if prefixes is None else prefixes.shape[1]
        full = jobs if prefixes is None else jnp.concatenate(
            [prefixes, jobs], axis=1)
        hp = (jnp.zeros((nj,), bool) if has_prefix is None
              else has_prefix.astype(bool))
        ldm_channel = _ldm_channel(full, hp, pre, job)
    if ldm_channel is not None:
        off_l, L_l = ldm_channel
        off_l = off_l.reshape(R, block)
        L_l = L_l.reshape(R, block)
        use = L_l > L
        off = jnp.where(use, off_l, off)
        L = jnp.where(use, L_l, L)

    ll_v, ml_v, of_raw, lits, n_seqs, lit_cnt = zparse.parse_blocks(
        blocks, off, L, interpret=interpret)

    of_v2 = zseqenc.rep_scan(of_raw, ll_v, n_seqs, interpret=interpret)

    (pk_ll, pk_of, pk_ml, tables, extras, norm, rle3,
     rle_sym3) = _codes_stage(ll_v, ml_v, of_v2, n_seqs)

    st_val, st_nb, st_fin = zseqenc.fse_chain(
        pk_ll, pk_of, pk_ml, n_seqs, tables, interpret=interpret)

    nbits_t, max_bits, huff_ok, bq, lit_halves, lit_nh = _lit_stage_jit(
        lits, lit_cnt, bs=block, interpret=interpret)

    seq_halves, seq_nh, seq_total_bits = _pack_stage(
        st_val, st_nb, st_fin, extras, rle3, n_seqs)

    log7 = jnp.where(rle3, 0, FSE_LOG)
    return dict(
        n_seqs=n_seqs.reshape(nj, nblk),
        lit_cnt=lit_cnt.reshape(nj, nblk),
        ll=ll_v.reshape(nj, nblk, MAXSEQ),
        ml=ml_v.reshape(nj, nblk, MAXSEQ),
        ofv=of_v2.reshape(nj, nblk, MAXSEQ),
        nbits=nbits_t.reshape(nj, nblk, 256),
        max_bits=max_bits.reshape(nj, nblk),
        huff_ok=huff_ok.reshape(nj, nblk),
        stream_bits=bq.reshape(nj, nblk, 4),
        lit_halves=lit_halves.reshape(nj, nblk, -1),
        lit_nh=lit_nh.reshape(nj, nblk),
        seq_halves=seq_halves.reshape(nj, nblk, -1),
        seq_nh=seq_nh.reshape(nj, nblk),
        seq_total_bits=seq_total_bits.reshape(nj, nblk),
        fse_norm=jnp.broadcast_to(norm[None], (nj, 3, 64)),
        fse_log=jnp.broadcast_to(log7[None], (nj, 3)),
        fse_rle=jnp.broadcast_to(rle3[None], (nj, 3)),
        fse_rle_sym=jnp.broadcast_to(rle_sym3[None], (nj, 3)),
    )
