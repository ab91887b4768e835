"""Pallas zstd sequence decoder — the `seqdec_amd64.s` decode-half
analogue for shared-table (predefined-mode) sequence sections.

Chunks of up to 8 sequences (the C sidecar builder's ACC_ZSEQ_K
checkpoints: entry bit offset + 3 FSE states + 3 repeat offsets) advance
in lock-step across (R,128)-chunk panels, so one vector op serves 32k
chunks.  Per sequence step:

  - a 64-bit window below the chunk's bit cursor is funneled out of the
    80-byte checkpoint window (one NH-way halfword select),
  - the three state-table entries come from one broadcast lane-gather
    each (predefined logs are <= 6, so each dtable fits one 128-lane
    row); extra-bits/baseline tables are two more lane-gathers,
  - offset/match/literal values, branchless repeat-offset resolution and
    the three state updates replicate zstd_dec.cpp's walk exactly
    (decode order of_x, ml_x, ll_x; state reads ll, ml, of; the block's
    final sequence reads no state bits).

The encoder side pins every block to the predefined tables
(zstd.encoder.predef_seq_tables — format-legal mode 0, decodable by any
zstd decoder); the kernel accepts any table set with log <= 7 packed the
same way, so per-batch custom shared tables can ride later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8        # sequences per chunk (ACC_ZSEQ_K)
WIN = 80     # window bytes per chunk (8 seqs x <= 72 bits + slack)
NH = WIN // 2
R = 128      # chunk rows per grid step (VMEM: in+out blocks double-buffer)


def pack_tables():
    """Predefined dtables + extras packed for the kernel:
    tst (3,128): per state sym|nb<<6|base<<10 (rows: ll, of, ml);
    xb (2,128): per code xbits|baseline<<5 (rows: ll, ml)."""
    from compress_tpu.zstd import seqs as S
    from compress_tpu.fse import core as F

    tst = np.zeros((3, 128), np.int32)
    for row, (norm, log) in enumerate((
            (S.PREDEF_LL_NORM, S.PREDEF_LL_LOG),
            (S.PREDEF_OF_NORM, S.PREDEF_OF_LOG),
            (S.PREDEF_ML_NORM, S.PREDEF_ML_LOG))):
        sym, nb, base = F.build_dtable(np.asarray(norm, np.int64), log)
        n = 1 << log
        tst[row, :n] = (sym.astype(np.int64)
                        | (nb.astype(np.int64) << 6)
                        | (base.astype(np.int64) << 10))
    xb = np.zeros((2, 128), np.int32)
    ll_b = np.asarray(S.LL_BITS, np.int64)
    ll_v = np.asarray(S.LL_BASELINE, np.int64)
    ml_b = np.asarray(S.ML_BITS, np.int64)
    ml_v = np.asarray(S.ML_BASELINE, np.int64)
    xb[0, :len(ll_b)] = ll_b | (ll_v << 5)
    xb[1, :len(ml_b)] = ml_b | (ml_v << 5)
    return tst, xb


def _kern(hw_ref, lbit_ref, nsym_ref, st_ref, rep_ref, last_ref, tst_ref,
          xb_ref, llo_ref, mlo_ref, offo_ref, endl_ref):
    shp = lbit_ref[0].shape

    def bcast_row(tab, row):
        return jnp.broadcast_to(tab[row:row + 1, :], shp)

    def lane_lut(tab_row, idx):
        return jnp.take_along_axis(tab_row, jnp.clip(idx, 0, 127), axis=1)

    def win64(lbp):
        """bits [lbp-64, lbp) of the window as (hi, lo) i32 pair."""
        base = jnp.maximum(lbp - 64, 0)
        hsel = base >> 4
        s = base & 15
        taps = [jnp.zeros(shp, jnp.int32) for _ in range(5)]
        for j in range(NH):
            w = hw_ref[j]
            for t in range(5):
                sel = hsel == (j - t)
                taps[t] = jnp.where(sel, w, taps[t])
        h0, h1, h2, h3, h4 = taps
        sh = s
        lo = (jax.lax.shift_right_logical(h0, sh) | (h1 << (16 - sh))
              | jnp.where(sh > 0, h2 << jnp.minimum(32 - sh, 31), 0))
        hi = (jax.lax.shift_right_logical(h2, sh) | (h3 << (16 - sh))
              | jnp.where(sh > 0, h4 << jnp.minimum(32 - sh, 31), 0))
        # zero-pad shift when lbp < 64: logical left shift of (hi, lo)
        pad = base - (lbp - 64)           # in [0, 64)
        p32 = pad >= 32
        ps = pad & 31
        lo1 = jnp.where(p32, 0, lo << ps)
        hi1 = jnp.where(
            p32, lo << ps,
            (hi << ps) | jnp.where(
                ps > 0, jax.lax.shift_right_logical(lo, 32 - ps), 0))
        return hi1, lo1

    def take(hi, lo, c, n):
        """bits [64-c-n, 64-c) of the (hi, lo) window (MSB-down reads)."""
        t = 64 - c - n
        mask = (1 << n) - 1 if isinstance(n, int) else ((1 << n) - 1)
        ge32 = t >= 32
        tl = t & 31
        cross = (jax.lax.shift_right_logical(lo, tl)
                 | jnp.where(tl > 0, hi << (32 - tl), 0))
        v = jnp.where(ge32, jax.lax.shift_right_logical(hi, tl), cross)
        return v & mask

    lbp = lbit_ref[0]
    nsym = nsym_ref[0]
    last_blk = last_ref[0] > 0
    s_ll = st_ref[0]
    s_of = st_ref[1]
    s_ml = st_ref[2]
    r0 = rep_ref[0]
    r1 = rep_ref[1]
    r2 = rep_ref[2]
    t_ll = bcast_row(tst_ref, 0)
    t_of = bcast_row(tst_ref, 1)
    t_ml = bcast_row(tst_ref, 2)
    x_ll = bcast_row(xb_ref, 0)
    x_ml = bcast_row(xb_ref, 1)

    def step(i, carry):
        lbp, s_ll, s_of, s_ml, r0, r1, r2 = carry
        e_of = lane_lut(t_of, s_of)
        e_ml = lane_lut(t_ml, s_ml)
        e_ll = lane_lut(t_ll, s_ll)
        of_c = e_of & 63
        ml_c = e_ml & 63
        ll_c = e_ll & 63
        xml = lane_lut(x_ml, ml_c)
        xll = lane_lut(x_ll, ll_c)
        mlb = xml & 31
        llb = xll & 31
        hi, lo = win64(lbp)
        c0 = jnp.zeros(shp, jnp.int32)
        of_x = take(hi, lo, c0, of_c)
        c1 = of_c
        ml_x = take(hi, lo, c1, mlb)
        c2 = c1 + mlb
        ll_x = take(hi, lo, c2, llb)
        c3 = c2 + llb
        of_val = jnp.where(of_c > 0, (1 << jnp.minimum(of_c, 30)) + of_x, 1)
        ml = jax.lax.shift_right_logical(xml, 5) + ml_x
        ll = jax.lax.shift_right_logical(xll, 5) + ll_x
        # branchless repeat resolution (zstd_dec.cpp order)
        is_long = of_val > 3
        code = jnp.where(is_long, 4, of_val - 1 + (ll == 0))
        off = jnp.where(is_long, of_val - 3,
                        jnp.where(code == 0, r0,
                                  jnp.where(code == 1, r1,
                                            jnp.where(code == 2, r2,
                                                      r0 - 1))))
        n_r2 = jnp.where(is_long | (code >= 2), r1, r2)
        n_r1 = jnp.where(is_long | (code >= 1), r0, r1)
        n_r0 = jnp.where(is_long | (code >= 1), off, r0)
        # state updates (skipped for the block-final sequence)
        active = i < nsym
        is_final = last_blk & (i == nsym - 1)
        upd = active & ~is_final
        nb_ll = jnp.where(upd, (e_ll >> 6) & 15, 0)
        nb_ml = jnp.where(upd, (e_ml >> 6) & 15, 0)
        nb_of = jnp.where(upd, (e_of >> 6) & 15, 0)
        # the extras can consume up to 55 bits and the state reads 17
        # more — past the first 64-bit window, so re-anchor a second one
        hi2, lo2 = win64(lbp - c3)
        sll2 = (e_ll >> 10) + take(hi2, lo2, c0, nb_ll)
        sml2 = (e_ml >> 10) + take(hi2, lo2, nb_ll, nb_ml)
        sof2 = (e_of >> 10) + take(hi2, lo2, nb_ll + nb_ml, nb_of)
        used = c3 + nb_ll + nb_ml + nb_of
        llo_ref[pl.ds(i, 1)] = jnp.where(active, ll, 0)[None]
        mlo_ref[pl.ds(i, 1)] = jnp.where(active, ml, 0)[None]
        offo_ref[pl.ds(i, 1)] = jnp.where(active, off, 0)[None]
        return (jnp.where(active, lbp - used, lbp),
                jnp.where(upd, sll2, s_ll),
                jnp.where(upd, sof2, s_of),
                jnp.where(upd, sml2, s_ml),
                jnp.where(active, n_r0, r0),
                jnp.where(active, n_r1, r1),
                jnp.where(active, n_r2, r2))

    carry = (lbp, s_ll, s_of, s_ml, r0, r1, r2)
    carry = jax.lax.fori_loop(0, K, step, carry)
    endl_ref[0] = carry[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def zseq_decode_chunks_shared(windows, lbit, nsym, states, reps, last,
                              tst, xb, interpret: bool = False):
    """windows (NC, WIN) u8; lbit/nsym/last (NC,) i32; states/reps
    (NC, 3) i32; tst (3,128), xb (2,128) i32 (pack_tables). Returns
    (ll, ml, off) each (NC, K) i32 + end lbit (NC,)."""
    nc = windows.shape[0]
    ncp = -(-nc // (R * 128)) * (R * 128)
    nr = ncp // 128
    w = jnp.pad(windows, ((0, ncp - nc), (0, 0)))
    hw = (w[:, 0::2].astype(jnp.int32)
          | (w[:, 1::2].astype(jnp.int32) << 8))
    hw = hw.reshape(nr, 128, NH).transpose(2, 0, 1)
    def p1(x):
        return jnp.pad(x, (0, ncp - nc)).reshape(1, nr, 128)
    def p3(x):
        return jnp.pad(x, ((0, ncp - nc), (0, 0))).T.reshape(3, nr, 128)
    grid = nr // R
    spec1 = pl.BlockSpec((1, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((3, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM)
    speck = pl.BlockSpec((K, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM)
    ll, ml, off, endl = pl.pallas_call(
        _kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((NH, R, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            spec1, spec1, spec3, spec3, spec1,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(speck, speck, speck, spec1),
        out_shape=(
            jax.ShapeDtypeStruct((K, nr, 128), jnp.int32),
            jax.ShapeDtypeStruct((K, nr, 128), jnp.int32),
            jax.ShapeDtypeStruct((K, nr, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, nr, 128), jnp.int32),
        ),
        interpret=interpret,
    )(hw, p1(lbit), p1(nsym), p3(states), p3(reps), p1(last),
      jnp.asarray(tst), jnp.asarray(xb))
    def unp(x):
        return x.transpose(1, 2, 0).reshape(ncp, K)[:nc]
    return unp(ll), unp(ml), unp(off), endl.reshape(ncp)[:nc]


# ---------------------------------------------------------------------------
# Host prep: single-block predefined-mode frames -> kernel batch tensors
# ---------------------------------------------------------------------------


def _skip_literals(body: bytes) -> int:
    """Return the offset of the sequences section (RFC 8878 literal
    section header parse; no decoding)."""
    b0 = body[0]
    lit_type = b0 & 3
    sf = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if sf in (0, 2):
            regen, hdr = b0 >> 3, 1
        elif sf == 1:
            regen, hdr = (b0 >> 4) | (body[1] << 4), 2
        else:
            regen = (b0 >> 4) | (body[1] << 4) | (body[2] << 12)
            hdr = 3
        return hdr + (regen if lit_type == 0 else 1)
    if sf in (0, 1):
        regen = (b0 >> 4) | ((body[1] & 0x3F) << 4)
        comp = (body[1] >> 6) | (body[2] << 2)
        hdr = 3
    elif sf == 2:
        regen = (b0 >> 4) | (body[1] << 4) | ((body[2] & 3) << 12)
        comp = (body[2] >> 2) | (body[3] << 6)
        hdr = 4
    else:
        regen = (b0 >> 4) | (body[1] << 4) | ((body[2] & 0x3F) << 12)
        comp = (body[2] >> 6) | (body[3] << 2) | (body[4] << 10)
        hdr = 5
    return hdr + comp


def seq_section(body: bytes):
    """(bitstream bytes, nseq) of a predefined-mode sequences section."""
    pos = _skip_literals(body)
    b0 = body[pos]
    pos += 1
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + body[pos]
        pos += 1
    else:
        nseq = int.from_bytes(body[pos:pos + 2], "little") + 0x7F00
        pos += 2
    if nseq == 0:
        return b"", 0
    modes = body[pos]
    pos += 1
    if modes != 0:
        raise ValueError("not a predefined-mode sequence section")
    return body[pos:], nseq


def prep_frames(frames):
    """Host prep for a batch of single-block predefined-mode frames
    (compressed under zstd.encoder.predef_seq_tables, sidecars built
    with seq_cks=True). Returns (windows, lbit, nsym, states, reps,
    last, metas) numpy arrays ready for zseq_decode_chunks_shared."""
    from compress_tpu.zstd import accel as AC
    from compress_tpu.zstd import frame as F
    from compress_tpu.ops import entropy_dec as ED

    wins, lbits, nsyms, sts, rps, lasts = [], [], [], [], [], []
    metas = []
    for blob in frames:
        side, rest = AC.split_sidecar(bytes(blob))
        if side is None:
            raise ValueError("frame carries no sidecar")
        _, abl = AC.parse_sidecar(side)
        a = abl[0]
        h = F.parse_frame_header(rest)
        body = rest[h.header_size + 3:]  # skip 3-byte block header
        stream, nseq = seq_section(body)
        nch = len(a.seq_bits)
        assert nch == -(-nseq // K), (nch, nseq)
        w, lb = ED.build_windows(stream, a.seq_bits.astype(np.int64), nch,
                                 win=WIN)
        ns = np.minimum(nseq - K * np.arange(nch), K).astype(np.int32)
        wins.append(w)
        lbits.append(lb)
        nsyms.append(ns)
        sts.append(a.seq_states.astype(np.int32))
        rps.append(a.seq_reps.astype(np.int32))
        lf = np.zeros(nch, np.int32)
        lf[-1] = 1
        lasts.append(lf)
        metas.append((nseq, nch))
    return (np.concatenate(wins), np.concatenate(lbits).astype(np.int32),
            np.concatenate(nsyms), np.concatenate(sts),
            np.concatenate(rps), np.concatenate(lasts), metas)
