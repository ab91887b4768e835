"""Batched device huff0 decode — the huff0/decompress_amd64.s analogue.

The sequential Huffman bit-chain becomes embarrassingly parallel with
encoder-emitted checkpoints (ops/entropy.py `ckpt`): every HUFF_CKPT_K
symbols, the encoder records the stream's remaining-bit offset. Decode
then runs ONE lax.scan of K steps where each step advances every chunk of
every stream of every block at once — table lookups ride the MXU as
two-level one-hot contractions, bit extraction is pure elementwise
shifts on pre-gathered 52-byte windows.

The host prepares windows/tables (byte-granular container parsing is
host work by design — SURVEY hard-part 6); see
huff0.decompress_4x_batch for the container-level API and the
host-fallback contract. Validated bit-exactly against the host decoder
in tests/test_entropy_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.ops.entropy import HUFF_CKPT_K

WIN = 52          # window bytes per chunk (>= ceil(K*11/8) + peek slack)
NHW = WIN // 2    # 16-bit halfwords per window


@functools.partial(jax.jit, static_argnames=("k",))
def huff0_decode_chunks(windows, lbit, nsym, tables, k: int = HUFF_CKPT_K):
    """Decode up to k symbols per chunk.

    windows: (N, C, WIN) uint8 — little-endian window bytes; bit b of the
        chunk's stream is window bit (b - 8*wlo) as prepared by the host.
    lbit:    (N, C) int32 — window-local remaining-bit offset at chunk
        start (the BitReaderReverse `bitpos`, window-local).
    nsym:    (N, C) int32 — symbols in this chunk (<= k; 0 pads).
    tables:  (N, 64, 32) float32 — 2048-entry expanded dtable packed as
        sym*16 + nbits, laid out [hi6][lo5].
    Returns (syms (N, C, k) int32, end_lbit (N, C) int32)."""
    N, C, _ = windows.shape
    # channel-LAST layout: C rides the 128-lane axis everywhere; the small
    # dims (NHW=26, 64, 32) sit on sublanes. With C last-dim instead, every
    # op wastes ~80% of each vector register (measured ~6 ms/step).
    w32 = windows.astype(jnp.int32)
    hw = w32[:, :, 0::2] | (w32[:, :, 1::2] << 8)      # (N, C, NHW)
    hwf = jnp.moveaxis(hw.astype(jnp.float32), 1, 2)   # (N, NHW, C)
    hwi = jax.lax.broadcasted_iota(jnp.int32, (1, NHW, 1), 1)
    # two exact bf16 planes (sym <= 255, nb <= 11) ride the MXU fast path
    t_sym = jnp.floor_divide(tables.astype(jnp.int32), 16
                             ).astype(jnp.bfloat16)
    t_nb = jnp.remainder(tables.astype(jnp.int32), 16).astype(jnp.bfloat16)
    t2 = jnp.concatenate([t_sym, t_nb], axis=-1)       # (N, 64, 64)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64, 1), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)

    def pow2f(e):
        # exact 2^e for int e >= -126: build the f32 exponent field
        return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)

    def fmod(x, m: float):
        return x - jnp.floor(x * (1.0 / m)) * m

    def step(carry, i):
        # per-element-variable arithmetic in exact f32 with bitcast-built
        # powers of two (TPU variable int shifts lower poorly)
        lbp, = carry                                   # (N, C)
        bp = lbp - 11
        bpc = jnp.maximum(bp, 0)
        hsel = bpc >> 4
        h0 = jnp.sum(jnp.where(hwi == hsel[:, None, :], hwf, 0.0), axis=1)
        h1 = jnp.sum(jnp.where(
            hwi == jnp.minimum(hsel + 1, NHW - 1)[:, None, :], hwf, 0.0),
            axis=1)
        s = bpc & 15
        part0 = jnp.floor(h0 * pow2f(-s))              # bits [s,16) of h0
        # h1 mod 2^(s-5), only meaningful when s > 5
        h1cut = h1 - jnp.floor(h1 * pow2f(5 - s)) * pow2f(s - 5)
        val = jnp.where(s > 5, part0 + h1cut * pow2f(16 - s),
                        fmod(part0, 2048.0))
        val = fmod(val * pow2f(bpc - bp), 2048.0)      # zero-pad shift
        vi = val.astype(jnp.int32)
        hi = vi >> 5                                   # (N, C)
        lo = vi & 31
        ohh = (hi_iota == hi[:, None, :]).astype(jnp.bfloat16)  # (N,64,C)
        rows = jnp.einsum("nhc,nhl->nlc", ohh, t2,
                          preferred_element_type=jnp.float32)  # (N,64,C)
        pick = lo_iota == lo[:, None, :]
        sym = jnp.sum(jnp.where(pick, rows[:, :32], 0.0),
                      axis=1).astype(jnp.int32)
        nb = jnp.sum(jnp.where(pick, rows[:, 32:], 0.0),
                     axis=1).astype(jnp.int32)
        active = i < nsym
        lbp = jnp.where(active, lbp - nb, lbp)
        return (lbp,), jnp.where(active, sym, 0)

    (lbit_end,), syms = jax.lax.scan(
        step, (lbit,), jnp.arange(k, dtype=jnp.int32))
    return jnp.moveaxis(syms, 0, -1), lbit_end


@functools.partial(jax.jit, static_argnames=("k",))
def fse_decode_chunks(windows, lbit, st1, st2, npair, nore1, nore2,
                      tables, k: int = HUFF_CKPT_K):
    """Chunked 2-state interleaved FSE decode (fse/compress.go role).

    windows/lbit as in huff0_decode_chunks; st1/st2 (N, C) int32 entry
    states; npair (N, C) pairs to emit (<= k//2); nore1/nore2 (N, C)
    pair index AFTER which state 1/2 stops reloading (the encoder's
    final emissions carry no transition); tables (N, 16, 96) float32 —
    512-state dtable as [hi4][lo5] with three 32-wide planes per row:
    spread symbol, new_state & 255, (new_state>>8)*16 + nb."""
    N, C, _ = windows.shape
    w32 = windows.astype(jnp.int32)
    hw = w32[:, :, 0::2] | (w32[:, :, 1::2] << 8)
    hwf = jnp.moveaxis(hw.astype(jnp.float32), 1, 2)   # (N, NHW, C)
    hwi = jax.lax.broadcasted_iota(jnp.int32, (1, NHW, 1), 1)
    tb = tables.astype(jnp.bfloat16)                    # exact: <= 255
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)

    def pow2f(e):
        return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)

    def fmod(x, m: float):
        return x - jnp.floor(x * (1.0 / m)) * m

    def lookup(s):
        hi = s >> 5
        lo = s & 31
        ohh = (hi_iota == hi[:, None, :]).astype(jnp.bfloat16)  # (N,16,C)
        rows = jnp.einsum("nhc,nhl->nlc", ohh, tb,
                          preferred_element_type=jnp.float32)   # (N,96,C)
        pick = lo_iota == lo[:, None, :]
        sym = jnp.sum(jnp.where(pick, rows[:, :32], 0.0), axis=1)
        nlo = jnp.sum(jnp.where(pick, rows[:, 32:64], 0.0), axis=1)
        p3 = jnp.sum(jnp.where(pick, rows[:, 64:], 0.0), axis=1)
        nb = fmod(p3, 16.0)
        ns = nlo + jnp.floor(p3 * (1.0 / 16.0)) * 256.0
        return sym.astype(jnp.int32), nb.astype(jnp.int32), ns

    def read9(lbp):
        """9-bit window [lbp-9, lbp), zero-padded below bit 0."""
        bp = lbp - 9
        bpc = jnp.maximum(bp, 0)
        hsel = bpc >> 4
        h0 = jnp.sum(jnp.where(hwi == hsel[:, None, :], hwf, 0.0), axis=1)
        h1 = jnp.sum(jnp.where(
            hwi == jnp.minimum(hsel + 1, NHW - 1)[:, None, :], hwf, 0.0),
            axis=1)
        s = bpc & 15
        part0 = jnp.floor(h0 * pow2f(-s))
        h1cut = h1 - jnp.floor(h1 * pow2f(5 - s)) * pow2f(s - 5)
        # 9-bit value: bits [s, s+9) of the two halfwords
        v = jnp.where(s > 7, part0 + h1cut * pow2f(16 - s),
                      fmod(part0, 512.0))
        v = fmod(v * pow2f(bpc - bp), 512.0)
        return v

    def step(carry, j):
        lbp, s1, s2 = carry
        sym1, nb1, ns1 = lookup(s1)
        sym2, nb2, ns2 = lookup(s2)
        act = j < npair
        re1 = act & (j < nore1)
        w1 = read9(lbp)
        v1 = jnp.floor(w1 * pow2f(nb1 - 9))   # top nb1 bits of the window
        s1n = (ns1 + v1).astype(jnp.int32)
        s1 = jnp.where(re1, s1n, s1)
        lbp = jnp.where(re1, lbp - nb1, lbp)
        re2 = act & (j < nore2)
        w2 = read9(lbp)
        v2 = jnp.floor(w2 * pow2f(nb2 - 9))
        s2n = (ns2 + v2).astype(jnp.int32)
        s2 = jnp.where(re2, s2n, s2)
        lbp = jnp.where(re2, lbp - nb2, lbp)
        pair = jnp.stack([jnp.where(act, sym1, 0),
                          jnp.where(act, sym2, 0)], axis=-1)
        return (lbp, s1, s2), pair

    (lbit_end, _, _), pairs = jax.lax.scan(
        step, (lbit, st1, st2), jnp.arange(k // 2, dtype=jnp.int32))
    # pairs: (k//2, N, C, 2) -> (N, C, k)
    syms = jnp.moveaxis(pairs, 0, 2).reshape(N, C, k)
    return syms, lbit_end


ZWIN = 96          # sequence-chunk window bytes (8 seqs x <=81 bits + slack)
ZNHW = ZWIN // 2
ZSEQ_K = 8         # sequences per checkpoint chunk


@functools.partial(jax.jit, static_argnames=("k",))
def zseq_decode_chunks_rep(windows, lbit, sll, sof, sml, nseq, nore,
                           r1, r2, r3, tll, tof, tml, k: int = ZSEQ_K):
    """zseq_decode_chunks + ON-DEVICE repeat-offset resolution (r3).

    r1/r2/r3 (N, C) int32: rep state at chunk entry (from encoder-emitted
    checkpoints or a host walk). Returns ((ll, ml, ofv, off), end_lbit)
    where off is the RESOLVED absolute offset — the last per-sequence
    host loop (device_dec._resolve_reps) moves into the scan carry.
    Rep algebra (RFC 8878 §3.1.1.5): value>3 -> off=value-3, push;
    value 1-3 index the rep stack, shifted by one when ll==0."""
    (ll, ml, ofv, off), endl = _zseq_core(
        windows, lbit, sll, sof, sml, nseq, nore, tll, tof, tml, k,
        (r1, r2, r3))
    return (ll, ml, ofv, off), endl


@functools.partial(jax.jit, static_argnames=("k",))
def zseq_decode_chunks(windows, lbit, sll, sof, sml, nseq, nore,
                       tll, tof, tml, k: int = ZSEQ_K):
    """Chunked zstd sequence decode — 3 interleaved FSE states
    (zstd/seqdec_amd64.s entropy role; offsets stay in of_value form,
    repeat resolution happens at execution like the host decoder).

    windows (N, C, ZWIN) uint8; lbit/sll/sof/sml (N, C) int32 entry
    points; nseq (N, C) sequences in the chunk; nore (N, C) local index
    after which states stop reloading (last sequence of the block).
    t* tables (N, 16, 192) float32: 512-state planes [code, ns&255,
    (ns>>8)*16+nb_state, extra_bits, base&255, base>>8] (base>>8 <= 256,
    bf16-exact). Offset codes must be <= 23 (caller gates; keeps the
    f32 window extraction exact).
    Returns (ll, ml, ofv) each (N, C, k) int32, plus end lbit."""
    (ll, ml, ofv, _off), endl = _zseq_core(
        windows, lbit, sll, sof, sml, nseq, nore, tll, tof, tml, k, None)
    return (ll, ml, ofv), endl


def _zseq_core(windows, lbit, sll, sof, sml, nseq, nore,
               tll, tof, tml, k, reps):
    N, C, _ = windows.shape
    w32 = windows.astype(jnp.int32)
    hw = w32[:, :, 0::2] | (w32[:, :, 1::2] << 8)
    hwf = jnp.moveaxis(hw.astype(jnp.float32), 1, 2)   # (N, ZNHW, C)
    hwi = jax.lax.broadcasted_iota(jnp.int32, (1, ZNHW, 1), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    tls = [t.astype(jnp.bfloat16) for t in (tll, tof, tml)]

    def pow2f(e):
        return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)

    def fmod_pow(x, e):
        """x mod 2^e for array exponent e >= 0 (exact f32)."""
        return x - jnp.floor(x * pow2f(-e)) * pow2f(e)

    def lookup(tb, s):
        hi = s >> 5
        lo = s & 31
        ohh = (hi_iota == hi[:, None, :]).astype(jnp.bfloat16)
        rows = jnp.einsum("nhc,nhl->nlc", ohh, tb,
                          preferred_element_type=jnp.float32)  # (N,192,C)
        pick = lo_iota == lo[:, None, :]

        def pl(j):
            return jnp.sum(jnp.where(pick, rows[:, 32 * j : 32 * (j + 1)],
                                     0.0), axis=1)

        code = pl(0)
        ns = pl(1) + jnp.floor(pl(2) * (1.0 / 16.0)) * 256.0
        nbs = pl(2) - jnp.floor(pl(2) * (1.0 / 16.0)) * 16.0
        xbits = pl(3)
        base = pl(4) + pl(5) * 256.0
        return code, ns, nbs, xbits, base

    def hsel3(bpc):
        h = bpc >> 4
        h0 = jnp.sum(jnp.where(hwi == h[:, None, :], hwf, 0.0), axis=1)
        h1 = jnp.sum(jnp.where(
            hwi == jnp.minimum(h + 1, ZNHW - 1)[:, None, :], hwf, 0.0),
            axis=1)
        h2 = jnp.sum(jnp.where(
            hwi == jnp.minimum(h + 2, ZNHW - 1)[:, None, :], hwf, 0.0),
            axis=1)
        return h0, h1, h2

    def read_n(lbp, nbf):
        """bits [lbp-nb, lbp) as f32 value (nb <= 24, f32-exact)."""
        bp = lbp - 24
        bpc = jnp.maximum(bp, 0)
        h0, h1, h2 = hsel3(bpc)
        s = bpc & 15
        part0 = jnp.floor(h0 * pow2f(-s))
        h1cut = jnp.where(s < 8, fmod_pow(h1, s + 8), h1)
        v = part0 + h1cut * pow2f(16 - s)
        h2cut = fmod_pow(h2, jnp.maximum(s - 8, 0))
        v = v + jnp.where(s > 8, h2cut * pow2f(32 - s), 0.0)
        # zero-pad shift: mask BEFORE shifting so the product stays < 2^24
        # (v itself can hold 24 bits; v*2^d would exceed f32 exactness)
        d = bpc - bp
        v = fmod_pow(v, 24 - d) * pow2f(d)
        nb = nbf.astype(jnp.int32)
        return jnp.floor(v * pow2f(nb - 24)), nb

    if reps is not None:
        c1_0, c2_0, c3_0 = (r.astype(jnp.int32) for r in reps)
    else:
        c1_0 = jnp.full((N, C), 1, jnp.int32)
        c2_0 = jnp.full((N, C), 4, jnp.int32)
        c3_0 = jnp.full((N, C), 8, jnp.int32)

    def step(carry, j):
        lbp, s1, s2, s3, c1, c2, c3 = carry    # ll, of, ml states + reps
        llc, ns1, nb1, llb, llbase = lookup(tls[0], s1)
        ofc, ns2, nb2, ofb, _ = lookup(tls[1], s2)
        mlc, ns3, nb3, mlb, mlbase = lookup(tls[2], s3)
        act = j < nseq
        # extras: of, then ml, then ll (host order)
        vof, nof = read_n(lbp, ofb)
        lbp = jnp.where(act, lbp - nof, lbp)
        vml, nml = read_n(lbp, mlb)
        lbp = jnp.where(act, lbp - nml, lbp)
        vll, nll = read_n(lbp, llb)
        lbp = jnp.where(act, lbp - nll, lbp)
        ofci = ofc.astype(jnp.int32)
        of_val = (pow2f(ofci).astype(jnp.int32)
                  + vof.astype(jnp.int32))          # of_c==0 -> 1 + 0
        ml = (mlbase + vml).astype(jnp.int32)
        ll = (llbase + vll).astype(jnp.int32)
        # repeat-offset resolution in-carry (RFC 8878 §3.1.1.5)
        is_plain = of_val > 3
        code = of_val - 1 + (ll == 0).astype(jnp.int32)
        off_rep = jnp.where(code == 0, c1,
                            jnp.where(code == 1, c2,
                                      jnp.where(code == 2, c3,
                                                jnp.maximum(c1 - 1, 1))))
        off = jnp.where(is_plain, of_val - 3, off_rep)
        n2r = jnp.where(~is_plain & (code == 0), c2, c1)
        n3r = jnp.where(~is_plain & (code <= 1), c3, c2)
        c1 = jnp.where(act, off, c1)
        c2 = jnp.where(act, n2r, c2)
        c3 = jnp.where(act, n3r, c3)
        # state reloads: ll, ml, of (host order), all but the last seq
        rel = act & (j < nore)
        v1, n1 = read_n(lbp, jnp.where(rel, nb1, 0.0))
        s1 = jnp.where(rel, (ns1 + v1).astype(jnp.int32), s1)
        lbp = jnp.where(rel, lbp - n1, lbp)
        v3, n3 = read_n(lbp, jnp.where(rel, nb3, 0.0))
        s3 = jnp.where(rel, (ns3 + v3).astype(jnp.int32), s3)
        lbp = jnp.where(rel, lbp - n3, lbp)
        v2, n2 = read_n(lbp, jnp.where(rel, nb2, 0.0))
        s2 = jnp.where(rel, (ns2 + v2).astype(jnp.int32), s2)
        lbp = jnp.where(rel, lbp - n2, lbp)
        out = jnp.stack([jnp.where(act, ll, 0), jnp.where(act, ml, 0),
                         jnp.where(act, of_val, 0),
                         jnp.where(act, off, 0)], axis=-1)
        return (lbp, s1, s2, s3, c1, c2, c3), out

    (lbit_end, _, _, _, _, _, _), seqs = jax.lax.scan(
        step, (lbit, sll, sof, sml, c1_0, c2_0, c3_0),
        jnp.arange(k, dtype=jnp.int32))
    seqs = jnp.moveaxis(seqs, 0, 2)          # (N, C, k, 4)
    return (seqs[..., 0], seqs[..., 1], seqs[..., 2], seqs[..., 3]), lbit_end


def expand_zseq_table(spread, nb, new_state, xbits, base):
    """Host: 512-state seq dtable -> packed (16, 192) f32 planes."""
    t = np.zeros((16, 192), np.float32)
    t[:, :32] = spread.reshape(16, 32)
    t[:, 32:64] = (new_state & 255).reshape(16, 32)
    t[:, 64:96] = ((new_state >> 8) * 16 + nb).reshape(16, 32)
    t[:, 96:128] = xbits.reshape(16, 32)
    t[:, 128:160] = (base & 255).reshape(16, 32)
    t[:, 160:192] = (base >> 8).reshape(16, 32)
    return t


def expand_fse_table(spread, nb, new_state):
    """Host: 512-state dtable -> packed (16, 96) f32 planes."""
    t = np.zeros((16, 96), np.float32)
    t[:, :32] = spread.reshape(16, 32)
    t[:, 32:64] = (new_state & 255).reshape(16, 32)
    t[:, 64:] = ((new_state >> 8) * 16 + nb).reshape(16, 32)
    return t


def expand_table(sym_t, nb_t, max_bits: int):
    """Host: expand a 2^max_bits dtable to the packed (64, 32) f32 form."""
    shift = 11 - max_bits
    idx = np.arange(2048) >> shift
    packed = (sym_t[idx].astype(np.int64) * 16
              + nb_t[idx].astype(np.int64)).astype(np.float32)
    return packed.reshape(64, 32)


def build_windows(stream: bytes, ckpt: np.ndarray, nchunks: int,
                  win: int = WIN):
    """Host: per-chunk byte windows + window-local bit offsets.

    ckpt[c] = remaining-bit offset at the start of chunk c (descending).
    Returns (windows (nchunks, win) uint8, lbit (nchunks,) int32)."""
    ck = ckpt[:nchunks].astype(np.int64)
    wtop = (np.maximum(ck, 1) - 1) >> 3           # byte holding top bit
    wlo = wtop - (win - 1)
    buf = np.frombuffer(stream, np.uint8)
    pad = np.zeros(win, np.uint8)
    padded = np.concatenate([pad, buf])
    idx = wlo[:, None] + np.arange(win)[None, :] + win
    windows = padded[np.clip(idx, 0, len(padded) - 1)]
    windows[idx >= len(padded)] = 0
    lbit = (ck - 8 * wlo).astype(np.int32)
    return windows, lbit
