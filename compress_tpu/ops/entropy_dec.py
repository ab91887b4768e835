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


def expand_table(sym_t, nb_t, max_bits: int):
    """Host: expand a 2^max_bits dtable to the packed (64, 32) f32 form."""
    shift = 11 - max_bits
    idx = np.arange(2048) >> shift
    packed = (sym_t[idx].astype(np.int64) * 16
              + nb_t[idx].astype(np.int64)).astype(np.float32)
    return packed.reshape(64, 32)


def build_windows(stream: bytes, ckpt: np.ndarray, nchunks: int):
    """Host: per-chunk 52-byte windows + window-local bit offsets.

    ckpt[c] = remaining-bit offset at the start of chunk c (descending).
    Returns (windows (nchunks, WIN) uint8, lbit (nchunks,) int32)."""
    ck = ckpt[:nchunks].astype(np.int64)
    wtop = (np.maximum(ck, 1) - 1) >> 3           # byte holding top bit
    wlo = wtop - (WIN - 1)
    buf = np.frombuffer(stream, np.uint8)
    pad = np.zeros(WIN, np.uint8)
    padded = np.concatenate([pad, buf])
    idx = wlo[:, None] + np.arange(WIN)[None, :] + WIN
    windows = padded[np.clip(idx, 0, len(padded) - 1)]
    windows[idx >= len(padded)] = 0
    lbit = (ck - 8 * wlo).astype(np.int32)
    return windows, lbit
