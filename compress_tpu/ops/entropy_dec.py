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
    w32 = windows.astype(jnp.int32)
    hw = w32[:, :, 0::2] | (w32[:, :, 1::2] << 8)      # (N, C, NHW)
    hwi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NHW), 2)

    def step(carry, i):
        lbp, = carry
        bp = lbp - 11
        bpc = jnp.maximum(bp, 0)
        hsel = bpc >> 4
        oh0 = (hwi == hsel[:, :, None]).astype(jnp.int32)
        oh1 = (hwi == jnp.minimum(hsel + 1, NHW - 1)[:, :, None]
               ).astype(jnp.int32)
        h0 = jnp.sum(hw * oh0, axis=-1)
        h1 = jnp.sum(hw * oh1, axis=-1)
        word = (h0.astype(jnp.uint32)
                | (h1.astype(jnp.uint32) << 16))
        val = (word >> (bpc & 15).astype(jnp.uint32)).astype(jnp.int32)
        val = (val << (bpc - bp)) & 0x7FF
        hi = val >> 5
        lo = val & 31
        ohh = jax.nn.one_hot(hi, 64, dtype=jnp.float32)
        rows = jnp.einsum("nch,nhl->ncl", ohh, tables,
                          precision="highest")          # (N, C, 32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)
        packed = jnp.sum(jnp.where(lane == lo[:, :, None], rows, 0.0),
                         axis=-1).astype(jnp.int32)
        sym = packed >> 4
        nb = packed & 15
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
