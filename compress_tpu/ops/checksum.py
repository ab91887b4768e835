"""Device checksum kernels — batched CRC-32C and xxHash64.

Reference roles: zstd/internal/xxhash/xxhash_amd64.s and the s2 framing
CRC (s2/s2.go:114-126). TPU-first designs, not translations:

- **CRC-32C is GF(2)-linear**, so a whole chunk's CRC is one matmul:
  bytes -> 8 bit-planes; a (CHUNK, 8, 32) contribution table maps every
  (position, bit) to its 32 raw-CRC bits; summing contributions on the
  MXU and reducing mod 2 gives the chunk CRC. Chunk CRCs combine into
  the block CRC with precomputed GF(2) shift matrices (one more small
  einsum). Fully parallel over positions AND blocks — no scan at all.
- **xxHash64 is a sequential multiply-rotate chain**, so it runs as a
  lax.scan over 32-byte stripes with the batch as the vector axis
  (sequential-in-stripes, parallel-over-blocks), with 64-bit arithmetic
  emulated in 16-bit limbs (TPU has no u64).

Both are validated bit-exactly against the host implementations
(utils/crc.py, utils/xxhash64.py) in tests/test_checksum_device.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from compress_tpu.utils import crc as hostcrc

CHUNK = 512


# ---------------------------------------------------------------------------
# CRC-32C — linear-algebra formulation
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bit_table():
    """TB[p, j, i]: bit i of raw_crc(chunk with only bit j of byte p set).

    raw_crc = CRC state after processing the chunk from state 0 (no
    init/final conditioning — conditioning is applied per call)."""
    t0 = hostcrc._TBL[0]
    m1 = hostcrc._shift_matrix(1)

    def apply(vec):
        return hostcrc._gf2_matrix_times(m1, vec)

    TB = np.zeros((CHUNK, 8, 32), np.float32)
    cur = np.zeros(8, np.uint64)
    for j in range(8):
        cur[j] = t0[1 << j]  # state after sole byte 2^j at the last pos
    for p in range(CHUNK - 1, -1, -1):
        for j in range(8):
            v = int(cur[j])
            TB[p, j] = [(v >> i) & 1 for i in range(32)]
            cur[j] = apply(v)
    return TB


@functools.lru_cache(maxsize=None)
def _combine_mats(nchunks: int):
    """SH[k]: GF(2) matrix shifting chunk k's raw CRC past the
    remaining (nchunks-1-k) chunks."""
    m512 = hostcrc._shift_matrix(CHUNK)
    SH = np.zeros((nchunks, 32, 32), np.float32)
    cur = np.eye(32, dtype=np.uint64)
    # cur as bit-matrix in packed rows: use the float matrix directly
    mats = [np.eye(32, dtype=np.float32)]
    m512b = np.zeros((32, 32), np.float32)
    for i in range(32):
        v = int(m512[i])
        m512b[i] = [(v >> r) & 1 for r in range(32)]
    for _ in range(nchunks - 1):
        mats.append((mats[-1] @ m512b) % 2.0)
    for k in range(nchunks):
        SH[k] = mats[nchunks - 1 - k]
    return SH


def crc32c_batch(blocks, length: int | None = None):
    """Raw-parallel CRC-32C of a batch of equal-length byte blocks.

    blocks: (B, N) uint8 (device or host). Returns (B,) uint32 device
    array of standard CRC-32C values (init/final conditioned)."""
    blocks = jnp.asarray(blocks, jnp.uint8)
    B, N = blocks.shape
    n = length if length is not None else N
    pad = (-n) % CHUNK
    nchunks = (n + pad) // CHUNK
    TB = jnp.asarray(_bit_table())           # (CHUNK, 8, 32)
    SH = jnp.asarray(_combine_mats(nchunks))  # (nchunks, 32, 32)
    # leading zero-pad is a no-op for raw CRC from state 0
    x = jnp.pad(blocks[:, :n], ((0, 0), (pad, 0)))
    x = x.reshape(B, nchunks, CHUNK)
    bits = jnp.stack([(x >> j) & 1 for j in range(8)], axis=-1)  # B,K,C,8
    # chunk raw CRCs: sum contributions on the MXU, reduce mod 2
    acc = jnp.einsum("bkcj,cji->bki", bits.astype(jnp.float32), TB,
                     precision=jax.lax.Precision.HIGHEST)
    cbits = jnp.mod(acc, 2.0)
    # combine across chunks
    tot = jnp.einsum("bki,kio->bo", cbits, SH,
                     precision=jax.lax.Precision.HIGHEST)
    tbits = jnp.mod(tot, 2.0).astype(jnp.uint32)
    raw = jnp.sum(tbits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                  axis=-1)
    # conditioning: crc(data) = raw(data) ^ shift(0xFFFFFFFF, n) ^ FFFF
    m = hostcrc._shift_matrix(n)
    init = hostcrc._gf2_matrix_times(m, 0xFFFFFFFF)
    return raw ^ np.uint32(init) ^ np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# xxHash64 — strided scan with 16-bit-limb u64 arithmetic
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D8A2D85EEF66


def _limbs(v: int):
    return [(v >> (16 * i)) & 0xFFFF for i in range(4)]


def _to_l(x32lo, x32hi):
    """Two u32 -> four 16-bit limbs (as int32 arrays)."""
    return [(x32lo & 0xFFFF).astype(jnp.int32),
            ((x32lo >> 16) & 0xFFFF).astype(jnp.int32),
            (x32hi & 0xFFFF).astype(jnp.int32),
            ((x32hi >> 16) & 0xFFFF).astype(jnp.int32)]


def _l_add(a, b):
    out = []
    carry = 0
    for i in range(4):
        s = a[i] + b[i] + carry
        out.append(s & 0xFFFF)
        carry = s >> 16
    return out


def _l_add_const(a, c: int):
    return _l_add(a, [jnp.full_like(a[0], v) for v in _limbs(c)])


def _mul_acc(out, a, bl_get, nb):
    """Accumulate a (16-bit limbs) times b into out; b's limbs come from
    bl_get(j) split into 8-bit halves so every product fits int32."""
    for i in range(4):
        for j in range(nb):
            if i + j >= 4:
                break
            bj = bl_get(j)
            lo8 = bj & 0xFF
            hi8 = (bj >> 8) & 0xFF
            p0 = a[i] * lo8           # <= 2^24
            p1 = a[i] * hi8           # <= 2^24, lives at bit offset 8
            out[i + j] = out[i + j] + (p0 & 0xFFFF) + ((p1 & 0xFF) << 8)
            if i + j + 1 < 4:
                out[i + j + 1] = out[i + j + 1] + (p0 >> 16) + (p1 >> 8)
    return out


def _carry(out):
    carry = jnp.zeros_like(out[0])
    res = []
    for i in range(4):
        s = out[i] + carry
        res.append(s & 0xFFFF)
        carry = s >> 16
    return res


def _l_mul_const(a, c: int):
    """64-bit product (low 64) of limb vector by constant."""
    cl = _limbs(c)
    out = [jnp.zeros_like(a[0]) for _ in range(4)]
    out = _mul_acc(out, a, lambda j: cl[j], 4)
    return _carry(out)


def _words(a):
    """Limbs -> two uint32 words (unsigned so shifts stay logical)."""
    lo = a[0].astype(jnp.uint32) | (a[1].astype(jnp.uint32) << 16)
    hi = a[2].astype(jnp.uint32) | (a[3].astype(jnp.uint32) << 16)
    return lo, hi


def _l_rotl(a, r: int):
    """Rotate-left of the 64-bit value by r (static)."""
    lo, hi = _words(a)
    r = r % 64
    if r == 0:
        nlo, nhi = lo, hi
    elif r < 32:
        nlo = (lo << r) | (hi >> (32 - r))
        nhi = (hi << r) | (lo >> (32 - r))
    elif r == 32:
        nlo, nhi = hi, lo
    else:
        rr = r - 32
        nlo = (hi << rr) | (lo >> (32 - rr))
        nhi = (lo << rr) | (hi >> (32 - rr))
    return _to_l(nlo, nhi)


def _l_xor(a, b):
    return [x ^ y for x, y in zip(a, b)]


def _l_shr(a, r: int):
    lo, hi = _words(a)
    if r < 32:
        nlo = (lo >> r) | (hi << (32 - r))
        nhi = hi >> r
    else:
        nlo = hi >> (r - 32)
        nhi = jnp.zeros_like(hi)
    return _to_l(nlo, nhi)


def _round64(acc, inp):
    acc = _l_add(acc, _l_mul_const(inp, _P2))
    acc = _l_rotl(acc, 31)
    return _l_mul_const(acc, _P1)


def _merge_round64(acc, val):
    val = _round64([jnp.zeros_like(val[0])] * 4, val)
    acc = _l_xor(acc, val)
    acc = _l_mul_const(acc, _P1)
    return _l_add_const(acc, _P4)


def xxh64_batch(blocks, seed: int = 0):
    """Batched xxHash64 of equal-length blocks (multiple of 32 bytes).

    blocks: (B, N) uint8 with N % 32 == 0. Returns (B,) uint64 as a
    (B, 2) uint32 array [lo, hi] (TPU has no u64 dtype)."""
    blocks = jnp.asarray(blocks, jnp.uint8)
    B, N = blocks.shape
    if N % 32 or N < 32:
        raise ValueError("xxh64_batch needs N % 32 == 0, N >= 32")
    words = blocks.reshape(B, N // 8, 4, 2).astype(jnp.int32)
    # little-endian u64 lanes as 16-bit limbs: (B, nwords, limb)
    limbs = words[..., 0] | (words[..., 1] << 8)  # (B, N//8, 4) 16-bit
    stripes = limbs.reshape(B, N // 32, 4, 4).transpose(1, 0, 2, 3)

    def init_acc(c):
        return [jnp.full((B,), v, jnp.int32) for v in _limbs(c)]

    accs = [init_acc((seed + _P1 + _P2) & ((1 << 64) - 1)),
            init_acc((seed + _P2) & ((1 << 64) - 1)),
            init_acc(seed),
            init_acc((seed - _P1) & ((1 << 64) - 1))]

    def step(carry, stripe):
        # stripe: (B, lane 4, limb 4)
        new = []
        for k in range(4):
            inp = [stripe[:, k, i] for i in range(4)]
            new.append(_round64(carry[k], inp))
        return new, 0.0

    accs, _ = jax.lax.scan(step, accs, stripes)
    h = _l_add(_l_add(_l_rotl(accs[0], 1), _l_rotl(accs[1], 7)),
               _l_add(_l_rotl(accs[2], 12), _l_rotl(accs[3], 18)))
    for k in range(4):
        h = _merge_round64(h, accs[k])
    h = _l_add_const(h, N)
    # avalanche
    h = _l_xor(h, _l_shr(h, 33))
    h = _l_mul_const(h, _P2)
    h = _l_xor(h, _l_shr(h, 29))
    h = _l_mul_const(h, _P3)
    h = _l_xor(h, _l_shr(h, 32))
    lo, hi = _words(h)
    return jnp.stack([lo, hi], axis=-1)
