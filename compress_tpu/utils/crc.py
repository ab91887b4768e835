"""CRC-32 (Castagnoli) and the Snappy/S2 masked checksum.

Reference parity: s2/s2.go:114-126 (``crc`` = CRC-32C with the snappy
framing mask), gzip/zlib use IEEE crc32 / adler32 (stdlib zlib covers those).

Three tiers:
- native C++ core (SSE4.2 CRC32 instruction / slicing-by-16) via
  compress_tpu._native — the default host path;
- numpy slicing-by-16 fallback (the ``noasm`` analogue);
- ``crc32c_combine`` for parallel/sharded computation: per-shard CRCs are
  combined with GF(2) matrix shifts so a mesh of devices can checksum
  independent chunks and the host merges in O(log n) — the TPU-native
  answer to the reference's per-goroutine CRC (s2/writer.go:526).
"""

from __future__ import annotations

import numpy as np

_CASTAGNOLI_POLY = 0x82F63B78  # reflected

# ---------------------------------------------------------------------------
# Table construction (slicing-by-16)
# ---------------------------------------------------------------------------


def _make_tables(poly: int, n: int = 16) -> np.ndarray:
    t = np.zeros((n, 256), dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (poly if (c & 1) else 0)
        t[0, i] = c
    for k in range(1, n):
        t[k] = (t[0][(t[k - 1] & 0xFF).astype(np.int64)] ^ (t[k - 1] >> np.uint32(8)))
    return t


_TBL = _make_tables(_CASTAGNOLI_POLY)


def _crc32c_numpy(data, crc: int = 0) -> int:
    """Slicing-by-16 CRC-32C. Pure numpy fallback path."""
    buf = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    crc = (crc ^ 0xFFFFFFFF) & 0xFFFFFFFF
    n = buf.size
    i = 0
    nfast = n - (n % 16)
    if nfast:
        blocks = buf[:nfast].reshape(-1, 16).astype(np.int64)
        t = _TBL
        for blk in blocks:
            b0 = int(blk[0]) | (int(blk[1]) << 8) | (int(blk[2]) << 16) | (int(blk[3]) << 24)
            b0 ^= crc
            crc = (
                int(t[15, b0 & 0xFF])
                ^ int(t[14, (b0 >> 8) & 0xFF])
                ^ int(t[13, (b0 >> 16) & 0xFF])
                ^ int(t[12, (b0 >> 24) & 0xFF])
                ^ int(t[11, blk[4]])
                ^ int(t[10, blk[5]])
                ^ int(t[9, blk[6]])
                ^ int(t[8, blk[7]])
                ^ int(t[7, blk[8]])
                ^ int(t[6, blk[9]])
                ^ int(t[5, blk[10]])
                ^ int(t[4, blk[11]])
                ^ int(t[3, blk[12]])
                ^ int(t[2, blk[13]])
                ^ int(t[1, blk[14]])
                ^ int(t[0, blk[15]])
            )
        i = nfast
    t0 = _TBL[0]
    for b in buf[i:]:
        crc = int(t0[(crc ^ int(b)) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def crc32c(data, crc: int = 0) -> int:
    """CRC-32C (Castagnoli) of data, continuing from ``crc``."""
    from compress_tpu import _native

    if _native.available():
        mv = memoryview(bytes(data)) if isinstance(data, (bytearray, memoryview)) else memoryview(data if isinstance(data, bytes) else bytes(data))
        return _native.lib_crc32c(mv, crc)
    return _crc32c_numpy(data, crc)


def crc32c_masked(data) -> int:
    """The snappy framing-format checksum: masked CRC-32C (s2/s2.go:119-126)."""
    c = crc32c(data)
    return ((c >> 15) | (c << 17) & 0xFFFFFFFF) + 0xA282EAD8 & 0xFFFFFFFF


# Alias matching the reference's internal name.
crc_snappy = crc32c_masked


# ---------------------------------------------------------------------------
# GF(2) combine — parallel CRC over shards
# ---------------------------------------------------------------------------


def _gf2_matrix_times(mat: np.ndarray, vec: int) -> int:
    s = 0
    i = 0
    while vec:
        if vec & 1:
            s ^= int(mat[i])
        vec >>= 1
        i += 1
    return s


def _gf2_matrix_square(mat: np.ndarray) -> np.ndarray:
    return np.array([_gf2_matrix_times(mat, int(v)) for v in mat], dtype=np.uint64)


def _shift_matrix(nbytes: int) -> np.ndarray:
    """32x32 GF(2) matrix (as 32 uint32 columns) advancing a CRC register by

    ``nbytes`` zero bytes (i.e. multiply by x^(8*nbytes) mod P, reflected)."""
    # M1 = one-zero-bit advance matrix; square-and-multiply over 8*nbytes bits.
    m = np.zeros(32, dtype=np.uint64)
    m[0] = _CASTAGNOLI_POLY
    for i in range(1, 32):
        m[i] = 1 << (i - 1)
    result = None
    bits = 8 * nbytes
    cur = m
    while bits:
        if bits & 1:
            result = cur if result is None else np.array(
                [_gf2_matrix_times(cur, int(v)) for v in result], dtype=np.uint64
            )
        cur = _gf2_matrix_square(cur)
        bits >>= 1
    if result is None:
        result = np.array([1 << i for i in range(32)], dtype=np.uint64)  # identity
    return result


def crc32c_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc of concat given crcs of the two pieces (zlib crc32_combine shape)."""
    if len2 == 0:
        return crc1
    m = _shift_matrix(len2)
    return _gf2_matrix_times(m, crc1) ^ crc2
