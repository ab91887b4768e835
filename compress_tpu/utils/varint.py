"""Unsigned/signed base-128 varints (Go encoding/binary compatible).

Used by the S2 block preamble (uncompressed length), the S2 seek index and
dictionary serialization. Reference behavior: s2/encode.go:44-52 (varint
header), s2/index.go (delta varints).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_LEN64 = 10


def uvarint_len(x: int) -> int:
    """Number of bytes put_uvarint will emit for x."""
    n = 1
    while x >= 0x80:
        x >>= 7
        n += 1
    return n


def put_uvarint(out: bytearray, x: int) -> int:
    """Append x as a uvarint; returns number of bytes written."""
    n = 0
    while x >= 0x80:
        out.append((x & 0x7F) | 0x80)
        x >>= 7
        n += 1
    out.append(x)
    return n + 1


def read_uvarint(buf, pos: int = 0) -> tuple[int, int]:
    """Decode a uvarint from buf[pos:]. Returns (value, new_pos).

    Raises ValueError on overflow or truncation (matching Go's
    binary.Uvarint's <=0 return conditions, which s2 treats as corrupt).
    """
    x = 0
    s = 0
    for i in range(_MAX_VARINT_LEN64):
        if pos + i >= len(buf):
            raise ValueError("uvarint: truncated")
        b = buf[pos + i]
        if b < 0x80:
            if i == _MAX_VARINT_LEN64 - 1 and b > 1:
                raise ValueError("uvarint: overflow")
            return x | (b << s), pos + i + 1
        x |= (b & 0x7F) << s
        s += 7
    raise ValueError("uvarint: overflow")


def put_varint(out: bytearray, x: int) -> int:
    """Zig-zag signed varint (Go binary.PutVarint)."""
    ux = (x << 1) ^ (x >> 63) if x < 0 else (x << 1)
    return put_uvarint(out, ux & ((1 << 64) - 1))


def read_varint(buf, pos: int = 0) -> tuple[int, int]:
    ux, pos = read_uvarint(buf, pos)
    x = ux >> 1
    if ux & 1:
        x = ~x
    return x, pos


def uvarint_lens_np(values: np.ndarray) -> np.ndarray:
    """Vectorized uvarint byte lengths for a uint64 array (device-friendly

    shape math for parallel emit: lengths -> exclusive scan -> scatter)."""
    v = values.astype(np.uint64)
    bits = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for _ in range(10):
        bits += (x != 0).astype(np.int64)
        x >>= np.uint64(7)
    return np.maximum(bits, 1)
