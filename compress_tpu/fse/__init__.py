"""fse — standalone finite-state-entropy (tANS) block codec.

Reference parity: the fse/ package (Compress/Decompress with Scratch,
ErrIncompressible / ErrUseRLE contracts, tableLog <= 12 default 11 —
fse/fse.go:20-34). The container here is
``[uvarint decoded-length][NCount header][2-state interleaved bitstream]``;
the reference's container omits the explicit length (termination by stream
exhaustion) — we carry it so chunked/device decoding knows output sizes up
front, which is the TPU-native requirement (static shapes).
"""

from __future__ import annotations

import numpy as np

from compress_tpu.fse import core
from compress_tpu.utils.varint import put_uvarint, read_uvarint
from compress_tpu.utils.histogram import histogram256


class IncompressibleError(ValueError):
    """Input won't benefit from FSE (reference: ErrIncompressible)."""


class UseRLEError(ValueError):
    """Input is a single repeated symbol (reference: ErrUseRLE)."""


def compress(data, table_log: int = 0) -> bytes:
    """FSE-compress a byte block. Raises UseRLEError / IncompressibleError

    exactly like the reference's Compress contract."""
    data = bytes(data)
    n = len(data)
    if n <= 1:
        raise IncompressibleError("input too small")
    if n > (2 << 30) - 1:
        raise ValueError("input too big, must be < 2GB")
    buf = np.frombuffer(data, dtype=np.uint8)
    hist = histogram256(buf)
    max_count = int(hist.max())
    max_symbol = int(np.nonzero(hist)[0][-1])
    if max_count == n:
        raise UseRLEError("single symbol")
    if max_count == 1 or max_count < (n >> 7):
        raise IncompressibleError("too well distributed")

    tl = core.optimal_table_log(table_log, n, max_symbol)
    norm = core.normalize_count(hist, tl, n, max_symbol)
    header = core.write_ncount(norm, tl)
    stream = core.encode_interleaved2(buf, norm, tl)
    out = bytearray()
    put_uvarint(out, n)
    out += header
    out += stream
    if len(out) >= n:
        raise IncompressibleError("did not compress")
    return bytes(out)


def decompress(blob, max_size: int = 64 << 20) -> bytes:
    """Decompress a block produced by :func:`compress`."""
    blob = bytes(blob)
    n, pos = read_uvarint(blob)
    if n > max_size:
        raise ValueError("decoded size exceeds limit")
    norm, tl, pos = core.read_ncount(blob, pos, max_symbol=255)
    sym = core.decode_interleaved2(blob[pos:], norm, tl, n)
    return sym.tobytes()


__all__ = ["compress", "decompress", "IncompressibleError", "UseRLEError", "core"]
