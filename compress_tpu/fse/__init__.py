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


def compress_batch(blocks, table_log: int = 9) -> list:
    """Device-batched FSE compress over equal-length blocks (L even).

    Same container as :func:`compress` ([uvarint n][ncount][stream]);
    entries are None where the block is incompressible/RLE."""
    import jax.numpy as jnp

    from compress_tpu.ops import entropy as E

    arr = np.ascontiguousarray(blocks).astype(np.uint8)
    N, L = arr.shape
    t = {k: np.asarray(v) for k, v in
         E.fse_encode_blocks(jnp.asarray(arr), log=table_log).items()}
    out = []
    for i in range(N):
        hist = t["hist"][i]
        if int(hist.max()) in (L, 1) or int(hist.max()) < (L >> 7):
            out.append(None)  # RLE / incompressible per reference contract
            continue
        norm = t["norm"][i].astype(np.int64)
        nz = np.nonzero(norm)[0]
        header = core.write_ncount(norm[: nz[-1] + 1], table_log)
        tb = int(t["total_bits"][i])
        sb = (tb + 1 + 7) // 8
        stream = bytearray(t["halves"][i].astype(np.uint16).tobytes()[:sb])
        stream[tb >> 3] |= 1 << (tb & 7)
        blob = bytearray()
        put_uvarint(blob, L)
        blob += header
        blob += stream
        out.append(bytes(blob) if len(blob) < L else None)
    return out
