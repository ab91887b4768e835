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
    """Decompress a block produced by :func:`compress`. Whole-container
    native path (NCount + 2-state stream in one call); any rejection
    re-runs the Python decoder for the precise error."""
    blob = bytes(blob)
    n, pos = read_uvarint(blob)
    if n > max_size:
        raise ValueError("decoded size exceeds limit")
    lib = core._native_entropy_lib()
    if lib is not None and n >= 2:
        import ctypes

        sp, sn = core.pad_scratch(blob, pos)
        out = np.empty(n, np.uint8)
        r = lib.ct_fse_decompress_body(
            sp, sn, out.ctypes.data_as(ctypes.c_char_p), n)
        if r == 0:
            return out.tobytes()
    norm, tl, pos = core.read_ncount(blob, pos, max_symbol=255)
    sym = core.decode_interleaved2(blob[pos:], norm, tl, n)
    return sym.tobytes()


def make_accel(containers, k: int | None = None):
    """Decode-accelerator checkpoints for FSE containers (one host walk):
    per chunk of k symbols, the (bitpos, state1, state2) entry point."""
    from compress_tpu.ops.entropy import HUFF_CKPT_K

    k = k or HUFF_CKPT_K
    assert k % 2 == 0
    rows = []
    cmax = 1
    for blob in containers:
        if blob is None:
            rows.append(None)
            continue
        blob = bytes(blob)
        n, pos = read_uvarint(blob)
        norm, tl, pos = core.read_ncount(blob, pos, max_symbol=255)
        spread, nb, new_state = core.build_dtable(norm, tl)
        br = core.BitReaderReverse(blob[pos:])
        s1 = br.read(tl)
        s2 = br.read(tl)
        cks = [(br.bitpos, s1, s2)]
        for i in range(n):
            if i & 1:
                if i < n - 2:
                    s2 = int(new_state[s2]) + br.read(int(nb[s2]))
            else:
                if i < n - 2:
                    s1 = int(new_state[s1]) + br.read(int(nb[s1]))
            if (i + 1) % k == 0 and i + 1 < n:
                cks.append((br.bitpos, s1, s2))
        rows.append((tl, cks, n))
        cmax = max(cmax, len(cks))
    ckpt = np.zeros((len(containers), cmax, 3), np.int32)
    logs = np.zeros(len(containers), np.int32)
    for i, r in enumerate(rows):
        if r is None:
            continue
        tl, cks, n = r
        logs[i] = tl
        for c, tup in enumerate(cks):
            ckpt[i, c] = tup
    return {"ckpt": ckpt, "k": k, "logs": logs}


def decompress_batch(containers, accel=None, max_size: int = 64 << 20):
    """Decode a batch of FSE containers; with `accel` the interleaved
    state machine runs on device (ops/entropy_dec.fse_decode_chunks).
    Host fallback without. None entries pass through."""
    if accel is None:
        return [None if c is None else decompress(c, max_size)
                for c in containers]
    import jax.numpy as jnp

    from compress_tpu.ops import entropy_dec as ED

    K = int(accel["k"])
    ckpt = np.asarray(accel["ckpt"])
    logs = np.asarray(accel["logs"])
    N = len(containers)
    metas = []
    cmax = 1
    for i, blob in enumerate(containers):
        if blob is None or int(logs[i]) != 9:
            metas.append(None)  # device path is specialized to log 9
            continue
        blob = bytes(blob)
        n, pos = read_uvarint(blob)
        if n > max_size:
            raise ValueError("decoded size exceeds limit")
        norm, tl, pos = core.read_ncount(blob, pos, max_symbol=255)
        spread, nb, new_state = core.build_dtable(norm, tl)
        table = ED.expand_fse_table(spread, nb, new_state)
        stream = blob[pos:]
        nch = -(-n // K)
        w, lb = ED.build_windows(stream, ckpt[i, :, 0].copy(), nch)
        st1 = ckpt[i, :nch, 1].astype(np.int32)
        st2 = ckpt[i, :nch, 2].astype(np.int32)
        npair = np.clip(n - K * np.arange(nch), 0, K) // 2
        # reload cutoffs: symbol 2m (state1) reloads while 2m < n-2,
        # symbol 2m+1 (state2) while 2m+1 < n-2; pair index local to
        # the chunk
        base = K * np.arange(nch)
        lim1 = np.clip(((n - 2 + 1) // 2) - base // 2, 0, K // 2)
        lim2 = np.clip(((n - 2) // 2) - base // 2, 0, K // 2)
        metas.append((n, table, w, lb, st1, st2,
                      npair.astype(np.int32), lim1.astype(np.int32),
                      lim2.astype(np.int32)))
        cmax = max(cmax, nch)
    windows = np.zeros((N, cmax, ED.WIN), np.uint8)
    lbit = np.full((N, cmax), 8 * ED.WIN, np.int32)
    st1 = np.zeros((N, cmax), np.int32)
    st2 = np.zeros((N, cmax), np.int32)
    npair = np.zeros((N, cmax), np.int32)
    nore1 = np.zeros((N, cmax), np.int32)
    nore2 = np.zeros((N, cmax), np.int32)
    tables = np.zeros((N, 16, 96), np.float32)
    for i, m in enumerate(metas):
        if m is None:
            continue
        _, table, w, lb, s1, s2, np_, l1, l2 = m
        nc = len(lb)
        tables[i] = table
        windows[i, :nc] = w
        lbit[i, :nc] = lb
        st1[i, :nc] = s1
        st2[i, :nc] = s2
        npair[i, :nc] = np_
        nore1[i, :nc] = l1
        nore2[i, :nc] = l2
    syms, endl = ED.fse_decode_chunks(
        jnp.asarray(windows), jnp.asarray(lbit), jnp.asarray(st1),
        jnp.asarray(st2), jnp.asarray(npair), jnp.asarray(nore1),
        jnp.asarray(nore2), jnp.asarray(tables), k=K)
    syms = np.asarray(syms, np.int32)
    out = []
    for i, m in enumerate(metas):
        if m is None:
            blob = containers[i]
            out.append(None if blob is None else decompress(blob, max_size))
            continue
        n = m[0]
        nc = len(m[3])
        s = syms[i, :nc].reshape(-1)[:n]
        out.append(s.astype(np.uint8).tobytes())
    return out


__all__ = ["compress", "decompress", "decompress_batch", "make_accel",
           "IncompressibleError", "UseRLEError", "core"]


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
