"""Batched device decode of S2/snappy blocks (reference role:
s2/decode_amd64.s — VERDICT r2 missing #6).

S2 blocks are the easiest device-decode target: no entropy stage, offsets
reset per block. One native call per block (`ct_s2_build_plan`,
zstd_dec.cpp) parses the tag stream — the only inherently serial byte
work — into the literal buffer and a round-annotated execute plan; the
byte movement (the actual decode work) then runs as ONE batched arena
kernel over every block at once (ops/execute.py). Blocks that cannot be
planned (output > 64 KiB, corrupt) fall back to the native host decoder,
the reference's asm/no-asm contract.

Bit-exact vs the host decoder on the reference corpora in
tests/test_s2_device_dec.py.
"""

from __future__ import annotations

import ctypes

import numpy as np

from compress_tpu.s2 import block as B
from compress_tpu.utils.varint import read_uvarint

_proto = False


def _lib():
    global _proto
    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_s2_build_plan"):
        return None
    if not _proto:
        lib.ct_s2_build_plan.restype = ctypes.c_longlong
        lib.ct_s2_build_plan.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_longlong]
        _proto = True
    return lib


def _parse_payload(payload: bytes):
    total, nlit = np.frombuffer(payload, np.uint32, 2, 0)
    pos = 8
    lit = payload[pos : pos + int(nlit)]
    pos += int(nlit)
    n_pieces = int.from_bytes(payload[pos : pos + 4], "little")
    pos += 4
    n_rounds = payload[pos]
    pos += 1
    src = np.frombuffer(payload, np.int32, n_pieces, pos).copy()
    pos += 4 * n_pieces
    length = np.frombuffer(payload, np.uint8, n_pieces, pos).astype(np.int32)
    pos += n_pieces
    rnd = np.frombuffer(payload, np.uint8, n_pieces, pos).astype(np.int32)
    return int(total), lit, src, length, rnd, int(n_rounds)


def decode_blocks_device(blocks, *, allow_repeat: bool = True,
                         max_rounds: int = 4, mesh=None):
    """Decode a batch of S2 (or snappy, allow_repeat=False) blocks on
    device. Returns list of bytes, bit-exact vs s2.decode.

    mesh: optional Mesh with a 'data' axis — blocks are independent, so
    the execute batch shards data-parallel across chips."""
    from compress_tpu.ops import execute as X

    lib = _lib()
    results = [None] * len(blocks)
    plans, lit_rows, order = [], [], []
    for i, blk in enumerate(blocks):
        blk = bytes(blk)
        payload = None
        if lib is not None:
            dlen, pos = read_uvarint(blk)
            body = blk[pos:]
            if 0 < dlen <= (1 << 18):
                from compress_tpu import _native

                cap = 8 + dlen + 6 * (4 * dlen + 2048) + 64
                oarr, out = _native.out_buf(cap)
                r = lib.ct_s2_build_plan(body, len(body), dlen,
                                         1 if allow_repeat else 0,
                                         int(max_rounds), out, cap)
                if r > 0:
                    payload = oarr[:r].tobytes()
        if payload is None:
            results[i] = B.decode(blk, allow_repeat=allow_repeat)
            continue
        total, lit, src, length, rnd, n_rounds = _parse_payload(payload)
        M = 1
        while M * (1 << 16) < total:
            M <<= 1
        plans.append({"src": src,
                      "dst": (M * X.OUT_BASE + np.concatenate(
                          [[0], np.cumsum(length[:-1], dtype=np.int64)])
                          ).astype(np.int32),
                      "len": length, "round": rnd, "n_rounds": n_rounds})
        arr = np.zeros(M * 512 * 128, np.uint8)
        arr[: len(lit)] = np.frombuffer(lit, np.uint8)
        lit_rows.append(arr.reshape(M * 512, 128))
        order.append((i, total, M))
    if plans:
        from compress_tpu.ops.execute import put_sharded as _put_sharded

        # batch per arena class M (the plan's addresses embed M*OUT_BASE)
        classes = sorted({o[2] for o in order})
        for Mc in classes:
            sel = [j for j, o in enumerate(order) if o[2] == Mc]
            src, dst, length, caps = X.pack_plans([plans[j] for j in sel])
            out = X.execute_rounds_jit(
                _put_sharded(mesh, np.stack([lit_rows[j] for j in sel]), 0),
                _put_sharded(mesh, src, 1), _put_sharded(mesh, dst, 1),
                _put_sharded(mesh, length, 1), caps)
            out = np.asarray(out, np.uint8).reshape(-1, Mc * 512 * 128)
            for k, j in enumerate(sel):
                i, total, _m = order[j]
                results[i] = out[k, :total].tobytes()
    return results
