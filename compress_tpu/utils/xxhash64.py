"""xxHash64 — zstd frame content checksum (low 32 bits) and dict hashing.

Reference parity: zstd/internal/xxhash (vendored cespare/xxhash v2 with
amd64/arm64 asm). Here: native C++ core via compress_tpu._native, with a
pure-Python fallback (the ``noasm`` analogue). The 4-lane accumulator chain
is inherently sequential per stream; parallelism comes from hashing many
independent blocks/frames at once (the framework checksums per frame).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data, seed: int = 0) -> int:
    """xxHash64 digest of data (bytes-like)."""
    from compress_tpu import _native

    b = bytes(data)
    if _native.available():
        return _native.lib_xxh64(b, seed)
    return _xxh64_py(b, seed)


class Xxh64:
    """Streaming xxHash64 (reference: xxhash.Digest Write/Sum64) — O(1)
    memory for unbounded streams; backs the streaming zstd Writer's frame
    checksum. Native state when available, pure-Python accumulators
    otherwise."""

    def __init__(self, seed: int = 0):
        import ctypes

        from compress_tpu import _native

        self._seed = seed
        self._st = None
        self._lib = None
        lib = _native.raw()
        if lib is not None and hasattr(lib, "ct_xxh64_new"):
            if not getattr(lib, "_xxhst_proto", False):
                lib.ct_xxh64_new.restype = ctypes.c_void_p
                lib.ct_xxh64_new.argtypes = [ctypes.c_uint64]
                lib.ct_xxh64_update.restype = None
                lib.ct_xxh64_update.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
                lib.ct_xxh64_digest.restype = ctypes.c_uint64
                lib.ct_xxh64_digest.argtypes = [ctypes.c_void_p]
                lib.ct_xxh64_free.restype = None
                lib.ct_xxh64_free.argtypes = [ctypes.c_void_p]
                lib._xxhst_proto = True
            self._lib = lib
            self._st = lib.ct_xxh64_new(seed)
        else:
            # pure-Python state: 4 accumulators + ≤32-byte carry
            self._v = [
                (seed + _P1 + _P2) & _M64,
                (seed + _P2) & _M64,
                seed & _M64,
                (seed - _P1) & _M64,
            ]
            self._carry = b""
            self._total = 0

    def update(self, data) -> None:
        b = bytes(data)
        if self._st is not None:
            self._lib.ct_xxh64_update(self._st, b, len(b))
            return
        self._total += len(b)
        b = self._carry + b
        v1, v2, v3, v4 = self._v
        i = 0
        while i + 32 <= len(b):
            v1 = _round(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        self._v = [v1, v2, v3, v4]
        self._carry = b[i:]

    def digest(self) -> int:
        if self._st is not None:
            return self._lib.ct_xxh64_digest(self._st)
        n = self._total
        tail = self._carry
        if n >= 32:
            v1, v2, v3, v4 = self._v
            h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
                 + _rotl(v4, 18)) & _M64
            h = _merge_round(h, v1)
            h = _merge_round(h, v2)
            h = _merge_round(h, v3)
            h = _merge_round(h, v4)
        else:
            h = (self._seed + _P5) & _M64
        h = (h + n) & _M64
        i = 0
        while i + 8 <= len(tail):
            h ^= _round(0, int.from_bytes(tail[i : i + 8], "little"))
            h = (_rotl(h, 27) * _P1 + _P4) & _M64
            i += 8
        if i + 4 <= len(tail):
            h ^= (int.from_bytes(tail[i : i + 4], "little") * _P1) & _M64
            h = (_rotl(h, 23) * _P2 + _P3) & _M64
            i += 4
        while i < len(tail):
            h ^= (tail[i] * _P5) & _M64
            h = (_rotl(h, 11) * _P1) & _M64
            i += 1
        h ^= h >> 33
        h = (h * _P2) & _M64
        h ^= h >> 29
        h = (h * _P3) & _M64
        h ^= h >> 32
        return h

    def __del__(self):
        try:
            if self._st is not None:
                self._lib.ct_xxh64_free(self._st)
                self._st = None
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
