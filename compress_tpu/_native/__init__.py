"""Native C++ host core — the reference's generated-assembly analogue.

The serial byte/bit plumbing that is genuinely host work (framing, bitstream
assembly, LZ execute on the host path) lives in C++, lazily compiled with
g++ into a cached shared object. Every entry point has a pure-Python/numpy
fallback; set COMPRESS_TPU_NONATIVE=1 to force fallbacks (the reference's
``noasm`` build tag, tested the same way — the suite runs both modes).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_HERE, "src")

_lock = threading.Lock()
_lib = None
_tried = False


def _sources() -> list[str]:
    return sorted(
        os.path.join(_SRC_DIR, f) for f in os.listdir(_SRC_DIR) if f.endswith(".cpp")
    )


def _cpu_flags() -> list[str]:
    """Feature flags for the BUILD machine (the .so is lazily compiled
    where it runs, so -mbmi2 etc. are safe when /proc/cpuinfo shows
    them; the reference gates the same paths via cpuinfo.HasBMI2)."""
    flags = ["-msse4.2", "-mavx2"]
    try:
        feats = open("/proc/cpuinfo").read()
        if " bmi2" in feats or "\tbmi2" in feats or "bmi2 " in feats:
            flags += ["-mbmi", "-mbmi2", "-mlzcnt"]
    except OSError:
        pass
    return flags


def _source_hash() -> str:
    h = hashlib.sha256()
    for s in _sources():
        with open(s, "rb") as f:
            h.update(f.read())
    h.update(" ".join(_cpu_flags()).encode())  # flags key the cache too
    return h.hexdigest()[:16]


def _build() -> str | None:
    """Compile sources to a cached .so; returns path or None on failure."""
    cache_dir = os.environ.get(
        "COMPRESS_TPU_CACHE", os.path.join(tempfile.gettempdir(), "compress_tpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"libct_{_source_hash()}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *_cpu_flags(), "-fno-exceptions",
        "-o", so_path + ".tmp", *_sources(),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception as e:  # noqa: BLE001 — any build failure means fallback
        sys.stderr.write(f"compress_tpu: native build failed ({e}); using fallbacks\n")
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("COMPRESS_TPU_NONATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.ct_crc32c.restype = ctypes.c_uint32
        lib.ct_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32]
        lib.ct_xxh64.restype = ctypes.c_uint64
        lib.ct_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def out_buf(cap: int):
    """Uninitialized output buffer for native calls: (array, c_char_p).

    ctypes.create_string_buffer memsets its allocation and .raw copies
    the FULL capacity before slicing — measured ~20% of a 2 MiB L1
    encode call. numpy.empty skips the zero fill; take only the used
    prefix with arr[:r].tobytes(). The returned pointer keeps a
    reference to the array (ctypes data_as contract)."""
    import numpy as np

    arr = np.empty(cap, np.uint8)
    return arr, arr.ctypes.data_as(ctypes.c_char_p)


def raw():
    """The ctypes CDLL (for modules registering their own prototypes)."""
    return _load()


def lib_crc32c(data, crc: int = 0) -> int:
    b = bytes(data)
    return _load().ct_crc32c(b, len(b), crc)


def lib_xxh64(data, seed: int = 0) -> int:
    b = bytes(data)
    return _load().ct_xxh64(b, len(b), seed)
