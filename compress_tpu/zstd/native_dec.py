"""Native-core zstd frame-body decoder (ctypes over _native/src/zstd_dec.cpp).

Drop-in fast path for dictionary-less frames: the Python wrapper keeps all
frame/header/checksum logic and calls the native block decoder with a
persistent per-frame state (window + rep offsets + treeless/repeat tables).
Any native error returns None and the caller re-runs the pure-Python
decoder (which produces the precise error) — the reference's asm/Go
dual-path convention.

Block payloads are passed with 16 bytes of zero slack so the native bit
readers may over-read harmlessly (the reference's compressedBlockOverAlloc
convention, zstd/blockdec.go:42).
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from compress_tpu.zstd import block as B

_proto_done = False

_tls = threading.local()


_PyBytes_FromStringAndSize = ctypes.pythonapi.PyBytes_FromStringAndSize
_PyBytes_FromStringAndSize.restype = ctypes.py_object
_PyBytes_FromStringAndSize.argtypes = [ctypes.c_char_p, ctypes.c_ssize_t]
_PyBytes_AsString = ctypes.pythonapi.PyBytes_AsString
_PyBytes_AsString.restype = ctypes.c_void_p
_PyBytes_AsString.argtypes = [ctypes.py_object]
# raw-pointer prototype: _PyBytes_Resize may realloc-MOVE the object, so the
# in/out slot must be a plain address cell — a ctypes.py_object box would
# keep its own alive-reference to the OLD address and corrupt the heap when
# collected (observed: intermittent glibc "double linked list" aborts)
_PyBytes_Resize = ctypes.pythonapi._PyBytes_Resize
_PyBytes_Resize.restype = ctypes.c_int
_PyBytes_Resize.argtypes = [ctypes.c_void_p, ctypes.c_ssize_t]
_Py_IncRef = ctypes.pythonapi.Py_IncRef
_Py_IncRef.argtypes = [ctypes.py_object]
_Py_DecRef = ctypes.pythonapi.Py_DecRef
_Py_DecRef.argtypes = [ctypes.py_object]


def _decode_exact(lib, src_p, n, expected, slack, max_window,
                  ignore_checksum):
    """Decode a pre-sized stream straight into its final bytes object,
    then shrink the slack off in place. The resize requires the object's
    refcount to be EXACTLY 1, so every reference but the box is dropped
    before the call (a helper that received the object as a parameter
    would keep a caller-frame reference alive and trip the check)."""
    obj = _PyBytes_FromStringAndSize(None, expected + slack)
    ptr = _PyBytes_AsString(obj)
    r = lib.ct_zstd_decode_all(src_p, n, ctypes.c_char_p(ptr),
                               expected + slack, max_window,
                               1 if ignore_checksum else 0)
    if r != expected:  # scan/decode disagree: let Python diagnose
        return None
    if r == expected + slack:
        return obj  # nothing to shrink (cannot happen today; safe anyway)
    # manual ownership transfer: hold the object by raw address only, so
    # the resize's realloc move cannot leave a stale managed reference
    cell = (ctypes.c_void_p * 1)(id(obj))
    _Py_IncRef(obj)  # the cell's manual reference
    obj = ptr = None  # noqa: F841 — refcount now exactly 1 (the cell)
    if _PyBytes_Resize(cell, r) != 0:
        ctypes.pythonapi.PyErr_Clear()  # resize consumed the object
        return None
    out = ctypes.cast(cell[0], ctypes.py_object).value  # increfs -> 2
    _Py_DecRef(out)  # release the cell's manual reference -> 1
    return out


def _in_scratch(data, pos: int):
    """Copy data[pos:] + 16 zero-slack bytes into a reused thread-local
    buffer; returns (c_char_p, body_len). Avoids the per-call bytes
    concatenation (allocation + copy) that dominated small-frame decode
    (thread-local: decode_concurrent calls this from worker threads)."""
    n = len(data) - pos
    buf = getattr(_tls, "inbuf", None)
    if buf is None or buf.shape[0] < n + 16:
        buf = np.empty(max(n + 16, 1 << 16), np.uint8)
        if buf.shape[0] <= (16 << 20):  # retention cap, like outbuf
            _tls.inbuf = buf
    buf[:n] = np.frombuffer(data, np.uint8, n, pos)
    buf[n : n + 16] = 0
    return buf.ctypes.data_as(ctypes.c_char_p), n


def _in_direct(data, pos: int):
    """Zero-copy input pointer for bytes. The whole-stream/frame decoders
    are bounds-exact since the r4 ASAN hardening (BitRev br_load staged
    tails) — no padding slack needed, so skip _in_scratch's input copy
    (it cost ~10-20% on large frames). Non-bytes (memoryview/bytearray)
    fall back to the scratch copy."""
    if type(data) is bytes:
        base = ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p).value
        return ctypes.c_char_p(base + pos), len(data) - pos
    return _in_scratch(data, pos)


def _lib():
    global _proto_done
    from compress_tpu import _native

    lib = _native.raw()
    if lib is None:
        return None
    if not hasattr(lib, "ct_zstd_decode_block"):
        return None
    if not _proto_done:
        lib.ct_zstd_state_new.restype = ctypes.c_void_p
        lib.ct_zstd_state_new.argtypes = [ctypes.c_longlong]
        lib.ct_zstd_state_free.argtypes = [ctypes.c_void_p]
        lib.ct_zstd_state_append.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong]
        lib.ct_zstd_decode_block.restype = ctypes.c_longlong
        lib.ct_zstd_decode_block.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong]
        if hasattr(lib, "ct_zstd_decode_frame"):
            lib.ct_zstd_decode_frame.restype = ctypes.c_longlong
            lib.ct_zstd_decode_frame.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong]
        if hasattr(lib, "ct_zstd_decode_all"):
            lib.ct_zstd_decode_all.restype = ctypes.c_longlong
            lib.ct_zstd_decode_all.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.c_longlong, ctypes.c_int]
        if hasattr(lib, "ct_zstd_scan_size"):
            lib.ct_zstd_scan_size.restype = ctypes.c_longlong
            lib.ct_zstd_scan_size.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong]
        _proto_done = True
    return lib


def decode_all(data, max_size: int, max_window: int,
               ignore_checksum: bool):
    """Whole-stream happy-path decode: frame headers, skippables, bodies
    and checksums in ONE native call (reference Decoder.DecodeAll role,
    zstd/decoder.go:319). Returns bytes, or None when the stream needs
    the Python path (dict frames, over-limit windows, corrupt input —
    which then produces the precise error)."""
    lib = _lib()
    if lib is None or not hasattr(lib, "ct_zstd_decode_all"):
        return None
    src_p, n = _in_direct(data, 0)
    slack = (1 << 17) + 64
    # exact-size fast path: when every frame declares its content size, a
    # headers-only native pre-scan sizes the stream and we decode straight
    # into the final bytes object (skips the output-sized tobytes copy)
    if hasattr(lib, "ct_zstd_scan_size"):
        expected = lib.ct_zstd_scan_size(src_p, n)
        if 0 <= expected <= max_size:
            return _decode_exact(lib, src_p, n, expected, slack,
                                 int(max_window), ignore_checksum)
    guess = max(4 * n, 1 << 20)
    keep = 16 << 20  # retained-scratch cap: huge decodes get a one-off
    while True:
        cap = min(guess, max_size) + slack
        dst = getattr(_tls, "outbuf", None)  # reused scratch, capped
        if dst is None or dst.shape[0] < cap:
            dst = np.empty(cap, np.uint8)
            if cap <= keep:
                _tls.outbuf = dst
        cap = dst.shape[0]
        r = lib.ct_zstd_decode_all(src_p, n,
                                   dst.ctypes.data_as(ctypes.c_char_p),
                                   cap, int(max_window),
                                   1 if ignore_checksum else 0)
        if r == -3:  # E_SPACE: grow once per power of 4, bounded
            if guess >= max_size:
                return None
            guess = min(guess * 4, max_size)
            continue
        if r < 0 or r > max_size:
            return None
        return dst[:r].tobytes()


def decode_frame_body(data: bytes, pos: int, window_size: int,
                      max_out: int, expected: int | None = None):
    """Decode the block sequence of one frame starting at `pos`.

    Returns (frame_bytes, new_pos) with new_pos at the checksum field, or
    None when the native path is unavailable or rejects the input.

    Fast path: the whole block loop runs in ONE native call with the
    output buffer as the history arena (reference: framedec.go:334
    history-as-output) — no per-block Python dispatch, no window copies.
    `expected` (frame_content_size when known) sizes the buffer; E_SPACE
    grows it and retries."""
    lib = _lib()
    if lib is None or window_size > (64 << 20):
        return None
    if hasattr(lib, "ct_zstd_decode_frame"):
        body_p, body_n = _in_direct(data, pos)
        guess = expected if expected is not None else max(
            4 * body_n, 1 << 20)
        slack = (1 << 17) + 64
        while True:
            cap = min(guess, max_out) + slack
            dst = np.empty(cap, np.uint8)  # no zero-fill
            consumed = ctypes.c_longlong(0)
            r = lib.ct_zstd_decode_frame(
                body_p, body_n,
                dst.ctypes.data_as(ctypes.c_char_p), cap,
                ctypes.byref(consumed), int(window_size))
            if r == -3:  # E_SPACE
                if expected is not None:
                    # the header declared a content size and the blocks
                    # overflow it: the frame lies — fail to the Python
                    # decoder for the precise error instead of growing
                    # toward max_out (r3 review #1: hostile frames could
                    # spin/allocate here forever)
                    return None
                if guess < max_out:
                    guess = min(max(guess * 4, 1 << 20), max_out)
                    continue
            if r < 0:
                return None
            if r > max_out:
                return None
            return dst[:r].tobytes(), pos + consumed.value
    st = lib.ct_zstd_state_new(window_size)
    if not st:
        return None
    dst = ctypes.create_string_buffer((1 << 17) + 64)
    out = bytearray()
    try:
        while True:
            if pos + 3 > len(data):
                return None
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:
                if pos + bsize > len(data):
                    return None
                blk = data[pos : pos + bsize]
                lib.ct_zstd_state_append(st, blk, len(blk))
                out += blk
                pos += bsize
            elif btype == 1:
                if pos >= len(data) or bsize > B.MAX_BLOCK_SIZE:
                    return None
                blk = bytes([data[pos]]) * bsize
                lib.ct_zstd_state_append(st, blk, len(blk))
                out += blk
                pos += 1
            elif btype == 2:
                if bsize > B.MAX_BLOCK_SIZE or pos + bsize > len(data):
                    return None
                body = data[pos : pos + bsize] + b"\x00" * 16
                r = lib.ct_zstd_decode_block(st, body, bsize, dst,
                                             len(dst))
                if r < 0:
                    return None
                out += dst.raw[:r]
                pos += bsize
            else:
                return None
            if len(out) > max_out:
                return None
            if last:
                return bytes(out), pos
    finally:
        lib.ct_zstd_state_free(st)
