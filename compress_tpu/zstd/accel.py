"""Encoder-emitted checkpoint side channel for the batched device decoder.

The r2 device decoder was bit-exact but derived every checkpoint from
per-symbol HOST walks (device_dec._hwalk / seqdev.seq_accel) — the host
did the decode work and the device re-did it. This module closes VERDICT
r2 missing #1: at ENCODE time, one native walk of the produced frame
(`ct_zstd_build_sidecar`, zstd_dec.cpp) serializes the accel tensors —

  - huff0 per-stream bit checkpoints every 32 symbols,
  - sequence checkpoints (bit offset + 3 FSE states + resolved rep
    offsets) every 8 sequences,
  - the round-annotated execute plan (ops/execute.plan_block_ops ported
    to C++),

into a SKIPPABLE frame written before the content frame. Any zstd
decoder ignores it (RFC 8878 skippable frames); our device decoder
consumes it with ZERO per-symbol host work. The format pays bytes for
decode parallelism exactly like huff0's 4X jump table (reference
huff0/compress.go:269).

Sidecar payload (little-endian):
  'CTA1' u16 n_blocks, then per block:
    u8 flags (bit0 = device-eligible, bit1 = seq checkpoints present)
    u8 lit_kind (0 = 4X compressed, 1 = raw, 2 = RLE, 3 = 1X compressed)
    u32 regen, u32 n_seqs, u32 total_out
    k x { u16 n_chunks; u32 cks[n_chunks] }   (k = 4, 1, or 0 streams)
    [flags bit1] u16 seq_nch; seq_nch x { u32 bitpos; u16 s_ll, s_of,
                             s_ml; u32 r1, r2, r3 }
    u32 n_pieces; u8 n_rounds; i32 src[n]; u8 len[n]; u8 round[n]
"""

from __future__ import annotations

import ctypes

import numpy as np

from compress_tpu import _native
from compress_tpu.zstd import frame as F

SKIP_MAGIC = 0x184D2A50  # first of the 16 skippable magics; ours uses +0xA
ACCEL_MAGIC = b"CTA3"


def _lib():
    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_zstd_build_sidecar"):
        return None
    if not getattr(lib, "_accel_proto", False):
        lib.ct_zstd_build_sidecar.restype = ctypes.c_longlong
        lib.ct_zstd_build_sidecar.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_longlong]
        lib._accel_proto = True
    return lib


def build_sidecar(frame: bytes, max_rounds: int = 4,
                  seq_cks: bool = False,
                  hist_blocks: int = 0) -> bytes | None:
    """Build the accel sidecar (as a complete skippable frame) for one
    zstd frame, or None when the frame shape is not device-eligible /
    native is unavailable. Multi-block frames are eligible when every
    non-final block decodes to exactly 64 KiB and all match offsets fit
    hist_blocks*64KiB of history (the device history tensor). seq_cks=True
    also embeds the per-8-sequence checkpoint records (compact/validation
    channel; the plan-driven decode path does not need them)."""
    lib = _lib()
    if lib is None:
        return None
    h = F.parse_frame_header(frame)
    body = frame[h.header_size :] + b"\x00" * 16
    cap = 16 * len(frame) + (1 << 16)
    oarr, out = _native.out_buf(cap)
    opts = 1 if seq_cks else 0
    r = lib.ct_zstd_build_sidecar(body, len(body) - 16, int(max_rounds),
                                  opts, int(hist_blocks), out, cap)
    while r == -3:  # E_SPACE
        cap *= 4
        oarr, out = _native.out_buf(cap)
        r = lib.ct_zstd_build_sidecar(body, len(body) - 16, int(max_rounds),
                                      opts, int(hist_blocks), out, cap)
    if r <= 0:
        return None
    payload = oarr[:r].tobytes()
    if not (payload[8] & 1):  # first block's flags: not eligible
        return None
    # the sidecar pays format bytes for decode parallelism; s2-compress
    # the payload itself (checkpoints/pieces are highly regular) to cut
    # the tax roughly in half — 'CTA2' marks a compressed payload
    try:
        from compress_tpu import s2 as _s2

        packed = b"CTA2" + _s2.encode(payload)
        if len(packed) < len(payload):
            payload = packed
    except Exception:  # noqa: BLE001 — plain payload stays valid
        pass
    # integrity: a corrupt sidecar must degrade to host decode, never
    # silently mis-plan — CRC-32C over the payload ('CTAC' wrapper)
    from compress_tpu.utils.crc import crc32c

    payload = (b"CTAC" + (crc32c(payload) & 0xFFFFFFFF).to_bytes(4, "little")
               + payload)
    # skippable frame magic 0x184D2A5A (nibble A = ours by convention)
    return ((SKIP_MAGIC | 0xA).to_bytes(4, "little")
            + len(payload).to_bytes(4, "little") + payload)


SEG = 1 << 16  # device arena bound: one 64 KiB block per execute step


def _compress_frame_bs(data: bytes, level: int, block_log: int,
                       max_window: int) -> bytes | None:
    """One frame with an explicit block size and window cap (native)."""
    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_zstd_compress_frame_bs"):
        return None
    if not getattr(lib, "_accel_fbs", False):
        lib.ct_zstd_compress_frame_bs.restype = ctypes.c_longlong
        lib.ct_zstd_compress_frame_bs.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p,
            ctypes.c_longlong, ctypes.c_int, ctypes.c_ulonglong,
            ctypes.c_int, ctypes.c_int, ctypes.c_longlong]
        lib._accel_fbs = True
    cap = len(data) + len(data) // 2 + (1 << 16)
    oarr, out = _native.out_buf(cap)
    r = lib.ct_zstd_compress_frame_bs(data, len(data), out, cap, 0, 0,
                                      int(level), int(block_log),
                                      int(max_window))
    if r <= 0:
        return None
    return oarr[:r].tobytes()


def compress_accel(data, level: int = 1, max_rounds: int = 4,
                   multi_block: bool = False,
                   hist_blocks: int = 8) -> bytes:
    """One-shot encode with the device-decode sidecar prepended. The
    result is a standard zstd stream (sidecars ride skippable frames).

    Default mode segments inputs over 64 KiB into independent
    single-block frames, each with its own sidecar. multi_block=True
    instead emits ONE frame of 64 KiB blocks whose matches reach back
    hist_blocks*64 KiB (the device keeps that much history in a carried
    tensor — better ratio than segment independence, same libzstd
    compatibility)."""
    from compress_tpu.zstd.encoder import compress

    data = bytes(data)
    if multi_block and len(data) > SEG:
        # a frame of n blocks can reach back at most n-1 blocks: don't
        # make the device carry (and shift) history it can never read
        n_blocks = -(-len(data) // SEG)
        hist_blocks = max(1, min(int(hist_blocks), n_blocks - 1))
        frame = _compress_frame_bs(data, level, 16,
                                   int(hist_blocks) << 16)
        if frame is not None:
            side = build_sidecar(frame, max_rounds,
                                 hist_blocks=hist_blocks)
            if side is not None:
                return side + frame
        # native unavailable or shape fell out: segmented fallback
    if len(data) <= SEG:
        frame = compress(data, level=level)
        side = build_sidecar(frame, max_rounds)
        return (side or b"") + frame
    out = bytearray()
    for lo in range(0, len(data), SEG):
        frame = compress(data[lo : lo + SEG], level=level)
        side = build_sidecar(frame, max_rounds)
        out += (side or b"") + frame
    return bytes(out)


def split_stream_accel(blob: bytes):
    """Split a compress_accel stream into per-frame (sidecar?, frame)
    blobs suitable for decompress_frames_device. Uses the cheap
    structural frame walk (no decoding)."""
    from compress_tpu.zstd import _frame_extent

    blob = bytes(blob)
    items = []
    pos = 0
    cur_start = 0
    while pos < len(blob):
        end, skippable = _frame_extent(blob, pos)
        if skippable:
            # skippables (sidecars or foreign) attach to the NEXT frame
            pos = end
            continue
        items.append(blob[cur_start:end])
        cur_start = end
        pos = end
    if cur_start < len(blob):
        # trailing skippables: attach to the last item (decode ignores
        # them) so no item is skippable-only
        if items:
            items[-1] = items[-1] + blob[cur_start:]
        else:
            items.append(blob[cur_start:])
    return items


def split_sidecar(blob: bytes):
    """Split a ([skippables...], frame...) stream. Strips ALL leading
    skippable frames (foreign ones are ignored); returns
    (sidecar_payload | None, rest)."""
    found = None
    pos = 0
    while len(blob) - pos >= 8:
        magic = int.from_bytes(blob[pos : pos + 4], "little")
        if (magic & 0xFFFFFFF0) != SKIP_MAGIC:
            break
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        payload = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size
        if payload[:4] == b"CTAC":  # crc-wrapped sidecar
            from compress_tpu.utils.crc import crc32c

            want = int.from_bytes(payload[4:8], "little")
            payload = payload[8:]
            if (crc32c(payload) & 0xFFFFFFFF) != want:
                continue  # corrupt: ignore, keep scanning
        if payload[:4] == b"CTA2":  # s2-compressed sidecar
            from compress_tpu import s2 as _s2

            try:
                payload = _s2.decode(payload[4:])
            except Exception:  # noqa: BLE001 — treat as foreign
                continue
        if payload[:4] == ACCEL_MAGIC:
            found = payload
    return found, blob[pos:]


class BlockAccel:
    """Parsed per-block accel arrays (all numpy, no per-symbol work)."""

    __slots__ = ("lit_kind", "regen", "n_seqs", "total_out", "lit_cks",
                 "seq_bits", "seq_states", "seq_reps", "src", "length",
                 "round", "n_rounds")


def parse_sidecar(payload: bytes):
    """Parse the sidecar payload into (hist_blocks, BlockAccel list) —
    None entries for ineligible blocks. Pure numpy frombuffer slicing —
    zero per-symbol host work by construction."""
    if payload[:4] != ACCEL_MAGIC:
        raise ValueError("bad sidecar magic")
    n_blocks = int.from_bytes(payload[4:6], "little")
    hist_blocks = int.from_bytes(payload[6:8], "little")
    pos = 8
    out = []
    for _ in range(n_blocks):
        flags = payload[pos]
        pos += 1
        if not (flags & 1):
            out.append(None)
            continue
        a = BlockAccel()
        a.lit_kind = payload[pos]
        pos += 1
        a.regen, a.n_seqs, a.total_out = np.frombuffer(
            payload, np.uint32, 3, pos)
        pos += 12
        a.lit_cks = []
        n_streams = {0: 4, 3: 1}.get(a.lit_kind, 0)
        for _q in range(n_streams):
            nch = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
            a.lit_cks.append(np.frombuffer(payload, np.uint32, nch, pos)
                             .astype(np.int64))
            pos += 4 * nch
        if flags & 2:  # optional seq-checkpoint section
            seq_nch = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
            rec = np.frombuffer(payload, np.uint8, seq_nch * 22, pos
                                ).reshape(seq_nch, 22)
            pos += 22 * seq_nch
            a.seq_bits = rec[:, 0:4].copy().view(np.uint32)[:, 0].astype(
                np.int64)
            st = rec[:, 4:10].copy().view(np.uint16)
            a.seq_states = st.astype(np.int32)        # (nch, 3) ll, of, ml
            a.seq_reps = rec[:, 10:22].copy().view(np.uint32).astype(
                np.int64)
        else:
            a.seq_bits = np.zeros(0, np.int64)
            a.seq_states = np.zeros((0, 3), np.int32)
            a.seq_reps = np.zeros((0, 3), np.int64)
        n_pieces = int.from_bytes(payload[pos : pos + 4], "little")
        pos += 4
        a.n_rounds = payload[pos]
        pos += 1
        a.src = np.frombuffer(payload, np.int32, n_pieces, pos).copy()
        pos += 4 * n_pieces
        a.length = np.frombuffer(payload, np.uint8, n_pieces, pos
                                 ).astype(np.int32)
        pos += n_pieces
        a.round = np.frombuffer(payload, np.uint8, n_pieces, pos
                                ).astype(np.int32)
        pos += n_pieces
        out.append(a)
    return hist_blocks, out


def accel_plan(a: BlockAccel, hist_blocks: int = 0):
    """BlockAccel -> ops/execute pack_plans-compatible plan dict. dst is
    the exclusive cumsum of piece lengths (pieces cover the output in
    order, exactly once). Sources at or above HIST_BASE read the carried
    history tensor (multi-block frames). Raises ValueError on
    inconsistent (hostile / corrupt) sidecars — callers fall back to
    host decode."""
    from compress_tpu.ops.execute import ARENA_ROWS, HIST_BASE, OUT_BASE

    total = int(a.length.sum())
    if total != int(a.total_out) or total > (1 << 16):
        raise ValueError("sidecar plan length mismatch")
    # pieces must fit their dst row (the kernel masks per 128-lane row)
    dst_rel = np.concatenate([[0], np.cumsum(a.length[:-1],
                                             dtype=np.int64)])
    if len(a.length) and int(((dst_rel & 127) + a.length).max()) > 128:
        raise ValueError("sidecar plan piece crosses a row boundary")
    hist_top = HIST_BASE + (int(hist_blocks) << 16)
    if int(a.n_rounds) < 1 or int(a.n_rounds) > 64:
        raise ValueError("sidecar plan rounds out of range")
    if len(a.src):
        s = a.src.astype(np.int64)
        is_hist = s >= HIST_BASE
        bad = (s < 0) \
            | (~is_hist & (s + a.length > ARENA_ROWS * 128)) \
            | (is_hist & (s + a.length > hist_top))
        if bool(bad.any()):
            raise ValueError("sidecar plan source out of range")
        # history sources are fully resolved at block start: round 0 only
        if bool((is_hist & (a.round != 0)).any()):
            raise ValueError("sidecar history piece beyond round 0")
        if bool(((a.round < 0) | (a.round >= int(a.n_rounds))).any()):
            raise ValueError("sidecar plan piece round out of range")
    dst = OUT_BASE + np.concatenate(
        [[0], np.cumsum(a.length[:-1], dtype=np.int64)]).astype(np.int32)
    return {
        "src": a.src,
        "dst": dst,
        "len": a.length,
        "round": a.round,
        "n_rounds": int(a.n_rounds),
    }
