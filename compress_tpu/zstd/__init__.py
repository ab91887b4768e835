"""zstd — full frame codec (RFC 8878), TPU-framework host path.

Reference parity targets (SURVEY.md §2.1): Encoder/Decoder with EncodeAll/
DecodeAll semantics, levels fastest/default/better/best, streaming, dicts,
concurrent job engine (in compress_tpu.parallel). This module: the
synchronous block/frame codec. Cross-validated bit-exactly against libzstd
(the `zstandard` wheel) in tests — a stronger oracle than the Go reference
itself, which only promises format compatibility.
"""

from __future__ import annotations

import numpy as np

from compress_tpu.utils.xxhash64 import xxh64
from compress_tpu.zstd import block as B
from compress_tpu.zstd import frame as F
from compress_tpu.zstd.block import BlockError, History
from compress_tpu.zstd.frame import FrameError, Header, parse_frame_header

SpeedFastest = 1
SpeedDefault = 2
SpeedBetter = 3
SpeedBest = 4

MAX_DECODED_SIZE = 64 << 30  # reference decoder_options.go:41


class ZstdError(ValueError):
    pass


def decompress(data, max_size: int = MAX_DECODED_SIZE,
               max_window: int = 1 << 31, dicts=None,
               ignore_checksum: bool = False) -> bytes:
    """Decode all frames in data (reference: Decoder.DecodeAll).

    dicts: iterable of zstd.dict.Dict (or raw dict blobs) selected by the
    frame's dictionary ID (reference: WithDecoderDicts)."""
    from compress_tpu.zstd.dict import Dict, load_dict

    dict_map = {}
    for d in dicts or ():
        if not isinstance(d, Dict):
            d = load_dict(d)
        dict_map[d.id] = d
    data = bytes(data)
    # whole-stream native happy path: headers + bodies + checksums in one
    # call; any rejection re-runs the per-frame path below for the exact
    # error (and for dictionary frames)
    if data and not dict_map:
        from compress_tpu.zstd import native_dec

        res = native_dec.decode_all(data, max_size, max_window,
                                    ignore_checksum)
        if res is not None:
            return res
    pos = 0
    out_all = bytearray()
    # empty input decodes to empty output (reference: DecodeAll hits EOF
    # before any frame and returns dst unchanged)
    while pos < len(data):
        try:
            h = parse_frame_header(data, pos)
        except FrameError as e:
            raise ZstdError(str(e)) from e
        if h.skippable:
            pos += h.header_size + h.skippable_size
            if pos > len(data):
                raise ZstdError("skippable frame overruns input")
            continue
        pos += h.header_size
        if h.window_size > max_window:
            raise ZstdError("window size exceeds limit")
        if h.frame_content_size is not None and h.frame_content_size > max_size:
            raise ZstdError("decoded size exceeds limit")
        # native fast path (dictionary-less frames); any rejection falls
        # back to the pure-Python decoder below
        if not h.dict_id and not dict_map:
            from compress_tpu.zstd import native_dec
            from compress_tpu.utils.debuglog import dbg

            res = native_dec.decode_frame_body(
                data, pos, max(h.window_size, 1024), max_size - len(out_all),
                expected=h.frame_content_size)
            dbg("zstd", "decompress frame@%d window=%d native=%s",
                pos, h.window_size, res is not None)
            if res is not None:
                frame_out, pos = res
                if (h.frame_content_size is not None
                        and len(frame_out) != h.frame_content_size):
                    raise ZstdError("frame content size mismatch")
                if h.has_checksum:
                    if pos + 4 > len(data):
                        raise ZstdError("truncated checksum")
                    if not ignore_checksum:
                        want = int.from_bytes(data[pos : pos + 4], "little")
                        got = xxh64(frame_out) & 0xFFFFFFFF
                        if want != got:
                            raise ZstdError("checksum mismatch")
                    pos += 4
                if pos == len(data) and not out_all:
                    return frame_out  # single frame: skip the join copy
                out_all += frame_out
                continue

        hist = History(window_size=max(h.window_size, 1024))
        if h.dict_id:
            d = dict_map.get(h.dict_id)
            if d is None:
                raise ZstdError(f"frame needs dictionary id {h.dict_id}")
            hist.window = bytearray(d.content)
            hist.rep_offsets = d.reps
            hist.huf_table = d.huf
            hist.t_ll, hist.t_of, hist.t_ml = d.t_ll, d.t_of, d.t_ml
        elif dict_map and 0 in dict_map:
            d = dict_map[0]
            hist.window = bytearray(d.content)
            hist.rep_offsets = d.reps
        frame_out = bytearray()
        digest_parts = []
        while True:
            if pos + 3 > len(data):
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            max_out = min(B.MAX_BLOCK_SIZE, h.window_size or B.MAX_BLOCK_SIZE)
            if h.frame_content_size is not None:
                max_out = min(max(max_out, 1), B.MAX_BLOCK_SIZE)
            if btype == B.BLOCK_RAW:
                if pos + bsize > len(data):
                    raise ZstdError("truncated raw block")
                out = data[pos : pos + bsize]
                pos += bsize
            elif btype == B.BLOCK_RLE:
                if pos >= len(data):
                    raise ZstdError("truncated RLE block")
                if bsize > B.MAX_BLOCK_SIZE:
                    raise ZstdError("RLE block too large")
                out = bytes([data[pos]]) * bsize
                pos += 1
            elif btype == B.BLOCK_COMPRESSED:
                if bsize > B.MAX_BLOCK_SIZE:
                    raise ZstdError("compressed block too large")
                if pos + bsize > len(data):
                    raise ZstdError("truncated compressed block")
                try:
                    out = B.decode_block(data[pos : pos + bsize], hist,
                                         B.MAX_BLOCK_SIZE)
                except (ValueError, IndexError) as e:
                    raise ZstdError(f"block decode failed: {e}") from e
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            # RFC 8878 Block_Maximum_Size = min(Window_Size, 128 KB):
            # libzstd rejects oversized blocks (found by the reference's
            # decode fuzz corpus — we were lenient here)
            if len(out) > max_out:
                raise ZstdError("block exceeds window maximum")
            hist.append(out)
            frame_out += out
            if len(out_all) + len(frame_out) > max_size:
                raise ZstdError("decoded size exceeds limit")
            if last:
                break
        if h.frame_content_size is not None and len(frame_out) != h.frame_content_size:
            raise ZstdError("frame content size mismatch")
        if h.has_checksum:
            if pos + 4 > len(data):
                raise ZstdError("truncated checksum")
            if not ignore_checksum:
                want = int.from_bytes(data[pos : pos + 4], "little")
                got = xxh64(bytes(frame_out)) & 0xFFFFFFFF
                if want != got:
                    raise ZstdError("checksum mismatch")
            pos += 4
        out_all += frame_out
    return bytes(out_all)


def _frame_extent(data: bytes, pos: int):
    """End offset (past checksum) of the frame at pos, plus skippable flag.

    A cheap structural walk — 3 header bytes per block, no decoding
    (reference role: Decoder frame splitting for DecodeAllParallel)."""
    try:
        h = parse_frame_header(data, pos)
    except FrameError as e:
        raise ZstdError(str(e)) from e
    if h.skippable:
        end = pos + h.header_size + h.skippable_size
        if end > len(data):
            raise ZstdError("skippable frame overruns input")
        return end, True
    p = pos + h.header_size
    while True:
        if p + 3 > len(data):
            raise ZstdError("truncated block header")
        bh = int.from_bytes(data[p : p + 3], "little")
        p += 3
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ZstdError("reserved block type")
        p += 1 if btype == B.BLOCK_RLE else bsize
        if p > len(data):
            raise ZstdError("truncated block")
        if bh & 1:
            break
    if h.has_checksum:
        p += 4
        if p > len(data):
            raise ZstdError("truncated checksum")
    return p, False


def split_frames(data) -> list:
    """Byte spans [(start, end), ...] of the non-skippable frames in data."""
    data = bytes(data)
    spans = []
    pos = 0
    while pos < len(data):
        end, skippable = _frame_extent(data, pos)
        if not skippable:
            spans.append((pos, end))
        pos = end
    return spans


def decode_concurrent(data, workers: int = 4,
                      max_size: int = MAX_DECODED_SIZE,
                      max_window: int = 1 << 31,
                      ignore_checksum: bool = False) -> bytes:
    """Decode a multi-frame stream with a thread pool, one frame per task
    (reference: Decoder.DecodeAll used concurrently — the
    BenchmarkDecoder_DecodeAllParallel pattern; the native block decoder
    releases the GIL so frames decode in true parallel)."""
    from concurrent.futures import ThreadPoolExecutor

    data = bytes(data)
    spans = split_frames(data)
    if len(spans) <= 1 or workers <= 1:
        return decompress(data, max_size=max_size, max_window=max_window,
                          ignore_checksum=ignore_checksum)

    def one(span):
        lo, hi = span
        return decompress(data[lo:hi], max_size=max_size,
                          max_window=max_window,
                          ignore_checksum=ignore_checksum)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        parts = list(ex.map(one, spans))
    total = sum(len(p) for p in parts)
    if total > max_size:
        raise ZstdError("decoded size exceeds limit")
    return b"".join(parts)


# encoder lives in encoder.py; re-exported here
from compress_tpu.zstd.encoder import compress, compress_concurrent  # noqa: E402

__all__ = [
    "compress", "compress_concurrent", "decompress", "decode_concurrent",
    "split_frames", "Header", "parse_frame_header",
    "ZstdError", "FrameError", "BlockError", "History",
    "SpeedFastest", "SpeedDefault", "SpeedBetter", "SpeedBest",
    "MAX_DECODED_SIZE", "compress_accel", "decompress_accel",
    "max_encoded_size", "encode_to", "decode_to",
]


def compress_accel(data, level: int = 1, max_rounds: int = 4,
                   multi_block: bool = False) -> bytes:
    """Encode with the device-decode accel sidecar prepended (r3;
    zstd/accel.py). The result is a standard zstd stream.
    multi_block=True emits one frame of 64 KiB blocks with cross-block
    matches (better ratio; carried-history device decode)."""
    from compress_tpu.zstd.accel import compress_accel as _ca

    return _ca(data, level=level, max_rounds=max_rounds,
               multi_block=multi_block)


def decompress_accel(blob, mesh=None) -> bytes:
    """Decode a compress_accel stream with the batched device decoder
    (zero per-symbol host work for sidecar frames; host fallback
    otherwise). mesh: optional 'data'-axis Mesh for multi-chip decode."""
    from compress_tpu.zstd.accel import split_stream_accel
    from compress_tpu.zstd.device_dec import decompress_frames_device

    items = split_stream_accel(blob)
    if not items:
        return b""
    return b"".join(decompress_frames_device(items, mesh=mesh))


_simple_cache = {}


def encode_to(dst, src, level: int = 1) -> bytes:
    """Append one zstd frame of src to dst (reference: zstd.EncodeTo,
    simple_go124.go — package-cached encoder)."""
    out = (bytearray(dst) if dst is not None else bytearray())
    out += compress(src, level=level)
    return bytes(out)


def decode_to(dst, src, max_size: int = MAX_DECODED_SIZE) -> bytes:
    """Append the decoded frames of src to dst (reference: zstd.DecodeTo)."""
    out = (bytearray(dst) if dst is not None else bytearray())
    out += decompress(src, max_size=max_size)
    return bytes(out)


def max_encoded_size(n: int) -> int:
    """Worst-case one-frame output size for an n-byte input (reference:
    Encoder.MaxEncodedSize, zstd/encoder.go:843). Bound: frame header
    (magic 4 + FHD 1 + window 1 + FCS <= 8) + ceil(n / 128 KiB) raw
    blocks with 3-byte headers (>= 1 block) + 4-byte checksum."""
    if n < 0:
        raise ValueError("negative size")
    blocks = max((n + (1 << 17) - 1) >> 17, 1)
    return n + 14 + 3 * blocks + 4
