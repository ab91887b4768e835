"""zstd encoder: greedy matcher ladder + block assembly (RFC 8878).

Reference parity: zstd/enc_fast.go..enc_best.go (the level ladder),
zstd/blockenc.go (literals header, table choice "chooseComp", interleaved
sequence stream), zstd/encoder.go EncodeAll (SURVEY.md §3.1).

The matcher is the same "repeat-aware greedy" family as our S2 encoder, with
zstd-grade extensions per level: bigger tables, second candidate probe, and
rep-offset preference. Output is validated bit-exactly by libzstd in tests.
"""

from __future__ import annotations

import numpy as np

from compress_tpu import huff0
from compress_tpu.fse import core as fse_core
from compress_tpu.utils.xxhash64 import xxh64
from compress_tpu.zstd import frame as F
from compress_tpu.zstd import seqs as S

_MUL = 0x9E3779B185EBCA87
BLOCK_SIZE = 1 << 17  # 128KB


# ---------------------------------------------------------------------------
# Matcher (host reference path)
# ---------------------------------------------------------------------------


def _hashes(buf: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(buf)
    b8 = np.concatenate([buf, np.zeros(8, np.uint8)])
    v32 = (
        b8[:n].astype(np.uint64)
        | (b8[1 : n + 1].astype(np.uint64) << np.uint64(8))
        | (b8[2 : n + 2].astype(np.uint64) << np.uint64(16))
        | (b8[3 : n + 3].astype(np.uint64) << np.uint64(24))
    )
    h = ((v32 << np.uint64(32)) * np.uint64(_MUL)) >> np.uint64(64 - bits)
    return h.astype(np.int64), v32.astype(np.uint32)


_LEVEL_PARAMS = {
    1: dict(bits=16, insert=2, lazy=False),   # fastest
    2: dict(bits=17, insert=4, lazy=False),   # default
    3: dict(bits=18, insert=6, lazy=True),    # better
    4: dict(bits=19, insert=8, lazy=True),    # best (v1: deeper greedy)
}


class Matcher:
    """Greedy repeat-aware matcher with shared history across blocks.

    Per-block sequences never span block boundaries (matches are capped at
    the block end); candidates may reference any earlier position (the
    decoder's history window)."""

    def __init__(self, src: bytes, level: int = 2,
                 window: int | None = None):
        self.src = src
        self.buf = np.frombuffer(src, dtype=np.uint8)
        p = _LEVEL_PARAMS.get(level, _LEVEL_PARAMS[2])
        n = len(src)
        bits = 8
        while (1 << bits) < n and bits < p["bits"]:
            bits += 1
        self.bits = bits
        self.insert = p["insert"]
        self.window = window  # None = unbounded (window covers the input)
        if n >= 4:
            self.hashes, self.v32 = _hashes(self.buf, bits)
        self.table = np.full(1 << bits, -1, dtype=np.int64)
        self.r1 = 0  # last emitted offset (repeat probe)

    def next_block(self, start: int, end: int):
        """Sequences covering src[start:end]; returns (lls, mls, offs, tail)."""
        src, buf = self.src, self.buf
        out_ll, out_ml, out_off = [], [], []
        if end - start < 16:
            return (np.array([], np.int64),) * 3 + (src[start:end],)
        hashes, v32, table = self.hashes, self.v32, self.table
        s = max(start, 1)
        next_emit = start
        r1 = self.r1
        while True:
            while True:
                if s + 16 > end:
                    self.r1 = r1
                    return (
                        np.array(out_ll, np.int64),
                        np.array(out_ml, np.int64),
                        np.array(out_off, np.int64),
                        src[next_emit:end],
                    )
                h = int(hashes[s])
                c = int(table[h])
                table[h] = s
                if r1 > 0 and s - r1 >= 0 and v32[s] == v32[s - r1]:
                    cand = s - r1
                    break
                # c < s: after backward extension a short match can leave
                # the scan BEHIND a stale table entry (r3 flate fuzz)
                if 0 <= c < s and v32[c] == v32[s] and (
                        self.window is None or s - c <= self.window):
                    cand = c
                    break
                s += 1 + ((s - next_emit) >> 6)
            while s > next_emit and cand > 0 and src[s - 1] == src[cand - 1]:
                s -= 1
                cand -= 1
            length = 4 + _match_len(buf, cand + 4, s + 4, end - s - 4)
            out_ll.append(s - next_emit)
            out_ml.append(length)
            out_off.append(s - cand)
            r1 = s - cand
            s += length
            next_emit = s
            if s + 16 > end:
                self.r1 = r1
                return (
                    np.array(out_ll, np.int64),
                    np.array(out_ml, np.int64),
                    np.array(out_off, np.int64),
                    src[next_emit:end],
                )
            for d in range(1, self.insert + 1):
                if s - d > 0:
                    table[int(hashes[s - d])] = s - d


def _match_len(buf: np.ndarray, a: int, b: int, maxlen: int) -> int:
    if maxlen <= 0:
        return 0
    x = buf[a : a + maxlen]
    y = buf[b : b + maxlen]
    neq = np.nonzero(x != y)[0]
    return int(neq[0]) if neq.size else maxlen


# ---------------------------------------------------------------------------
# Offset-value conversion (rep-offset aware, mirrors decode-side updates)
# ---------------------------------------------------------------------------


def offsets_to_values(lls, offsets, reps=(1, 4, 8)):
    """Convert absolute offsets to zstd offset values, preferring rep codes."""
    r1, r2, r3 = reps
    vals = np.zeros(len(offsets), dtype=np.int64)
    for i in range(len(offsets)):
        off = int(offsets[i])
        ll = int(lls[i])
        if ll > 0:
            if off == r1:
                vals[i] = 1
            elif off == r2:
                vals[i] = 2
                r1, r2 = r2, r1
            elif off == r3:
                vals[i] = 3
                r1, r2, r3 = r3, r1, r2
            else:
                vals[i] = off + 3
                r1, r2, r3 = off, r1, r2
        else:
            if off == r2:
                vals[i] = 1
                r1, r2 = r2, r1
            elif off == r3:
                vals[i] = 2
                r1, r2, r3 = r3, r1, r2
            elif off == r1 - 1 and off > 0:
                vals[i] = 3
                r1, r2, r3 = off, r1, r2
            else:
                vals[i] = off + 3
                r1, r2, r3 = off, r1, r2
    return vals, (r1, r2, r3)


# ---------------------------------------------------------------------------
# Literals section encode
# ---------------------------------------------------------------------------


def _lit_header(lit_type: int, size_format_sizes, regen: int, comp: int | None) -> bytes:
    if lit_type in (0, 1):  # raw / RLE
        if regen < 32:
            return bytes([lit_type | (regen << 3)])
        if regen < 4096:
            v = lit_type | (1 << 2) | (regen << 4)
            return v.to_bytes(2, "little")
        v = lit_type | (3 << 2) | (regen << 4)
        return v.to_bytes(3, "little")
    raise ValueError("use _lit_header_comp")


def _lit_header_comp(lit_type: int, streams: int, regen: int, comp: int) -> bytes:
    if streams == 1:
        if regen >= 1 << 10 or comp >= 1 << 10:
            raise ValueError("1-stream sizes out of range")
        v = lit_type | (0 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if regen < 1 << 10 and comp < 1 << 10:
        v = lit_type | (1 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if regen < 1 << 14 and comp < 1 << 14:
        v = lit_type | (2 << 2) | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little")
    v = lit_type | (3 << 2) | (regen << 4) | (comp << 22)
    return v.to_bytes(5, "little")


def encode_literals(literals: bytes) -> bytes:
    """Best-of raw/RLE/huffman literals section."""
    n = len(literals)
    raw = _lit_header(0, None, n, None) + literals
    if n == 0:
        return raw
    if literals.count(literals[0]) == n:
        return _lit_header(1, None, n, None) + literals[:1]
    if n < 32:
        return raw
    buf = np.frombuffer(literals, dtype=np.uint8)
    hist = np.bincount(buf, minlength=256).astype(np.int64)
    try:
        nbits, max_bits = huff0.build_nbits(hist, huff0.MAX_TABLELOG)
    except (huff0.UseRLEError, ValueError):
        return raw
    codes = huff0.canonical_codes(nbits, max_bits)
    try:
        table = huff0.write_table(nbits, max_bits)
    except huff0.IncompressibleError:
        return raw
    use4 = n >= 256
    if use4:
        seg = (n + 3) // 4
        streams = []
        for k in range(4):
            part = buf[k * seg : min((k + 1) * seg, n)]
            streams.append(huff0._encode_stream(part, codes, nbits))
        if max(len(x) for x in streams[:3]) > 0xFFFF:
            return raw
        body = table + b"".join(len(x).to_bytes(2, "little") for x in streams[:3]) + b"".join(streams)
        try:
            hdr = _lit_header_comp(2, 4, n, len(body))
        except (ValueError, OverflowError):
            return raw
    else:
        stream = huff0._encode_stream(buf, codes, nbits)
        body = table + stream
        try:
            hdr = _lit_header_comp(2, 1, n, len(body))
        except (ValueError, OverflowError):
            return raw
    comp = hdr + body
    return comp if len(comp) < len(raw) else raw


# ---------------------------------------------------------------------------
# Sequences section encode
# ---------------------------------------------------------------------------


def _choose_table(codes: np.ndarray, which: str):
    """predefined vs RLE vs new FSE — pick the cheapest valid option.

    Returns (STable, mode, extra_bytes)."""
    predef_norm, predef_log, max_sym, max_log = {
        "ll": (S.PREDEF_LL_NORM, S.PREDEF_LL_LOG, S.MAX_LL_CODE, S.MAX_LL_LOG),
        "of": (S.PREDEF_OF_NORM, S.PREDEF_OF_LOG, S.MAX_OF_CODE, S.MAX_OF_LOG),
        "ml": (S.PREDEF_ML_NORM, S.PREDEF_ML_LOG, S.MAX_ML_CODE, S.MAX_ML_LOG),
    }[which]
    hist = np.bincount(codes.astype(np.int64), minlength=max_sym + 1).astype(np.int64)
    distinct = int((hist > 0).sum())
    if distinct == 1:
        sym = int(np.nonzero(hist)[0][0])
        return S.STable(None, 0, S.MODE_RLE, rle_symbol=sym), S.MODE_RLE, bytes([sym])

    # cost under predefined (if alphabet fits)
    max_code = int(codes.max())
    pre_ok = max_code < len(predef_norm)
    n = len(codes)

    def table_bits(norm, log):
        p = np.where(norm == -1, 0.5, norm.astype(np.float64))
        p = p / (1 << log)
        with np.errstate(divide="ignore"):
            bits = -np.log2(np.where(p > 0, p, 1.0))
        sel = hist[: len(norm)]
        return float((sel * bits[: len(sel)]).sum())

    best = None
    if pre_ok:
        best = (table_bits(predef_norm, predef_log) / 8, S.MODE_PREDEFINED,
                S.STable(predef_norm, predef_log, S.MODE_PREDEFINED), b"")
    if n >= 16:
        try:
            tl = fse_core.optimal_table_log(max_log, n, max_code, max_table_log=max_log)
            norm = fse_core.normalize_count(hist[: max_code + 1], tl, n, max_code)
            hdr = fse_core.write_ncount(norm, tl)
            cost = table_bits(norm, tl) / 8 + len(hdr)
            if best is None or cost < best[0]:
                best = (cost, S.MODE_FSE, S.STable(norm, tl, S.MODE_FSE), hdr)
        except ValueError:
            pass
    if best is None:
        raise ValueError("no valid sequence table")
    return best[2], best[1], best[3]


def encode_sequences_section(lls, mls, ofvals) -> bytes:
    n = len(lls)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append(128 + (n >> 8))
        out.append(n & 0xFF)
    else:
        out.append(255)
        out += (n - 0x7F00).to_bytes(2, "little")
    ll_c = S.ll_code(lls)
    ml_c = S.ml_code(mls)
    of_c = S.of_code(ofvals)
    t_ll, m_ll, x_ll = _choose_table(ll_c, "ll")
    t_of, m_of, x_of = _choose_table(of_c, "of")
    t_ml, m_ml, x_ml = _choose_table(ml_c, "ml")
    out.append((m_ll << 6) | (m_of << 4) | (m_ml << 2))
    out += x_ll
    out += x_of
    out += x_ml
    out += S.encode_sequences(lls, mls, ofvals, t_ll, t_of, t_ml)
    return bytes(out)


# ---------------------------------------------------------------------------
# Frame assembly
# ---------------------------------------------------------------------------


import contextlib


@contextlib.contextmanager
def predef_seq_tables():
    """Force predefined FSE sequence tables (mode 0) in the native
    encoder for the scope — the accel profile consumed by the
    shared-table Pallas sequence decoder (ops/zseq_pallas.py). The
    predefined tables cover the full code alphabets so any parse stays
    encodable; costs ~2-4%% of the sequence section. Process-global
    (native flag): do not interleave with concurrent encodes that must
    keep custom tables."""
    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_zstd_force_predef"):
        yield
        return
    lib.ct_zstd_force_predef(1)
    try:
        yield
    finally:
        lib.ct_zstd_force_predef(0)


def _native_compress(data: bytes, checksum: bool, level: int = 1):
    """Native ladder path (levels 1-4, no dict). Returns bytes or None.

    Reference roles: enc_fast.go (L1), enc_dfast.go (L2), enc_better.go
    (L3), enc_best.go (L4) — re-designed in _native/src/zstd_enc.cpp."""
    import ctypes

    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_zstd_compress_level"):
        return None
    if not getattr(lib, "_zenc_proto", False):
        lib.ct_zstd_compress_level.restype = ctypes.c_longlong
        lib.ct_zstd_compress_level.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p,
            ctypes.c_longlong, ctypes.c_int, ctypes.c_ulonglong,
            ctypes.c_int]
        lib._zenc_proto = True
    cap = len(data) + len(data) // 8 + 256
    arr, dst = _native.out_buf(cap)
    xx = (xxh64(data) & 0xFFFFFFFF) if checksum else 0
    r = lib.ct_zstd_compress_level(data, len(data), dst, cap,
                                   1 if checksum else 0, xx, level)
    if r < 0:
        return None
    return arr[:r].tobytes()


def _native_compress_dict(data: bytes, checksum: bool, level: int, dict_):
    """Dictionary frame via the native job entry: dict content = overlap
    prefix; blocks marked non-last + explicit empty last block."""
    import ctypes

    from compress_tpu import _native
    from compress_tpu.zstd import frame as F

    lib = bind_job_entry(_native.raw())
    if lib is None:
        return None
    content = bytes(dict_.content)
    n = len(data)
    seg = content + data
    cap = n + n // 8 + 4096
    arr, dst = _native.out_buf(cap)
    r = lib.ct_zstd_compress_blocks_level(seg, len(seg), len(content),
                                          dst, cap, level)
    if r < 0:
        return None
    window = max(n + len(content), 1024)
    out = bytearray(F.write_frame_header(n, window, False, checksum,
                                         dict_id=dict_.id))
    out += arr[:r].tobytes()
    out += (1).to_bytes(3, "little")  # empty raw last block carries `last`
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def bind_job_entry(lib):
    """One-time ctypes binding for ct_zstd_compress_blocks_level (shared
    by the windowed path, compress_concurrent, and the streaming Writer —
    r3 review #7: keep the prototype in exactly one place)."""
    import ctypes

    if lib is None or not hasattr(lib, "ct_zstd_compress_blocks_level"):
        return None
    if not getattr(lib, "_zjob_proto", False):
        lib.ct_zstd_compress_blocks_level.restype = ctypes.c_longlong
        lib.ct_zstd_compress_blocks_level.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int]
        lib._zjob_proto = True
    return lib


def _native_compress_windowed(data: bytes, checksum: bool, level: int,
                              window_log: int) -> bytes | None:
    """Custom-window frame on the native ladder: jobs of (window − overlap)
    bytes with overlap-prefix history bound every match offset to
    ≤ 2^window_log (reference: WithWindowSize → jobSize/overlapSize,
    encoder_options.go:356-371). Fixes the r2 cliff where window_log
    dropped to the Python Matcher."""
    import ctypes

    from compress_tpu import _native
    from compress_tpu.zstd import frame as F

    lib = bind_job_entry(_native.raw())
    if lib is None:
        return None
    n = len(data)
    window = 1 << max(int(window_log), 10)
    overlap = window // 8
    job = window - overlap
    out = bytearray(F.write_frame_header(n, min(window, max(n, 1024)),
                                         False, checksum))
    pos = 0
    while pos < n:
        hi = min(pos + job, n)
        p = max(0, pos - overlap)
        seg = data[p:hi]
        cap = (hi - pos) + (hi - pos) // 8 + 4096
        arr, dst = _native.out_buf(cap)
        r = lib.ct_zstd_compress_blocks_level(seg, len(seg), pos - p, dst,
                                              cap, level)
        if r < 0:
            return None
        out += arr[:r].tobytes()
        pos = hi
    out += (1).to_bytes(3, "little")  # empty raw last block carries `last`
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def compress(data, level: int = 2, checksum: bool = False,
             window_log: int | None = None, dict_=None) -> bytes:
    """Encode data as one zstd frame (reference: Encoder.EncodeAll).

    dict_: a zstd.dict.Dict — content becomes prefix history, initial rep
    offsets come from the dictionary, and the frame carries its ID."""
    data = bytes(data)
    n = len(data)
    # levels 1-4 ride the native ladder (greedy / dfast / lazy / deep-lazy,
    # zstd_enc.cpp); the Python Matcher below stays for dictionaries and
    # custom windows and as the differential oracle
    if level <= 4 and dict_ is None and window_log is None and n > 16:
        out = _native_compress(data, checksum, max(level, 1))
        if out is not None:
            from compress_tpu.utils.debuglog import dbg

            dbg("zstd", "compress n=%d level=%d native -> %d bytes",
                n, level, len(out))
            return out
    # custom window: whole input within the window ⇒ the plain native path
    # already satisfies the offset bound; larger inputs ride window-sized
    # overlap-prefix jobs
    if level <= 4 and dict_ is None and window_log is not None and n > 16:
        if n <= (1 << max(int(window_log), 10)):
            out = _native_compress(data, checksum, max(level, 1))
        else:
            out = _native_compress_windowed(data, checksum, max(level, 1),
                                            window_log)
        if out is not None:
            return out
    # dictionary frames also ride the native ladder: the dict content is
    # the overlap prefix of the job entry, and the native first-3-plain
    # rep invariant makes the dict's initial rep offsets irrelevant (our
    # blocks also never reference dict entropy tables, which RFC 8878
    # permits). Python Matcher remains the oracle below.
    if level <= 4 and dict_ is not None and window_log is None and n > 16:
        out = _native_compress_dict(data, checksum, max(level, 1), dict_)
        if out is not None:
            return out
    single = n <= (1 << 20) and dict_ is None
    window = n if single else min(1 << (window_log or 23),
                                  max(n + (len(dict_.content) if dict_ else 0), 1024))
    out = bytearray(
        F.write_frame_header(n, max(window, 1), single, checksum,
                             dict_id=dict_.id if dict_ else 0)
    )
    if n == 0:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")  # empty raw last
        if checksum:
            out += (xxh64(b"") & 0xFFFFFFFF).to_bytes(4, "little")
        return bytes(out)

    prefix = dict_.content if dict_ else b""
    plen = len(prefix)
    if plen:
        combined = bytes(prefix) + data
        matcher = Matcher(combined, level,
                          window=(1 << window_log) if window_log else None)
        # seed the hash table with the dictionary positions (sequences
        # discarded — this is enc_base resetBase dict loading, enc_base.go:160)
        matcher.next_block(0, plen)
        data_view = combined
        base = plen
        reps = dict_.reps
    else:
        matcher = Matcher(data, level,
                          window=(1 << window_log) if window_log else None)
        data_view = data
        base = 0
        reps = (1, 4, 8)
    pos = 0
    while pos < n:
        blk_start = base + pos
        blk_end = base + min(pos + BLOCK_SIZE, n)
        lls, mls, offs, tail = matcher.next_block(blk_start, blk_end)
        pos = blk_end - base
        last = pos >= n
        blk_regen = blk_end - blk_start

        body = None
        cand_reps = reps
        if len(lls):
            vals, cand_reps = offsets_to_values(lls, offs, reps)
            # literals buffer: per-seq literal runs + trailing tail
            lit_parts = []
            p = blk_start
            for i in range(len(lls)):
                lit_parts.append(data_view[p : p + int(lls[i])])
                p += int(lls[i]) + int(mls[i])
            lit_parts.append(tail)
            literals = b"".join(lit_parts)
            lit_sec = encode_literals(literals)
            seq_sec = encode_sequences_section(lls, mls, vals)
            body = lit_sec + seq_sec
        if body is None or len(body) >= blk_regen:
            bh = (1 if last else 0) | (0 << 1) | (blk_regen << 3)
            out += bh.to_bytes(3, "little")
            out += data_view[blk_start:blk_end]
            # raw blocks don't touch rep offsets
        else:
            bh = (1 if last else 0) | (2 << 1) | (len(body) << 3)
            out += bh.to_bytes(3, "little")
            out += body
            reps = cand_reps
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def compress_concurrent(data, workers: int = 4, job_size: int | None = None,
                        checksum: bool = False, level: int = 1) -> bytes:
    """Host-parallel single-frame encode (reference: WithConcurrentBlocks,
    zstd/enc_jobs.go): the input splits into jobs, each job gets the
    previous job's tail as overlap prefix, workers encode block sequences
    concurrently (the native core releases the GIL), and the frame is
    assembled in job order. Output is one valid frame.

    job_size defaults to the per-level window ladder (reference
    encoder_options.go:246/356: fastest 4 MiB, higher levels 8 MiB), so
    concurrent ratio tracks one-shot compress()."""
    if job_size is None:
        # size-aware: keep all workers busy on mid-size inputs (ratio
        # cost of smaller jobs is ~0.1-0.3%), cap at the level's window
        window = 1 << (22 if level <= 1 else 23)
        n_hint = len(data) if isinstance(data, (bytes, bytearray)) else 0
        per_worker = max(n_hint // max(workers, 1), 1 << 20)
        job_size = min(window - window // 8, per_worker)
    import ctypes
    from concurrent.futures import ThreadPoolExecutor

    from compress_tpu import _native

    data = bytes(data)
    n = len(data)
    lib = _native.raw()
    if n <= job_size or workers <= 1 or lib is None \
            or not hasattr(lib, "ct_zstd_compress_blocks_level"):
        return compress(data, level=level, checksum=checksum)
    bind_job_entry(lib)

    pre = job_size // 8  # overlap (reference overlapSize default class)
    bounds = list(range(0, n, job_size))

    def job(lo):
        hi = min(lo + job_size, n)
        p = max(0, lo - pre)
        seg = data[p:hi]
        cap = (hi - lo) + (hi - lo) // 8 + 4096
        arr, dst = _native.out_buf(cap)
        r = lib.ct_zstd_compress_blocks_level(seg, len(seg), lo - p, dst,
                                              cap, level)
        if r < 0:
            raise RuntimeError("native job encode failed")
        return arr[:r].tobytes()

    with ThreadPoolExecutor(max_workers=workers) as ex:
        parts = list(ex.map(job, bounds))

    from compress_tpu.zstd import frame as F

    window = min(n, (8 << 20)) if n else 1024
    out = bytearray(F.write_frame_header(n, max(window, job_size + pre),
                                         False, checksum))
    for part in parts:
        out += part
    out += (1).to_bytes(3, "little")  # final empty raw block carries `last`
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
