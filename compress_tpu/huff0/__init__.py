"""huff0 — Huffman block codec for <=255 symbols, tableLog <= 11.

Reference parity: huff0/ package — Compress1X/Compress4X (single and
4-interleaved-stream), canonical table serialization as FSE-compressed
weights or raw 4-bit nibbles (huff0/huff0.go cTable.write), ReadTable +
table-driven decode, ErrIncompressible/ErrUseRLE contracts (SURVEY.md §2.4).

Format notes (RFC 8878 §4.2.1, shared with zstd literals):
- weight(s) = max_nb_bits + 1 - nb_bits(s); 0 = unused; the last present
  symbol's weight is implied (completes the 2^max_bits kraft sum).
- header byte < 128: FSE-compressed weights follow (that many bytes);
  header byte >= 128: raw nibbles, count = header - 127.
- canonical codes: decode table is filled weight-ascending (longest codes
  at the lowest positions), natural symbol order within a weight.
- 4X: input split in 4 segments of ceil(n/4) (last = remainder); 6-byte
  jump table with the first three compressed sizes.

Our code-length assignment is package-merge (optimal length-limited), not
the reference's heap+setMaxHeight — same format, usually equal or smaller
output.
"""

from __future__ import annotations

import heapq

import numpy as np

from compress_tpu.fse import core as fse_core
from compress_tpu.utils.histogram import histogram256
from compress_tpu.utils.varint import put_uvarint, read_uvarint

MAX_TABLELOG = 11


class IncompressibleError(ValueError):
    pass


class UseRLEError(ValueError):
    pass


class CorruptError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Code length assignment (package-merge, optimal length-limited)
# ---------------------------------------------------------------------------


def package_merge_lengths(freqs: np.ndarray, limit: int) -> np.ndarray:
    """Optimal length-limited code lengths for nonzero freqs (<= limit).

    Native twin (ct_huf0_package_merge, identical tie order) when
    available."""
    lib = fse_core._native_entropy_lib()
    if lib is not None and len(freqs) <= 256:
        import ctypes

        f = np.zeros(256, np.int64)
        f[: len(freqs)] = freqs
        lengths = np.zeros(256, np.int32)
        r = lib.ct_huf0_package_merge(
            f.ctypes.data_as(ctypes.c_char_p), int(limit),
            lengths.ctypes.data_as(ctypes.c_char_p))
        if r == 0:
            return lengths[: len(freqs)].copy()
    sym = np.nonzero(freqs)[0]
    n = len(sym)
    if n == 0:
        raise ValueError("empty histogram")
    if n == 1:
        out = np.zeros(len(freqs), dtype=np.int32)
        out[sym[0]] = 1
        return out
    if (1 << limit) < n:
        raise ValueError("limit too small for alphabet")
    f = freqs[sym].astype(np.int64)
    # package-merge: maintain lists per level
    items = sorted((int(w), (int(s),)) for s, w in zip(sym, f))
    packages = items
    merged = items
    for _ in range(limit - 1):
        # package pairs
        paired = [
            (packages[i][0] + packages[i + 1][0], packages[i][1] + packages[i + 1][1])
            for i in range(0, len(packages) - 1, 2)
        ]
        merged = sorted(items + paired)
        packages = merged
    lengths = np.zeros(len(freqs), dtype=np.int32)
    for w, syms in merged[: 2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


def build_nbits(hist: np.ndarray, table_log: int = MAX_TABLELOG) -> tuple[np.ndarray, int]:
    """nb_bits per symbol (0 = unused) and the actual max bits used."""
    total = int(hist.sum())
    nz = int((hist > 0).sum())
    if nz <= 1:
        raise UseRLEError("single symbol")
    limit = min(table_log, MAX_TABLELOG)
    # like the reference, don't use more bits than a plain huffman tree needs
    nbits = package_merge_lengths(hist, limit)
    return nbits, int(nbits.max())


def estimate_size(hist, nbits) -> int:
    """Bytes needed to encode a histogram's worth of symbols with the
    given per-symbol code lengths, excluding the table header (reference:
    Scratch.EstimateSize, huff0/huff0.go:101). Pair with
    len(write_table(...)) for the full cost."""
    h = np.asarray(hist, np.int64)
    nb = np.asarray(nbits, np.int64)
    return int((h * nb).sum() + 7) >> 3


def append_table(dst: bytes, nbits: np.ndarray, max_bits: int) -> bytes:
    """Append the serialized table header to dst (reference:
    cTable.AppendTable role, huff0/huff0.go:141) — the table can then be
    fed back through read_table for reuse."""
    return bytes(dst) + write_table(nbits, max_bits)


# ---------------------------------------------------------------------------
# Weights <-> canonical codes
# ---------------------------------------------------------------------------


def nbits_to_weights(nbits: np.ndarray, max_bits: int) -> np.ndarray:
    w = np.where(nbits > 0, max_bits + 1 - nbits, 0)
    return w.astype(np.int32)


def weights_to_nbits(weights: np.ndarray) -> tuple[np.ndarray, int]:
    """Infer nb_bits from explicit weights + the implied last weight.

    weights: the serialized weights (last symbol's weight NOT included).
    Returns (nbits including the implied symbol, max_bits)."""
    w = weights.astype(np.int64)
    if (w < 0).any():
        raise CorruptError("negative weight")
    ksum = int((np.where(w > 0, 1 << (w - 1), 0)).sum())
    if ksum < 1:
        raise CorruptError("no weights")
    # total must reach the next power of two
    max_bits = max(ksum.bit_length(), 1)
    target = 1 << max_bits
    rest = target - ksum
    # rest must itself be a power of two (the implied symbol's 2^(w-1))
    if rest <= 0 or (rest & (rest - 1)) != 0:
        raise CorruptError("invalid weight sum")
    last_w = rest.bit_length()  # 2^(w-1) = rest
    full = np.concatenate([w, [last_w]])
    if max_bits > MAX_TABLELOG:
        raise CorruptError("tableLog too large")
    nbits = np.where(full > 0, max_bits + 1 - full, 0).astype(np.int32)
    return nbits, max_bits


def canonical_codes(nbits: np.ndarray, max_bits: int) -> np.ndarray:
    """Code value per symbol matching the RFC decode-table layout.

    Table is filled weight-ascending (i.e. nb_bits DESCENDING), natural
    symbol order within a weight; code = table_start >> (max_bits - nb)."""
    codes = np.zeros(len(nbits), dtype=np.int64)
    start = 0
    for nb in range(max_bits, 0, -1):  # longest codes first = lowest starts
        span = 1 << (max_bits - nb)
        for s in np.nonzero(nbits == nb)[0]:
            codes[s] = start >> (max_bits - nb)
            start += span
    if start != (1 << max_bits):
        raise ValueError("kraft sum mismatch")
    return codes


def build_dtable(weights_full: np.ndarray, max_bits: int):
    """(symbol, nb_bits) per max_bits-bit window index (RFC layout)."""
    size = 1 << max_bits
    sym_t = np.zeros(size, dtype=np.uint8)
    nb_t = np.zeros(size, dtype=np.int32)
    start = 0
    for w in range(1, max_bits + 1):
        nb = max_bits + 1 - w
        span = 1 << (w - 1)
        for s in np.nonzero(weights_full == w)[0]:
            sym_t[start : start + span] = s
            nb_t[start : start + span] = nb
            start += span
    if start != size:
        raise CorruptError("weights do not fill the table")
    return sym_t, nb_t


# ---------------------------------------------------------------------------
# Table serialization
# ---------------------------------------------------------------------------


def _write_table_native(nbits: np.ndarray, max_bits: int):
    """Native fast path (ct_huf_write_table); None when unavailable.

    Same output contract as the Python path below: FSE-compressed weights
    when strictly smaller (and unambiguous under exhaustion decode), else
    raw nibbles. Reference role: huff0/compress.go writeTable.
    """
    import ctypes

    from compress_tpu import _native

    if not _native.available():
        return None
    lib = _native.raw()
    if not getattr(lib, "_huf_wt_bound", False):
        lib.ct_huf_write_table.restype = ctypes.c_longlong
        lib.ct_huf_write_table.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_longlong,
        ]
        lib._huf_wt_bound = True
    arr = np.ascontiguousarray(nbits, dtype=np.int32)
    if arr.shape != (256,):
        full = np.zeros(256, dtype=np.int32)
        full[: len(arr)] = arr[:256]
        arr = full
    out = ctypes.create_string_buffer(256)
    r = lib.ct_huf_write_table(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(max_bits), out, 256)
    if r <= 0:
        return None
    return out.raw[:r]


def write_table(nbits: np.ndarray, max_bits: int) -> bytes:
    """Serialize weights: FSE-compressed if smaller, else raw nibbles."""
    fast = _write_table_native(nbits, max_bits)
    if fast is not None:
        return fast
    weights = nbits_to_weights(nbits, max_bits)
    last = int(np.nonzero(nbits)[0][-1])
    w_explicit = weights[:last]  # last present symbol's weight implied
    n = len(w_explicit)

    # raw nibble encoding: headerByte = 127 + number_of_weights, where the
    # weight count EXCLUDES the implied last symbol (RFC 8878 §4.2.1.1);
    # only representable for <= 128 explicit weights
    raw = None
    if n <= 128:
        raw = bytearray([127 + n])
        for i in range(0, n, 2):
            hi = int(w_explicit[i])
            lo = int(w_explicit[i + 1]) if i + 1 < n else 0
            raw.append((hi << 4) | lo)

    # FSE-compressed weights (accuracy <= 6, no explicit length)
    fse_blob = None
    if n >= 2:
        try:
            hist = np.bincount(w_explicit, minlength=256).astype(np.int64)
            max_sym = int(np.nonzero(hist)[0][-1])
            tl = fse_core.optimal_table_log(6, n, max_sym, max_table_log=6)
            norm = fse_core.normalize_count(hist, tl, n, max_sym)
            hdr = fse_core.write_ncount(norm, tl)
            stream = fse_core.encode_interleaved2(w_explicit.astype(np.uint8), norm, tl)
            blob = hdr + stream
            if len(blob) < 128 and (raw is None or len(blob) + 1 < len(raw)):
                # verify unambiguous exhaustion-decode before committing
                back = decode_weights_fse(bytes(blob))
                if back is not None and len(back) == n and (back == w_explicit).all():
                    fse_blob = bytes([len(blob)]) + blob
        except (ValueError, IncompressibleError):
            fse_blob = None
    if fse_blob is not None:
        return fse_blob
    if raw is None:
        raise IncompressibleError("table not serializable (>128 symbols, FSE failed)")
    return bytes(raw)


def decode_weights_fse(blob: bytes):
    """Decode FSE-compressed weights (termination by stream exhaustion)."""
    try:
        norm, tl, pos = fse_core.read_ncount(blob, 0, max_symbol=255, max_table_log=6)
    except ValueError:
        return None
    spread, nb, new_state = fse_core.build_dtable(norm, tl)
    try:
        br = fse_core.BitReaderReverse(blob[pos:])
    except ValueError:
        return None
    s1 = br.read(tl)
    s2 = br.read(tl)
    out = []
    # zstd semantics: emit, reload; overflow on reload => other state emits
    for _ in range(255):
        out.append(int(spread[s1]))
        s1 = int(new_state[s1]) + br.read(int(nb[s1]))
        if br.bitpos < 0:
            out.append(int(spread[s2]))
            return np.array(out, dtype=np.int32)
        out.append(int(spread[s2]))
        s2 = int(new_state[s2]) + br.read(int(nb[s2]))
        if br.bitpos < 0:
            out.append(int(spread[s1]))
            return np.array(out, dtype=np.int32)
    return None  # did not terminate — treat as corrupt/ambiguous


def read_table(buf: bytes, pos: int = 0):
    """Parse a serialized table. Returns (sym_t, nb_t, max_bits, new_pos)."""
    if pos >= len(buf):
        raise CorruptError("table truncated")
    hdr = buf[pos]
    pos += 1
    if hdr >= 128:
        n = hdr - 127  # number of explicit weights (implied last excluded)
        nbytes = (n + 1) // 2
        if pos + nbytes > len(buf):
            raise CorruptError("table truncated")
        w = np.zeros(n, dtype=np.int32)
        for i in range(n):
            b = buf[pos + i // 2]
            w[i] = (b >> 4) if i % 2 == 0 else (b & 0xF)
        pos += nbytes
    else:
        if pos + hdr > len(buf):
            raise CorruptError("table truncated")
        w = decode_weights_fse(buf[pos : pos + hdr])
        if w is None:
            raise CorruptError("bad FSE weight stream")
        pos += hdr
    nbits, max_bits = weights_to_nbits(np.asarray(w))
    weights_full = np.where(nbits > 0, max_bits + 1 - nbits, 0)
    sym_t, nb_t = build_dtable(weights_full, max_bits)
    return sym_t, nb_t, max_bits, pos


# ---------------------------------------------------------------------------
# Stream codec
# ---------------------------------------------------------------------------


def _encode_stream(data: np.ndarray, codes: np.ndarray, nbits: np.ndarray) -> bytes:
    lib = fse_core._native_entropy_lib()
    if lib is not None and len(data):
        import ctypes

        from compress_tpu import _native

        d = np.ascontiguousarray(data, np.uint8)
        c = np.ascontiguousarray(codes, np.uint16)
        nb = np.ascontiguousarray(nbits, np.uint8)
        cap = 2 * len(d) + 64
        arr, dst = _native.out_buf(cap)
        r = lib.ct_huf0_encode_stream(
            d.ctypes.data_as(ctypes.c_char_p), len(d),
            c.ctypes.data_as(ctypes.c_char_p),
            nb.ctypes.data_as(ctypes.c_char_p), dst, cap)
        if r >= 0:
            return arr[:r].tobytes()
    bw = fse_core.BitWriter()
    # encoded in reverse so the decoder emits forward
    for b in data[::-1].tolist():
        bw.add(int(codes[b]), int(nbits[b]))
    return bw.close()


def _decode_stream(stream: bytes, sym_t, nb_t, max_bits: int, out_len: int) -> np.ndarray:
    lib = fse_core._native_entropy_lib()
    if lib is not None and out_len and stream:
        import ctypes

        st = np.ascontiguousarray(sym_t, np.uint8)
        nbt = np.ascontiguousarray(nb_t, np.uint8)
        sp, sn = fse_core.pad_scratch(stream)
        out = np.empty(out_len, np.uint8)
        r = lib.ct_huf0_decode_stream(
            sp, sn, st.ctypes.data_as(ctypes.c_char_p),
            nbt.ctypes.data_as(ctypes.c_char_p), int(max_bits),
            out.ctypes.data_as(ctypes.c_char_p), out_len)
        if r == 0:
            return out
        # native rejection: re-run the Python loop for the precise error
    br = fse_core.BitReaderReverse(stream)
    out = np.zeros(out_len, dtype=np.uint8)
    bitpos = br.bitpos
    data = br.data
    for i in range(out_len):
        # peek max_bits (zero-padded near the start)
        bp = bitpos - max_bits
        if bp >= 0:
            byte0 = bp >> 3
            chunk = int.from_bytes(data[byte0 : byte0 + 9], "little")
            window = (chunk >> (bp & 7)) & ((1 << max_bits) - 1)
        else:
            chunk = int.from_bytes(data[0:9], "little")
            window = (chunk << -bp) & ((1 << max_bits) - 1)
        nb = int(nb_t[window])
        out[i] = sym_t[window]
        bitpos -= nb
        if bitpos < 0:
            raise CorruptError("stream overread")
    if bitpos != 0:
        raise CorruptError("stream not fully consumed")
    return out


def compress_1x(data, table_log: int = MAX_TABLELOG, reuse_table=None) -> bytes:
    """Single-stream compress. Container: [uvarint n][table][stream]."""
    data = bytes(data)
    n = len(data)
    if n == 0:
        raise IncompressibleError("empty")
    buf = np.frombuffer(data, dtype=np.uint8)
    hist = histogram256(buf)
    if int(hist.max()) == n:
        raise UseRLEError("single symbol")
    nbits, max_bits = build_nbits(hist, table_log)
    codes = canonical_codes(nbits, max_bits)
    table = write_table(nbits, max_bits)
    stream = _encode_stream(buf, codes, nbits)
    out = bytearray()
    put_uvarint(out, n)
    out += table
    out += stream
    if len(out) >= n:
        raise IncompressibleError("did not compress")
    return bytes(out)


def compress_4x(data, table_log: int = MAX_TABLELOG) -> bytes:
    """4-stream compress: [uvarint n][table][jump6][s1][s2][s3][s4]."""
    data = bytes(data)
    n = len(data)
    if n < 12:
        raise IncompressibleError("too small for 4X")
    buf = np.frombuffer(data, dtype=np.uint8)
    hist = histogram256(buf)
    if int(hist.max()) == n:
        raise UseRLEError("single symbol")
    nbits, max_bits = build_nbits(hist, table_log)
    codes = canonical_codes(nbits, max_bits)
    table = write_table(nbits, max_bits)
    seg = (n + 3) // 4
    streams = []
    for k in range(4):
        part = buf[k * seg : min((k + 1) * seg, n)]
        streams.append(_encode_stream(part, codes, nbits))
    if max(len(s) for s in streams[:3]) > 0xFFFF:
        raise IncompressibleError("stream too large for jump table")
    out = bytearray()
    put_uvarint(out, n)
    out += table
    for s in streams[:3]:
        out += len(s).to_bytes(2, "little")
    for s in streams:
        out += s
    if len(out) >= n:
        raise IncompressibleError("did not compress")
    return bytes(out)


def _decompress_body_native(blob: bytes, pos: int, n: int, fourx: int):
    """Whole-container native decode (table + streams in one call), or
    None → the Python path re-derives the precise error."""
    lib = fse_core._native_entropy_lib()
    if lib is None or n == 0:
        return None
    import ctypes

    sp, sn = fse_core.pad_scratch(blob, pos)
    out = np.empty(n, np.uint8)
    r = lib.ct_huf0_decompress_body(
        sp, sn, fourx, out.ctypes.data_as(ctypes.c_char_p), n)
    return out.tobytes() if r == 0 else None


def decompress_1x(blob, max_size: int = 64 << 20) -> bytes:
    blob = bytes(blob)
    n, pos = read_uvarint(blob)
    if n > max_size:
        raise ValueError("decoded size exceeds limit")
    res = _decompress_body_native(blob, pos, n, 0)
    if res is not None:
        return res
    sym_t, nb_t, max_bits, pos = read_table(blob, pos)
    return _decode_stream(blob[pos:], sym_t, nb_t, max_bits, n).tobytes()


def decompress_4x(blob, max_size: int = 64 << 20) -> bytes:
    blob = bytes(blob)
    n, pos = read_uvarint(blob)
    if n > max_size:
        raise ValueError("decoded size exceeds limit")
    res = _decompress_body_native(blob, pos, n, 1)
    if res is not None:
        return res
    sym_t, nb_t, max_bits, pos = read_table(blob, pos)
    if pos + 6 > len(blob):
        raise CorruptError("jump table truncated")
    sizes = [int.from_bytes(blob[pos + 2 * k : pos + 2 * k + 2], "little") for k in range(3)]
    pos += 6
    seg = (n + 3) // 4
    lens = [seg, seg, seg, n - 3 * seg]
    if lens[3] < 0:
        raise CorruptError("invalid segment split")
    out = bytearray()
    for k in range(4):
        size = sizes[k] if k < 3 else len(blob) - pos
        if pos + size > len(blob):
            raise CorruptError("stream truncated")
        out += _decode_stream(blob[pos : pos + size], sym_t, nb_t, max_bits, lens[k]).tobytes()
        pos += size
    return bytes(out)


__all__ = [
    "compress_1x", "compress_4x", "decompress_1x", "decompress_4x",
    "read_table", "write_table", "build_nbits", "canonical_codes",
    "IncompressibleError", "UseRLEError", "CorruptError", "MAX_TABLELOG",
]


def compress_4x_batch(blocks, return_accel: bool = False,
                      shared_table: bool = False, max_log: int = 11):
    """Device-batched Compress4X over equal-length blocks.

    blocks: (N, L) uint8 array-like. Returns a list of containers in the
    same [uvarint n][table][jump6][streams] format as compress_4x; entries
    are None where the block is incompressible/RLE (caller falls back,
    mirroring the reference's error contract).

    return_accel=True also returns the decode-accelerator side channel
    (per-chunk checkpoint bit offsets) consumed by decompress_4x_batch's
    device path — the zstd-frame integration would carry this in a
    skippable frame."""
    import jax.numpy as jnp

    from compress_tpu.ops import entropy as E

    arr = np.ascontiguousarray(blocks).astype(np.uint8)
    N, L = arr.shape
    t = {k: np.asarray(v) for k, v in
         E.huff0_encode_blocks(jnp.asarray(arr), shared_table=shared_table,
                               max_log=max_log).items()}
    accel = {"ckpt": t["ckpt"], "k": E.HUFF_CKPT_K,
             "shared": bool(shared_table)}
    out = []
    cache: dict = {}
    for i in range(N):
        if not bool(t["ok"][i]):
            out.append(None)
            continue
        key = t["nbits"][i].tobytes()
        if key not in cache:
            try:
                cache[key] = write_table(t["nbits"][i].astype(np.int64),
                                         int(t["max_bits"][i]))
            except IncompressibleError:
                cache[key] = None
        table = cache[key]
        if table is None:
            out.append(None)
            continue
        bq = t["stream_bits"][i]
        sb = [(int(x) + 1 + 7) // 8 for x in bq]
        sh = [(int(x) + 16) >> 4 for x in bq]
        sbase = [sh[1] + sh[2] + sh[3], sh[2] + sh[3], sh[3], 0]
        hb = t["halves"][i].astype(np.uint16).tobytes()
        streams = []
        for q in range(4):
            sbytes = bytearray(hb[2 * sbase[q] : 2 * sbase[q] + sb[q]])
            eos = int(bq[q])
            sbytes[eos >> 3] |= 1 << (eos & 7)
            streams.append(bytes(sbytes))
        if max(len(s) for s in streams[:3]) > 0xFFFF:
            out.append(None)
            continue
        blob = bytearray()
        put_uvarint(blob, L)
        blob += table
        for s in streams[:3]:
            blob += len(s).to_bytes(2, "little")
        for s in streams:
            blob += s
        out.append(bytes(blob) if len(blob) < L else None)
    if return_accel:
        return out, accel
    return out


def make_accel(containers, k: int | None = None):
    """Derive the decode-accelerator checkpoints for existing containers
    by one host walk (for foreign 4X blobs; device-encoded blocks get
    this for free from compress_4x_batch(return_accel=True))."""
    from compress_tpu.fse import core as fse_core
    from compress_tpu.ops.entropy import HUFF_CKPT_K

    k = k or HUFF_CKPT_K
    rows = []
    cmax = 1
    for blob in containers:
        if blob is None:
            rows.append(None)
            continue
        blob = bytes(blob)
        n, pos = read_uvarint(blob)
        sym_t, nb_t, max_bits, pos = read_table(blob, pos)
        sizes = [int.from_bytes(blob[pos + 2 * q : pos + 2 * q + 2],
                                "little") for q in range(3)]
        pos += 6
        seg = (n + 3) // 4
        lens = [seg, seg, seg, n - 3 * seg]
        qs = []
        for q in range(4):
            size = sizes[q] if q < 3 else len(blob) - pos
            stream = blob[pos : pos + size]
            pos += size
            br = fse_core.BitReaderReverse(stream)
            bitpos = br.bitpos
            cks = [bitpos]
            data = stream
            for j in range(lens[q]):
                bp = bitpos - max_bits
                if bp >= 0:
                    b0 = bp >> 3
                    chunk = int.from_bytes(data[b0 : b0 + 9], "little")
                    w = (chunk >> (bp & 7)) & ((1 << max_bits) - 1)
                else:
                    chunk = int.from_bytes(data[0:9], "little")
                    w = (chunk << -bp) & ((1 << max_bits) - 1)
                bitpos -= int(nb_t[w])
                if (j + 1) % k == 0:
                    cks.append(bitpos)
            qs.append(cks)
            cmax = max(cmax, len(cks))
        rows.append(qs)
    ckpt = np.zeros((len(containers), 4, cmax), np.int32)
    for i, qs in enumerate(rows):
        if qs is None:
            continue
        for q in range(4):
            ckpt[i, q, : len(qs[q])] = qs[q]
    return {"ckpt": ckpt, "k": k}


def _prep_decode_batch(containers, accel, max_size: int = 64 << 20):
    """Host prep for the device decode: parse containers, expand tables,
    build per-chunk windows, pack the batch tensors. Returns
    ((windows, lbit, nsym, tables) jnp arrays, metas, cmax)."""
    import jax.numpy as jnp

    from compress_tpu.ops import entropy_dec as ED

    K = int(accel["k"])
    ckpt = np.asarray(accel["ckpt"])
    N = len(containers)
    metas = []
    cmax = 1
    for i, blob in enumerate(containers):
        if blob is None:
            metas.append(None)
            continue
        blob = bytes(blob)
        n, pos = read_uvarint(blob)
        if n > max_size:
            raise ValueError("decoded size exceeds limit")
        sym_t, nb_t, max_bits, pos = read_table(blob, pos)
        sizes = [int.from_bytes(blob[pos + 2 * k : pos + 2 * k + 2],
                                "little") for k in range(3)]
        pos += 6
        seg = (n + 3) // 4
        lens = [seg, seg, seg, n - 3 * seg]
        table = ED.expand_table(sym_t, nb_t, max_bits)
        streams = []
        for q in range(4):
            size = sizes[q] if q < 3 else len(blob) - pos
            if pos + size > len(blob) or lens[3] < 0:
                raise CorruptError("stream truncated")
            streams.append(blob[pos : pos + size])
            pos += size
        wq, lq, nsq = [], [], []
        for q in range(4):
            nch = -(-lens[q] // K) if lens[q] else 0
            w, lb = ED.build_windows(streams[q], ckpt[i, q], max(nch, 1))
            ns = np.minimum(lens[q] - K * np.arange(max(nch, 1)), K)
            ns = np.maximum(ns, 0)
            wq.append(w)
            lq.append(lb)
            nsq.append(ns.astype(np.int32))
        metas.append((n, lens, table, wq, lq, nsq))
        cmax = max(cmax, max(len(x) for x in lq))
    # pack the batch: (N, 4*cmax) chunks
    C = 4 * cmax
    windows = np.zeros((N, C, ED.WIN), np.uint8)
    lbit = np.full((N, C), 8 * ED.WIN, np.int32)
    nsym = np.zeros((N, C), np.int32)
    tables = np.zeros((N, 64, 32), np.float32)
    for i, m in enumerate(metas):
        if m is None:
            continue
        _, _, table, wq, lq, nsq = m
        tables[i] = table
        for q in range(4):
            base = q * cmax
            nc = len(lq[q])
            windows[i, base : base + nc] = wq[q]
            lbit[i, base : base + nc] = lq[q]
            nsym[i, base : base + nc] = nsq[q]
    args = (jnp.asarray(windows), jnp.asarray(lbit), jnp.asarray(nsym),
            jnp.asarray(tables))
    return args, metas, cmax


def shared_packed_table(metas):
    """(packed (2^mb,) int32 sym|nb<<8, mb) from a shared-table batch's
    first decode meta (all containers carry the same table)."""
    first = next(m for m in metas if m is not None)
    tab2048 = first[2].reshape(2048).astype(np.int64)
    sym_t, nb_t = tab2048 // 16, tab2048 % 16
    mb = int(nb_t.max())
    idx = np.arange(1 << mb) << (11 - mb)
    return (sym_t[idx] | (nb_t[idx] << 8)).astype(np.int32), mb


def decompress_4x_batch(containers, accel=None, max_size: int = 64 << 20,
                        engine: str = "auto"):
    """Decode a batch of 4X containers; with `accel` (the encoder's
    checkpoint side channel) the symbol loop runs on device. Without it,
    falls back to the host decoder per container. None entries pass
    through as None.

    engine: "pallas" = the shared-table Pallas kernel
    (ops/entropy_pallas.py, requires accel["shared"]); "xla" = the
    per-container-table XLA scan (ops/entropy_dec.py); "auto" picks
    pallas when the batch was encoded with a shared table and a TPU is
    present."""
    if accel is None:
        return [None if c is None else decompress_4x(c, max_size)
                for c in containers]
    import jax

    from compress_tpu.ops import entropy_dec as ED

    K = int(accel["k"])
    ckpt = np.asarray(accel["ckpt"])
    args, metas, cmax = _prep_decode_batch(containers, accel, max_size)
    use_pallas = engine == "pallas" or (
        engine == "auto" and accel.get("shared")
        and jax.devices()[0].platform not in ("cpu",))
    if use_pallas:
        if not accel.get("shared"):
            raise ValueError("pallas engine requires shared-table accel")
        from compress_tpu.ops import entropy_pallas as EP

        windows, lbit, nsym, _tables = args
        N, C, winb = windows.shape
        packed, mb = shared_packed_table(metas)
        import jax.numpy as jnp

        syms, endl = EP.huff0_decode_chunks_shared(
            windows.reshape(N * C, winb), lbit.reshape(N * C),
            nsym.reshape(N * C), jnp.asarray(packed), k=K, max_bits=mb,
            interpret=jax.devices()[0].platform in ("cpu",))
        syms = np.asarray(syms, np.int32).reshape(N, C, K)
        endl = np.asarray(endl).reshape(N, C)
    else:
        syms, endl = ED.huff0_decode_chunks(*args, k=K)
        syms = np.asarray(syms, np.int32)
        endl = np.asarray(endl)
    out = []
    for i, m in enumerate(metas):
        if m is None:
            out.append(None)
            continue
        n, lens, _, wq, lq, nsq = m
        parts = []
        for q in range(4):
            base = q * cmax
            nc = len(lq[q])
            s = syms[i, base : base + nc].reshape(-1)[: lens[q]]
            parts.append(s.astype(np.uint8).tobytes())
            # consumption check: the last chunk must land exactly on the
            # end of the bitstream (remaining == 0, window-local
            # -8*wlo == lbit - ckpt_start)
            if lens[q]:
                expected = int(lq[q][nc - 1]) - int(ckpt[i, q][nc - 1])
                if int(endl[i, base + nc - 1]) != expected:
                    raise CorruptError("stream not fully consumed")
        out.append(b"".join(parts))
    return out
