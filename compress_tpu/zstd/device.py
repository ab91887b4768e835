"""Host assembly for the device zstd encoder (ops/zdev.py).

The device produces, per 16 KiB block: sequence triples, literal counts,
huff0 4-stream bit-packed literal halves, and the FSE sequence bitstream
halves. This module is the frameenc/blockenc byte-plumbing equivalent
(reference zstd/frameenc.go, zstd/blockenc.go header paths): it picks
raw/RLE/compressed per section, writes headers, splices the device
streams, and appends the end-of-stream marker bits the device leaves to
the host (one OR per stream).

Rep-offset codes ARE emitted (ops/zdev.py applies _rep_offsets), but the
first 3 sequences of every block are forced plain offset+3 pushes, so each
block's rep state is self-contained: the assembly never needs to track rep
state across blocks. Do not remove the first-3-plain invariant in zdev
without revisiting this module.
"""

from __future__ import annotations

import numpy as np

from compress_tpu import huff0
from compress_tpu.utils.xxhash64 import xxh64
from compress_tpu.zstd import frame as F

from compress_tpu.ops import zdev


def _lit_header_raw(regen: int) -> bytes:
    if regen < 32:
        return bytes([0 | (regen << 3)])
    if regen < 4096:
        return (0 | (1 << 2) | (regen << 4)).to_bytes(2, "little")
    return (0 | (3 << 2) | (regen << 4)).to_bytes(3, "little")


def _lit_header_rle(regen: int) -> bytes:
    if regen < 32:
        return bytes([1 | (regen << 3)])
    if regen < 4096:
        return (1 | (1 << 2) | (regen << 4)).to_bytes(2, "little")
    return (1 | (3 << 2) | (regen << 4)).to_bytes(3, "little")


def _lit_header_comp(lit_type: int, regen: int, comp: int) -> bytes:
    # 4-stream sizes; pick the smallest size_format that fits
    if regen < 1 << 10 and comp < 1 << 10:
        v = lit_type | (1 << 2) | (regen << 4) | (comp << 14)
        return v.to_bytes(3, "little")
    if regen < 1 << 14 and comp < 1 << 14:
        v = lit_type | (2 << 2) | (regen << 4) | (comp << 18)
        return v.to_bytes(4, "little")
    v = lit_type | (3 << 2) | (regen << 4) | (comp << 22)
    return v.to_bytes(5, "little")


def _seq_count_header(n: int) -> bytes:
    if n == 0:
        return b"\x00"
    if n < 128:
        return bytes([n])
    if n < 0x7F00:
        return bytes([128 + (n >> 8), n & 0xFF])
    return b"\xff" + (n - 0x7F00).to_bytes(2, "little")


def _extract_literals(block: bytes, lls, mls, ns: int) -> bytes:
    """Gather the per-sequence literal runs + tail (vectorized ragged
    gather — the per-sequence Python loop was 51% of job assembly)."""
    if ns == 0:
        return block
    lls = np.asarray(lls[:ns], np.int64)
    mls = np.asarray(mls[:ns], np.int64)
    starts = np.zeros(ns, np.int64)
    adv = lls + mls
    starts[1:] = np.cumsum(adv[:-1])
    tail_at = int(starts[-1] + adv[-1])
    total = int(lls.sum())
    if total == 0:
        return block[tail_at:]
    nz = lls > 0
    st = starts[nz]
    ln = lls[nz]
    base = np.repeat(st - (np.cumsum(ln) - ln), ln)
    idx = base + np.arange(total, dtype=np.int64)
    buf = np.frombuffer(block, np.uint8)
    return buf[idx].tobytes() + block[tail_at:]


_TABLE_CACHE: dict = {}  # nbits bytes -> serialized table (or None)


def _first_seq_hdr(t, j) -> bytes:
    """modes byte + per-table extras for the job's first seq-block."""
    from compress_tpu.fse import core as fse_core

    fse_norm = np.asarray(t["fse_norm"][j])
    fse_log = np.asarray(t["fse_log"][j])
    fse_rle = np.asarray(t["fse_rle"][j])
    fse_rle_sym = np.asarray(t["fse_rle_sym"][j])
    modes = []
    extras = []
    for k in range(3):
        norm = fse_norm[k].astype(np.int64)
        nz = np.nonzero(norm)[0]
        if bool(fse_rle[k]) or nz.size == 0:
            # all-zero norm only happens when NO block in the job has
            # sequences — the header is never consumed, but must not crash
            modes.append(1)
            extras.append(bytes([int(fse_rle_sym[k])]))
        else:
            modes.append(2)
            extras.append(
                fse_core.write_ncount(norm[: nz[-1] + 1], int(fse_log[k])))
    m = (modes[0] << 6) | (modes[1] << 4) | (modes[2] << 2)
    return bytes([m]) + b"".join(extras)


def _assemble_job_native(job_bytes: bytes, t, j: int, block: int):
    """C++ assembly (ct_zstd_assemble_job) — the Python byte-plumbing ran
    at 0.04 GB/s and capped device e2e encode. Returns list or None."""
    import ctypes

    from compress_tpu import _native

    lib = _native.raw()
    if lib is None or not hasattr(lib, "ct_zstd_assemble_job"):
        return None
    if not getattr(lib, "_asm_job", False):
        lib.ct_zstd_assemble_job.restype = ctypes.c_longlong
        lib.ct_zstd_assemble_job.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            *([ctypes.POINTER(ctypes.c_int32)] * 3),          # ns, lc, ok
            *([ctypes.POINTER(ctypes.c_int32)] * 3),          # nbits, mb, sb
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,  # lit_halves
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,  # seq_halves
            ctypes.POINTER(ctypes.c_int32),                     # seq bits
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,  # ll, ml
            ctypes.c_char_p, ctypes.c_longlong,                 # first hdr
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong)]
        lib._asm_job = True

    def i32(x):
        a = np.ascontiguousarray(np.asarray(x), np.int32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    nblk = len(job_bytes) // block
    ns_a, ns_p = i32(t["n_seqs"][j])
    lc_a, lc_p = i32(t["lit_cnt"][j])
    ok_a, ok_p = i32(np.asarray(t["huff_ok"][j]).astype(np.int32))
    nb_a, nb_p = i32(t["nbits"][j])
    mb_a, mb_p = i32(t["max_bits"][j])
    sb_a, sb_p = i32(t["stream_bits"][j])
    lh_a, lh_p = i32(t["lit_halves"][j])
    sh_a, sh_p = i32(t["seq_halves"][j])
    tb_a, tb_p = i32(t["seq_total_bits"][j])
    ll_a, ll_p = i32(t["ll"][j])
    ml_a, ml_p = i32(t["ml"][j])
    hdr = _first_seq_hdr(t, j)
    cap = len(job_bytes) + nblk * 64 + (1 << 16)
    oarr, out = _native.out_buf(cap)
    blk_len = (ctypes.c_longlong * nblk)()
    r = lib.ct_zstd_assemble_job(
        job_bytes, len(job_bytes), int(block), int(nblk),
        ns_p, lc_p, ok_p, nb_p, mb_p, sb_p,
        lh_p, lh_a.shape[-1], sh_p, sh_a.shape[-1], tb_p,
        ll_p, ml_p, ll_a.shape[-1], hdr, len(hdr), out, cap, blk_len)
    if r < 0:
        return None
    raw = oarr[:r].tobytes()  # ONE copy of the used prefix only
    res = []
    pos = 0
    for b in range(nblk):
        bl = blk_len[b]
        if bl == -1:
            res.append(None)
        elif bl == -2:
            res.append(("rle", raw[pos : pos + 1]))
            pos += 1
        else:
            res.append(raw[pos : pos + bl])
            pos += bl
    return res


def _assemble_job(job_bytes: bytes, t, j: int, block: int):
    res = _assemble_job_native(job_bytes, t, j, block)
    if res is not None:
        return res
    return _assemble_job_py(job_bytes, t, j, block)


def _assemble_job_py(job_bytes: bytes, t, j: int, block: int):
    """Yield per-block compressed bodies (or None for raw) for job j."""
    nblk = len(job_bytes) // block
    n_seqs = np.asarray(t["n_seqs"][j])
    lit_cnt = np.asarray(t["lit_cnt"][j])
    ll = np.asarray(t["ll"][j])
    ml = np.asarray(t["ml"][j])
    huff_ok = np.asarray(t["huff_ok"][j])
    nbits = np.asarray(t["nbits"][j])
    max_bits = np.asarray(t["max_bits"][j])
    stream_bits = np.asarray(t["stream_bits"][j])
    lit_halves = np.asarray(t["lit_halves"][j])
    seq_halves = np.asarray(t["seq_halves"][j])
    seq_total_bits = np.asarray(t["seq_total_bits"][j])

    table_cache: dict = _TABLE_CACHE  # process-level: tables recur

    def huff_table_blob(b):
        if not bool(huff_ok[b]):
            return None
        key = nbits[b].tobytes()
        if key not in table_cache:
            try:
                table_cache[key] = huff0.write_table(
                    nbits[b].astype(np.int64), int(max_bits[b]))
            except Exception:
                table_cache[key] = None
        return table_cache[key]

    # per-job FSE sequence tables: first seq-block carries them (FSE or RLE
    # mode per table), later seq-blocks use Repeat_Mode (shared with the
    # native wrapper: ONE serialization of the first-block header)
    first_hdr = _first_seq_hdr(t, j)
    tables_written = False

    out = []
    for b in range(nblk):
        blk = job_bytes[b * block : (b + 1) * block]
        if blk.count(blk[0]) == len(blk):
            out.append(("rle", blk[:1]))
            continue
        ns = int(n_seqs[b])
        lc = int(lit_cnt[b])
        lits = _extract_literals(blk, ll[b], ml[b], ns)
        assert len(lits) == lc, (len(lits), lc)

        # ---- literal section candidates -------------------------------
        lit_sec = _lit_header_raw(lc) + lits
        if lc > 0 and lits.count(lits[0]) == lc:
            rle = _lit_header_rle(lc) + lits[:1]
            if len(rle) < len(lit_sec):
                lit_sec = rle
        table_blob = huff_table_blob(b)
        if table_blob is not None and lc >= 256:
            bq = stream_bits[b]
            sb = [(int(x) + 1 + 7) // 8 for x in bq]          # incl. EOS bit
            sh = [(int(x) + 16) >> 4 for x in bq]
            sbase = [sh[1] + sh[2] + sh[3], sh[2] + sh[3], sh[3], 0]
            hb = lit_halves[b].astype(np.uint16).tobytes()
            streams = []
            for q in range(4):
                sbytes = bytearray(hb[2 * sbase[q] : 2 * sbase[q] + sb[q]])
                eos = int(bq[q])
                sbytes[eos >> 3] |= 1 << (eos & 7)
                streams.append(bytes(sbytes))
            if max(len(s) for s in streams[:3]) <= 0xFFFF:
                body = table_blob
                body += b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
                body += b"".join(streams)
                try:
                    comp = _lit_header_comp(2, lc, len(body)) + body
                except OverflowError:
                    comp = None
                if comp is not None and len(comp) < len(lit_sec):
                    lit_sec = comp

        # ---- sequence section ------------------------------------------
        seq_sec = _seq_count_header(ns)
        if ns > 0:
            tb = int(seq_total_bits[b])
            sb = (tb + 1 + 7) // 8
            sbytes = bytearray(seq_halves[b].astype(np.uint16).tobytes()[:sb])
            sbytes[tb >> 3] |= 1 << (tb & 7)
            if not tables_written:
                seq_sec += first_hdr
            else:
                seq_sec += bytes([(3 << 6) | (3 << 4) | (3 << 2)])
            seq_sec += bytes(sbytes)

        body = lit_sec + seq_sec
        if len(body) < len(blk):
            out.append(body)
            # decoder-side FSE table state only advances when the
            # compressed block is actually emitted
            tables_written = tables_written or ns > 0
        else:
            out.append(None)
    return out


def _on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def compress_device(data, *, checksum: bool = False, job: int | None = None,
                    block: int | None = None, encode_fn=None,
                    max_launch_jobs: int = 8, level: int = 2,
                    engine: str = "auto", interpret: bool = False) -> bytes:
    """Encode `data` as one zstd frame using the device encoder for all
    full `job`-sized windows; the tail uses the host matcher (rep-free).

    engine: "v2" = the Pallas-kernel pipeline (ops/zenc2.py, 64 KiB
    blocks, 4 MiB default window + winnowed LDM), "v1" = the XLA-graph
    pipeline (ops/zdev.py), "auto" = v2 on a real accelerator, v1 on
    CPU (Pallas needs interpret mode there; pass engine="v2",
    interpret=True to force it). encode_fn: explicit override (tests
    pass smaller geometry)."""
    data = bytes(data)
    if engine == "auto":
        engine = "v2" if _on_tpu() else "v1"
    if encode_fn is None:
        if engine == "v2":
            import functools

            from compress_tpu.ops import zenc2

            encode_fn = functools.partial(zenc2.zstd_encode_jobs_v2,
                                          interpret=interpret)
            job = job or (4 << 20)
            block = block or zenc2.BLOCK
        else:
            encode_fn = zdev.zstd_encode_jobs
            job = job or zdev.JOB
            block = block or zdev.BLOCK
    else:
        job = job or zdev.JOB
        block = block or zdev.BLOCK
    n = len(data)
    if n < job:
        from compress_tpu.zstd.encoder import compress

        return compress(data, level=1, checksum=checksum)

    n_jobs = n // job
    pre = job // 8  # overlap prefix (reference enc_jobs overlapSize)
    out = bytearray(F.write_frame_header(n, job + pre, False, checksum))
    bodies = []
    regens = []

    # double-buffered pipeline: jax dispatch is async, so launching batch
    # k+1 BEFORE pulling batch k's outputs overlaps device encode with
    # host assembly (the reference's encode-worker/flusher overlap,
    # enc_jobs.go jobWorker/jobFlusher)
    def _launch(c, hi):
        import jax.numpy as jnp

        arr = np.frombuffer(data[c * job : hi * job],
                            np.uint8).reshape(-1, job)
        prefixes = np.zeros((hi - c, pre), np.uint8)
        has_prefix = np.zeros(hi - c, bool)
        for j in range(c, hi):
            if j > 0:
                prefixes[j - c] = np.frombuffer(
                    data[j * job - pre : j * job], np.uint8)
                has_prefix[j - c] = True
        return encode_fn(jnp.asarray(arr), job=job, block=block,
                         prefixes=jnp.asarray(prefixes),
                         has_prefix=jnp.asarray(has_prefix), level=level)

    def _drain(t, c, hi):
        t = {k: np.asarray(v) for k, v in t.items()}
        for j in range(hi - c):
            jb = data[(c + j) * job : (c + j + 1) * job]
            for body in _assemble_job(jb, t, j, block):
                bodies.append(body)
                regens.append(block)

    spans = [(c, min(c + max_launch_jobs, n_jobs))
             for c in range(0, n_jobs, max_launch_jobs)]
    pending = None
    for c, hi in spans:
        t = _launch(c, hi)
        if pending is not None:
            _drain(*pending)
        pending = (t, c, hi)
    if pending is not None:
        _drain(*pending)

    tail_b, tail_r = tail_bodies(data[n_jobs * job :])
    bodies += tail_b
    regens += tail_r
    emit_blocks(out, data, bodies, regens)
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def tail_bodies(tail: bytes):
    """Host-matcher encode of the sub-job tail (rep-free offset values)."""
    bodies, regens = [], []
    if not tail:
        return bodies, regens
    from compress_tpu.zstd import encoder as E

    matcher = E.Matcher(tail, 1)
    pos = 0
    while pos < len(tail):
        end = min(pos + E.BLOCK_SIZE, len(tail))
        lls, mls, offs, _tl = matcher.next_block(pos, end)
        body = None
        if len(lls):
            vals = offs + 3  # never rep codes
            lit_sec = E.encode_literals(
                _extract_literals(tail[pos:end], lls, mls, len(lls)))
            seq_sec = E.encode_sequences_section(lls, mls, vals)
            body = lit_sec + seq_sec
        bodies.append(body if body is not None and len(body) < end - pos
                      else None)
        regens.append(end - pos)
        pos = end
    return bodies, regens


def emit_blocks(out: bytearray, data: bytes, bodies, regens):
    """Write block headers + bodies; None = raw, ("rle", b) = RLE block."""
    off = 0
    for i, (body, regen) in enumerate(zip(bodies, regens)):
        last = i == len(bodies) - 1
        if body is None:
            bh = (1 if last else 0) | (0 << 1) | (regen << 3)
            out += bh.to_bytes(3, "little")
            out += data[off : off + regen]
        elif isinstance(body, tuple):  # ("rle", byte)
            bh = (1 if last else 0) | (1 << 1) | (regen << 3)
            out += bh.to_bytes(3, "little")
            out += body[1]
        else:
            bh = (1 if last else 0) | (2 << 1) | (len(body) << 3)
            out += bh.to_bytes(3, "little")
            out += body
        off += regen
    return out
