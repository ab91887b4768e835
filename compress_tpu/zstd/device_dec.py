"""End-to-end device decode of small zstd frames (batched).

`decompress_frames_device(frames)` decodes a batch of single-block
frames (content <= 64 KiB — self-contained blocks, the batched
small-object decode use case) with every heavy stage on device:

  1. literals — huff0 4X chunked scan (ops/entropy_dec.huff0_decode_chunks),
  2. sequences — 3-state FSE chunked scan (zseq_decode_chunks),
  3. LZ execute — the arena kernel (ops/execute.execute_rounds).

The host choreographs byte-level section parsing only. r3: frames
carrying the encoder-emitted accel sidecar (zstd/accel.py — huff0
checkpoints, sequence checkpoints, execute plan in a skippable frame)
decode with ZERO per-symbol host work; plain frames fall back to r2's
host checkpoint walks (`make_accel`-style), and unsupported shapes
(multi-block, treeless literals) to the host decoder per frame — the
reference's asm/no-asm contract.

Validated bit-exactly against zstd.decompress (and upstream libzstd
frames in tests) in tests/test_zstd_device_dec.py.
"""

from __future__ import annotations

import numpy as np

from compress_tpu import huff0
from compress_tpu.zstd import block as B
from compress_tpu.zstd import seqdev
from compress_tpu.zstd import seqs as S
from compress_tpu.zstd.frame import parse_frame_header


MAX_DEC_BATCH = 512  # frames per device dispatch: (512, 1024, 128) f32
#                      arenas = 256 MiB; larger batches chunk


from compress_tpu.ops.execute import put_sharded as _put_sharded

def _only_trailing_skippables(frame: bytes, end: int):
    """True when frame[end:] is empty or only skippable frames — the item
    must be exactly ONE frame: trailing content frames would be silently
    dropped by the device path (r3 review)."""
    while end < len(frame):
        try:
            t = parse_frame_header(frame, end)
        except Exception:  # noqa: BLE001
            return False
        if not t.skippable:
            return False
        end += t.header_size + t.skippable_size
    return end == len(frame)


def _parse_single_block(frame: bytes):
    try:
        h = parse_frame_header(frame)
    except Exception:  # noqa: BLE001 — malformed: host decode decides
        return None
    if h.skippable:
        return None
    pos = h.header_size
    bh = int.from_bytes(frame[pos : pos + 3], "little")
    pos += 3
    last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
    if not last or btype != B.BLOCK_COMPRESSED:
        return None
    body = frame[pos : pos + bsize]
    end = pos + bsize + (4 if h.has_checksum else 0)
    if not _only_trailing_skippables(frame, end):
        return None
    return body


def _parse_blocks(frame: bytes):
    """Structural multi-block walk: [(btype, regen_or_None, body)] or
    None. regen is the block header size field (output size for RLE
    blocks, body size for raw, compressed size for compressed)."""
    try:
        h = parse_frame_header(frame)
    except Exception:  # noqa: BLE001
        return None
    if h.skippable:
        return None
    pos = h.header_size
    out = []
    while True:
        if pos + 3 > len(frame):
            return None
        bh = int.from_bytes(frame[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 3 or bsize > (1 << 17):
            return None
        raw = 1 if btype == B.BLOCK_RLE else bsize
        if pos + raw > len(frame):
            return None
        out.append((btype, bsize, frame[pos : pos + raw]))
        pos += raw
        if last:
            break
    end = pos + (4 if h.has_checksum else 0)
    if not _only_trailing_skippables(frame, end):
        return None
    return out


def _parse_4x_literals(body: bytes):
    """Parse a compressed-4X literal section; returns (regen, streams,
    huff table arrays, new_pos) or None for other literal shapes."""
    b0 = body[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type != B.LIT_COMPRESSED or size_format == 0:
        return None
    pos = 0
    if size_format == 1:
        v = int.from_bytes(body[:3], "little")
        regen = (v >> 4) & 0x3FF
        comp = v >> 14
        pos = 3
    elif size_format == 2:
        v = int.from_bytes(body[:4], "little")
        regen = (v >> 4) & 0x3FFF
        comp = v >> 18
        pos = 4
    else:
        v = int.from_bytes(body[:5], "little")
        regen = (v >> 4) & 0x3FFFF
        comp = v >> 22
        pos = 5
    if regen < 6:
        return None  # 4-stream needs 4 non-degenerate segments
    sec = body[pos : pos + comp]
    sym_t, nb_t, max_bits, tpos = huff0.read_table(sec, 0)
    sizes = [int.from_bytes(sec[tpos + 2 * k : tpos + 2 * k + 2], "little")
             for k in range(3)]
    sp = tpos + 6
    seg = (regen + 3) // 4
    lens = [seg, seg, seg, regen - 3 * seg]
    streams = []
    for q in range(4):
        size = sizes[q] if q < 3 else comp - sp
        streams.append(sec[sp : sp + size])
        sp += size
    return regen, lens, streams, (sym_t, nb_t, max_bits), pos + comp


def _parse_literals_any(body: bytes, prev_table=None):
    """Parse any literal section (accel path). Returns (kind, regen, lens,
    streams, table, spos): kind 0 = 4X (lens/streams lists of 4 + table),
    1 = raw (streams = literal bytes), 2 = RLE (streams = 1 byte),
    3 = 1X (lens/streams singleton lists + table). Treeless sections
    reuse prev_table (the carried huffman table in multi-block frames)
    and return None without one."""
    b0 = body[0]
    lit_type = b0 & 3
    sf = (b0 >> 2) & 3
    if lit_type in (B.LIT_RAW, B.LIT_RLE):
        if sf in (0, 2):
            regen, pos = b0 >> 3, 1
        elif sf == 1:
            regen, pos = (b0 >> 4) | (body[1] << 4), 2
        else:
            regen = (b0 >> 4) | (body[1] << 4) | (body[2] << 12)
            pos = 3
        if lit_type == B.LIT_RAW:
            return 1, regen, None, body[pos : pos + regen], None, pos + regen
        return 2, regen, None, body[pos : pos + 1], None, pos + 1
    if lit_type == B.LIT_TREELESS:
        if prev_table is None:
            return None
        if sf in (0, 1):
            v = int.from_bytes(body[:3], "little")
            regen, comp, pos = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3
            n_streams = 1 if sf == 0 else 4
        elif sf == 2:
            v = int.from_bytes(body[:4], "little")
            regen, comp, pos = (v >> 4) & 0x3FFF, v >> 18, 4
            n_streams = 4
        else:
            v = int.from_bytes(body[:5], "little")
            regen, comp, pos = (v >> 4) & 0x3FFFF, v >> 22, 5
            n_streams = 4
        sec = body[pos : pos + comp]
        if len(sec) != comp:
            return None
        if n_streams == 1:
            return 3, regen, [regen], [sec], prev_table, pos + comp
        # 4-stream sections need regen >= 6 (RFC 8878 jump table + four
        # non-degenerate segments); regen < 6 would make the 4th segment
        # length negative and silently corrupt output (r3 review)
        if comp < 6 or regen < 6:
            return None
        sizes = [int.from_bytes(sec[2 * k : 2 * k + 2], "little")
                 for k in range(3)]
        sp = 6
        seg = (regen + 3) // 4
        lens = [seg, seg, seg, regen - 3 * seg]
        streams = []
        for q in range(4):
            size = sizes[q] if q < 3 else comp - sp
            if size < 0 or sp + size > comp:
                return None
            streams.append(sec[sp : sp + size])
            sp += size
        return 0, regen, lens, streams, prev_table, pos + comp
    if lit_type != B.LIT_COMPRESSED:
        return None
    if sf == 0:  # 1 stream
        v = int.from_bytes(body[:3], "little")
        regen = (v >> 4) & 0x3FF
        comp = v >> 14
        pos = 3
        sec = body[pos : pos + comp]
        sym_t, nb_t, max_bits, tpos = huff0.read_table(sec, 0)
        return (3, regen, [regen], [sec[tpos:]], (sym_t, nb_t, max_bits),
                pos + comp)
    r = _parse_4x_literals(body)
    if r is None:
        return None
    regen, lens, streams, table, spos = r
    return 0, regen, lens, streams, table, spos


def _resolve_reps(lls, mls, ofvals):
    """Repeat-offset resolution (host; trivial per-seq loop)."""
    r1, r2, r3 = 1, 4, 8
    offs = np.zeros(len(lls), np.int64)
    for i in range(len(lls)):
        ofv = int(ofvals[i])
        if ofv > 3:
            off = ofv - 3
            r1, r2, r3 = off, r1, r2
        else:
            if int(lls[i]) == 0:
                ofv += 1
            if ofv == 1:
                off = r1
            elif ofv == 2:
                off = r2
                r1, r2 = r2, r1
            elif ofv == 3:
                off = r3
                r1, r2, r3 = r3, r1, r2
            else:
                off = r1 - 1
                if off <= 0:
                    # corrupt: every other implementation rejects this
                    # (C++ walker E_CORRUPT, host decoder error) — r3
                    # review #8 alignment
                    raise ValueError("corrupt repeat offset")
                r1, r2, r3 = off, r1, r2
        offs[i] = off
    return offs


def _accel_lit_ok(lit, acc) -> bool:
    """Sanity-check sidecar literal checkpoints before trusting them
    (r3 review #3: a CRC-valid but inconsistent sidecar must degrade to
    the host paths, never silently truncate the literal scan)."""
    kind, regen, lens, streams, _table, _spos = lit
    if kind in (1, 2):
        return True  # raw/RLE carry no checkpoints
    if len(acc.lit_cks) != len(streams):
        return False
    for q, cks in enumerate(acc.lit_cks):
        want_nch = max(1, -(-lens[q] // 32)) if lens[q] > 0 else 1
        if len(cks) != want_nch:
            return False
        if len(cks) and (cks[0] > 8 * len(streams[q]) or cks[-1] < 0):
            return False
        if len(cks) > 1 and not (np.diff(cks) <= 0).all():
            return False  # bit offsets must be non-increasing
    return True


def _prep_multiblock(frame: bytes, accs, hist_blocks: int):
    """Validate a multi-block accel frame and build its per-block literal
    descriptors. Returns (lits, accs, hist_blocks) or None (host
    fallback). lits[k] follows _parse_literals_any's tuple shape."""
    if hist_blocks < 1 or hist_blocks > 128:
        return None
    blocks = _parse_blocks(frame)
    if blocks is None or len(blocks) != len(accs):
        return None
    lits = []
    prev_table = None   # huffman table carry (treeless sections, RFC 8878)
    for (btype, bsize, body), acc in zip(blocks, accs):
        if acc is None:
            return None
        if btype == B.BLOCK_RAW:
            lit = (1, len(body), None, body, None, len(body))
        elif btype == B.BLOCK_RLE:
            lit = (2, bsize, None, body[:1], None, 1)
        else:
            lit = _parse_literals_any(body, prev_table)
            if lit is None:
                return None
            if lit[4] is not None:
                prev_table = lit[4]
        if lit[0] != acc.lit_kind or lit[1] != acc.regen \
                or not _accel_lit_ok(lit, acc):
            return None
        lits.append(lit)
    return lits, accs, hist_blocks


def decompress_frames_device(frames, max_rounds: int = 4, mesh=None):
    """Batched device decode; returns list of bytes. See module doc.

    Frames may be preceded by an encoder-emitted accel sidecar (a
    skippable frame, zstd/accel.py): those decode with ZERO per-symbol
    host work — literal/sequence checkpoints and the execute plan come
    from the sidecar (r3, VERDICT r2 missing #1). Plain frames keep the
    r2 host-walk (`make_accel`-style) path; unsupported shapes fall back
    to the host decoder.

    mesh: optional jax.sharding.Mesh with a 'data' axis — the literal
    scan and execute batches shard over it (frames are independent, so
    decode scales batch-parallel across chips; reference P4/P5 role at
    pod scale). Use parallel.engine.zstd_decode_sharded for the
    all-devices default.

    Batches beyond MAX_DEC_BATCH frames dispatch in chunks so the
    execute arena (B, 1024, 128) f32 stays memory-bounded."""
    if len(frames) > MAX_DEC_BATCH:
        out = []
        for lo in range(0, len(frames), MAX_DEC_BATCH):
            out.extend(decompress_frames_device(
                frames[lo : lo + MAX_DEC_BATCH], max_rounds, mesh))
        return out
    import jax.numpy as jnp

    from compress_tpu import zstd as Z
    from compress_tpu.ops import entropy_dec as ED
    from compress_tpu.ops import execute as X
    from compress_tpu.zstd import accel as AC

    metas = []
    hconts = []      # huff0-like pseudo containers for the literal stage
    for frame in frames:
        frame = bytes(frame)
        side_payload, frame = AC.split_sidecar(frame)
        acc = None
        if side_payload is not None:
            try:
                hist_blocks, ab = AC.parse_sidecar(side_payload)
            except (ValueError, IndexError):
                hist_blocks, ab = 0, None
            if ab is not None and len(ab) == 1:
                acc = ab[0]
            elif ab is not None and len(ab) > 1:
                mb = _prep_multiblock(frame, ab, hist_blocks)
                if mb is not None:
                    metas.append(("accel_mb", (mb, frame)))
                    continue
        body = _parse_single_block(frame)
        if body is None:
            metas.append(("host", frame))
            continue
        if acc is not None:
            lit = _parse_literals_any(body)
            if lit is not None and lit[0] == acc.lit_kind \
                    and lit[1] == acc.regen \
                    and _accel_lit_ok(lit, acc):
                # sidecar-accelerated: checkpoints + plan ship in-band
                metas.append(("accel", (lit, acc, frame)))
                continue
        lit = _parse_4x_literals(body)
        if lit is None:
            metas.append(("host", frame))
            continue
        regen, lens, streams, table, spos = lit
        # sequences section
        try:
            hist = B.History(window_size=1 << 16)
            n_seqs, q = 0, spos
            b0 = body[q]
            q += 1
            if b0 == 0:
                metas.append(("host", frame))
                continue
            if b0 < 128:
                n_seqs = b0
            elif b0 < 255:
                n_seqs = ((b0 - 128) << 8) + body[q]
                q += 1
            else:
                n_seqs = int.from_bytes(body[q : q + 2], "little") + 0x7F00
                q += 2
            modes = body[q]
            q += 1
            t_ll, q = B._read_table(body, q, (modes >> 6) & 3, "ll", hist,
                                    None)
            t_of, q = B._read_table(body, q, (modes >> 4) & 3, "of", hist,
                                    None)
            t_ml, q = B._read_table(body, q, (modes >> 2) & 3, "ml", hist,
                                    None)
            stream = body[q:]
        except (B.BlockError, ValueError):
            metas.append(("host", frame))
            continue
        metas.append(("dev", (regen, lens, streams, table,
                              (stream, n_seqs, t_ll, t_of, t_ml))))

    # ---- literals on device (batched huff0 scan) --------------------------
    # keyed by meta index i (single-block) or (i, k) (multi-block)
    lit_decoded = {}

    def _lit_item(key, lit, acc):
        """Queue one literal section for the batched scan (or resolve
        raw/RLE immediately). Returns an items entry or None."""
        lkind, regen, lens, streams, table, _spos = lit
        if lkind == 1:      # raw literals: bytes ship in the frame
            lit_decoded[key] = streams
            return None
        if lkind == 2:      # RLE
            lit_decoded[key] = streams * regen
            return None
        sym_t, nb_t, max_bits = table
        trip = [(streams[q], acc.lit_cks[q], lens[q])
                for q in range(len(streams))]
        return (key, trip, ED.expand_table(sym_t, nb_t, max_bits))

    items = []   # (key, [(stream, cks, n_syms)], table)
    for i, (kind, m) in enumerate(metas):
        if kind == "dev":
            regen, lens, streams, (sym_t, nb_t, max_bits), _seq = m
            trip = []
            for q in range(4):
                cks = np.array(_hwalk(streams[q], sym_t, nb_t, max_bits,
                                      lens[q], 32), np.int64)
                trip.append((streams[q], cks, lens[q]))
            items.append((i, trip, ED.expand_table(sym_t, nb_t, max_bits)))
        elif kind == "accel":
            lit, acc, _fr = m
            it = _lit_item(i, lit, acc)
            if it is not None:
                items.append(it)
        elif kind == "accel_mb":
            (lits, accs, _hb), _fr = m
            for k, (lit, acc) in enumerate(zip(lits, accs)):
                it = _lit_item((i, k), lit, acc)
                if it is not None:
                    items.append(it)
    if items:
        K = 32
        built = []
        for i, trip, _t in items:
            per = []
            for stream, cks, n_sym in trip:
                nch = len(cks)
                w, lb = ED.build_windows(stream, np.asarray(cks, np.int64),
                                         nch)
                ns = np.clip(n_sym - K * np.arange(nch), 0, K)
                per.append((w, lb, ns.astype(np.int32), n_sym))
            built.append(per)
        cmax = max(sum(len(p[1]) for p in per) for per in built)
        Nd = len(items)
        windows = np.zeros((Nd, cmax, ED.WIN), np.uint8)
        lbit = np.full((Nd, cmax), 8 * ED.WIN, np.int32)
        nsym = np.zeros((Nd, cmax), np.int32)
        tarr = np.stack([t for (_i, _tr, t) in items])
        for j, per in enumerate(built):
            base = 0
            for w, lb, ns, _n in per:
                nc = len(lb)
                windows[j, base : base + nc] = w
                lbit[j, base : base + nc] = lb
                nsym[j, base : base + nc] = ns
                base += nc
        syms, _ = ED.huff0_decode_chunks(
            _put_sharded(mesh, windows, 0), _put_sharded(mesh, lbit, 0),
            _put_sharded(mesh, nsym, 0), _put_sharded(mesh, tarr, 0), k=K)
        syms = np.asarray(syms, np.int32)
        for j, (i, _tr, _t) in enumerate(items):
            parts = []
            base = 0
            for w, lb, ns, n_sym in built[j]:
                nc = len(lb)
                parts.append(syms[j, base : base + nc].reshape(-1)[:n_sym]
                             .astype(np.uint8).tobytes())
                base += nc
            lit_decoded[i] = b"".join(parts)

    # ---- sequences on device ---------------------------------------------
    seq_items = [m[1][4] for m in metas if m[0] == "dev"]
    # resolve=True: repeat offsets resolve ON DEVICE in the scan carry
    # (r3 kernel); no per-sequence host loop remains in this path either
    seq_out = (seqdev.decode_sequences_device(seq_items, resolve=True)
               if seq_items else [])

    # ---- execute on device ------------------------------------------------
    plans, lit_rows, order = [], [], []
    mb_groups = {}   # hist_blocks -> [(i, plans_k, lits_k)]
    si = 0
    results = [None] * len(frames)
    for i, (kind, m) in enumerate(metas):
        if kind == "host":
            from compress_tpu import zstd as Zm

            results[i] = Zm.decompress(m)
            continue
        if kind == "accel_mb":
            from compress_tpu.zstd import accel as AC2

            (lits_k, accs, hb), fr = m
            try:
                plans_k = [AC2.accel_plan(a, hb) for a in accs]
            except ValueError:
                from compress_tpu import zstd as Zm

                results[i] = Zm.decompress(fr)
                continue
            mb_groups.setdefault(hb, []).append(
                (i, plans_k, [lit_decoded[(i, k)]
                              for k in range(len(accs))]))
            continue
        lits = lit_decoded[i]
        if kind == "accel":
            from compress_tpu.zstd import accel as AC2

            try:
                plans.append(AC2.accel_plan(m[1]))
            except ValueError:
                # inconsistent sidecar: decode the frame on host instead
                from compress_tpu import zstd as Zm

                results[i] = Zm.decompress(m[2])
                continue
        else:
            regen, lens, streams, table, (stream, n_seqs, *_t) = m
            lls, mls, ofvals, offs = seq_out[si]
            si += 1
            # op list: per sequence a literal run + a copy; trailing literals
            kinds_l, lens_l, offs_l = [], [], []
            for t in range(len(lls)):
                if lls[t]:
                    kinds_l.append(0)
                    lens_l.append(int(lls[t]))
                    offs_l.append(0)
                kinds_l.append(1)
                lens_l.append(int(mls[t]))
                offs_l.append(int(offs[t]))
            consumed = int(np.sum(lls))
            if consumed < len(lits):
                kinds_l.append(0)
                lens_l.append(len(lits) - consumed)
                offs_l.append(0)
            plans.append(X.plan_block_ops(np.array(kinds_l),
                                          np.array(lens_l),
                                          np.array(offs_l),
                                          max_rounds=max_rounds))
        arr = np.zeros(512 * 128, np.uint8)
        arr[: len(lits)] = np.frombuffer(lits, np.uint8)
        lit_rows.append(arr.reshape(512, 128))
        order.append(i)
    if plans:
        src, dst, length, caps = X.pack_plans(plans)
        import jax as _jax

        use_pallas = mesh is None and _jax.devices()[0].platform not in (
            "cpu",)
        if use_pallas:
            # Pallas VMEM-arena executor (ops/exec_pallas.py): 2x the
            # XLA round graph on chip, bit-identical (differential-tested)
            from compress_tpu.ops import exec_pallas as XP

            out = XP.execute_rounds_pallas(
                jnp.asarray(np.stack(lit_rows)), jnp.asarray(src),
                jnp.asarray(dst), jnp.asarray(length), caps)
        else:
            out = X.execute_rounds_jit(
                _put_sharded(mesh, np.stack(lit_rows), 0),
                _put_sharded(mesh, src, 1), _put_sharded(mesh, dst, 1),
                _put_sharded(mesh, length, 1), caps)
        out = np.asarray(out, np.uint8).reshape(-1, 512 * 128)
        for j, i in enumerate(order):
            n_out = int(np.sum(plans[j]["len"]))
            results[i] = out[j, :n_out].tobytes()

    # multi-block frames: scan executor with the carried history tensor,
    # one dispatch per history size (hist_rows is a static kernel shape)
    for hb, group in mb_groups.items():
        try:
            plans_kb = [g[1] for g in group]
            (hsrc, hdst, hlen, src, dst, length, advance, caps,
             _hcap) = X.pack_plans_mb(plans_kb, hb << 16)
            K = hsrc.shape[0]
            Bn = len(group)
            lit_kb = np.zeros((K, Bn, 512 * 128), np.uint8)
            for b, (_i, p_k, lits_k) in enumerate(group):
                for k, lits in enumerate(lits_k):
                    lit_kb[k, b, : len(lits)] = np.frombuffer(lits, np.uint8)
            outs = X.execute_blocks_hist_jit(
                _put_sharded(mesh, lit_kb.reshape(K, Bn, 512, 128), 1),
                _put_sharded(mesh, hsrc, 2), _put_sharded(mesh, hdst, 2),
                _put_sharded(mesh, hlen, 2), _put_sharded(mesh, src, 2),
                _put_sharded(mesh, dst, 2), _put_sharded(mesh, length, 2),
                _put_sharded(mesh, advance, 1), caps, hb * 512)
            outs = np.asarray(outs, np.uint8).reshape(K, -1, 512 * 128)
        except ValueError as e:
            # hostile/inconsistent sidecar plans (e.g. a history piece
            # tagged round > 0): host-decode this group, keep the batch.
            # Logged loudly — accel_plan already validated the common
            # hostile cases, so reaching here usually means a packing or
            # kernel regression silently degrading to host decode.
            from compress_tpu import zstd as Zm
            from compress_tpu.utils.debuglog import dbg

            dbg("device_dec", "multi-block group fell back to host:", e)
            for i, _p, _l in group:
                results[i] = Zm.decompress(metas[i][1][1])
            continue
        for b, (i, p_k, _l) in enumerate(group):
            parts = []
            for k, p in enumerate(p_k):
                n_out = int(np.sum(p["len"]))
                parts.append(outs[k, b, :n_out].astype(np.uint8).tobytes())
            results[i] = b"".join(parts)
    return results


def _hwalk(stream: bytes, sym_t, nb_t, max_bits: int, out_len: int,
           k: int):
    """Host walk of one huff0 stream recording remaining bits every k."""
    from compress_tpu.fse import core as fse_core

    br = fse_core.BitReaderReverse(stream)
    bitpos = br.bitpos
    data = stream
    cks = [bitpos]
    for i in range(out_len):
        bp = bitpos - max_bits
        if bp >= 0:
            b0 = bp >> 3
            chunk = int.from_bytes(data[b0 : b0 + 9], "little")
            w = (chunk >> (bp & 7)) & ((1 << max_bits) - 1)
        else:
            chunk = int.from_bytes(data[0:9], "little")
            w = (chunk << -bp) & ((1 << max_bits) - 1)
        nb = int(nb_t[w])
        if nb > bitpos:
            nb = bitpos
        bitpos -= nb
        if (i + 1) % k == 0 and i + 1 < out_len:
            cks.append(bitpos)
    return cks
