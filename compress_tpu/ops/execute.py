"""Device LZ execute — the decode-side core (reference roles:
zstd/seqdec_amd64.s sequence execution and s2/decode_amd64.s, re-designed
for TPU as batched op-space routing instead of a sequential byte loop).

Architecture (measured rationale in docs/tpu_design_notes.md and
experiments/):

- Each 64KB block decodes inside a (1024, 128) byte **arena**: rows
  0..511 hold the block's literal bytes (pre-resolved by the entropy
  stage), rows 512..1023 receive the output.
- The op stream is prepared ON THE ENCODE SIDE (we own the encoder; the
  plan ships in a skippable side-channel frame, foreign frames use the
  native host decoder). `plan_block_ops` turns decode-order LZ ops
  (literal runs + copies) into dst-row-aligned **pieces** with a
  precomputed execution **round**, using per-byte effective-source
  substitution: a copy whose source region is already resolvable at
  round <= r reads the transitive source directly. `max_rounds=1`
  fully flattens (every piece reads the literal arena, one round);
  larger budgets trade side-channel size for rounds.
- On device, each round is three fused batched stages, all
  route_tiles-class einsums chunked to keep one-hots small (measured:
  unchunked one-hot einsums are pathological, chunked run at MXU speed):
    1. gather each piece's 2-row source strip from the arena,
    2. rotate strip lanes by (src - dst) mod 128 via DFT phase shift
       (two static 128x128 cos/sin matmuls — no per-op rotation
       matrices),
    3. mask to the piece's dst lanes and one-hot sum-route into the
       arena (each output byte is covered by exactly one piece, so
       sum-routing is exact).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

def put_sharded(mesh, arr, axis: int):
    """Pad `axis` to a multiple of the mesh size and place the array
    sharded over it ('data' axis). mesh=None -> plain device array.
    Padding rows are no-ops by construction (zero lengths / zero symbol
    counts), so the kernels ignore them and callers slice by the
    original batch size."""
    if mesh is None:
        return jnp.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec

    nd = int(mesh.devices.size)
    arr = np.asarray(arr)
    pad = (-arr.shape[axis]) % nd
    if pad:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        arr = np.pad(arr, widths)
    spec = [None] * arr.ndim
    spec[axis] = "data"
    return jax.device_put(arr, NamedSharding(mesh, PartitionSpec(*spec)))


ARENA_ROWS = 1024      # 512 literal rows + 512 output rows
OUT_BASE = 512 * 128   # arena byte where output begins
HIST_BASE = ARENA_ROWS * 128  # history address space (multi-block frames)
BLOCK = 1 << 16


# ---------------------------------------------------------------------------
# Host-side planner (encode side; ships in the side channel)
# ---------------------------------------------------------------------------


def plan_block_ops(kinds, lens, offs, max_rounds=4):
    """Plan decode-order ops into round-annotated dst-row-aligned pieces.

    kinds: 0 = literal run (consumes the next `len` literal bytes),
           1 = copy at offset `off` (into the output written so far).
    Returns dict of np arrays: src (arena byte), dst (arena byte), length,
    round; plus n_rounds. Every output byte is covered by exactly one
    piece. max_rounds >= 1; deeper dependencies are rewritten through
    transitive sources (growing the piece count instead of the depth).
    """
    kinds = np.asarray(kinds)
    lens = np.asarray(lens, np.int64)
    offs = np.asarray(offs, np.int64)
    total = int(lens.sum())
    if total > BLOCK:
        raise ValueError("block too large")
    # per OUTPUT byte: effective arena source byte + earliest readable round
    esrc = np.zeros(total, np.int64)
    ernd = np.zeros(total, np.int16)
    pieces_src = []
    pieces_dst = []
    pieces_len = []
    pieces_rnd = []

    def emit(d0, s_arr, r_arr):
        """Emit pieces for dst range starting at d0 with per-byte arena
        sources s_arr (round r_arr), splitting at non-contiguous source
        bytes, round changes, and dst row boundaries."""
        L = len(s_arr)
        if L == 0:
            return
        cut = np.flatnonzero(
            (np.diff(s_arr) != 1) | (np.diff(r_arr) != 0)) + 1
        bounds = np.concatenate([[0], cut, [L]])
        for a, b in zip(bounds[:-1], bounds[1:]):
            d = d0 + int(a)
            s = int(s_arr[a])
            ln = int(b - a)
            r = int(r_arr[a])
            while ln > 0:
                room = 128 - ((OUT_BASE + d) & 127)
                take = min(ln, room)
                pieces_src.append(s)
                pieces_dst.append(OUT_BASE + d)
                pieces_len.append(take)
                pieces_rnd.append(r)
                d += take
                s += take
                ln -= take

    pos = 0       # output cursor
    lit_pos = 0   # literal buffer cursor
    for k in range(len(kinds)):
        L = int(lens[k])
        if kinds[k] == 0:
            # literal run: source the literal arena rows (round 0)
            src_bytes = np.arange(lit_pos, lit_pos + L, dtype=np.int64)
            rr = np.zeros(L, np.int16)
            emit(pos, src_bytes, rr)
            esrc[pos : pos + L] = src_bytes
            ernd[pos : pos + L] = 0
            lit_pos += L
            pos += L
        else:
            off = int(offs[k])
            if off <= 0 or off > pos:
                raise ValueError("bad offset")
            # source positions in output space, with overlap wrap
            rel = np.arange(L, dtype=np.int64)
            sp = pos - off + (rel % off if off < L else rel)
            s_sub = esrc[sp]
            r_sub = ernd[sp]
            rnd_direct = int(r_sub.max()) + 1
            if rnd_direct <= max_rounds:
                # keep as one piece chain reading the transitive sources
                # only when that does not fragment; otherwise read the
                # output bytes directly (contiguous) one round later
                if off >= L:
                    frag = (np.diff(s_sub) != 1).any() or (
                        np.diff(r_sub) != 0).any()
                    if not frag:
                        emit(pos, s_sub, np.full(L, rnd_direct - 1, np.int16))
                        esrc[pos : pos + L] = s_sub
                        ernd[pos : pos + L] = r_sub
                        pos += L
                        continue
                src_bytes = OUT_BASE + sp
                rr = np.full(L, rnd_direct, np.int16)
                emit(pos, src_bytes, rr)
                esrc[pos : pos + L] = src_bytes
                ernd[pos : pos + L] = rnd_direct
                pos += L
            else:
                # too deep: substitute transitive sources (flatten)
                emit(pos, s_sub, r_sub)
                esrc[pos : pos + L] = s_sub
                ernd[pos : pos + L] = r_sub
                pos += L
    n_rounds = int(max(pieces_rnd)) + 1 if pieces_rnd else 1
    return {
        "src": np.array(pieces_src, np.int32),
        "dst": np.array(pieces_dst, np.int32),
        "len": np.array(pieces_len, np.int32),
        "round": np.array(pieces_rnd, np.int32),
        "n_rounds": n_rounds,
    }


def pack_plans(plans, round_caps=None):
    """Stack per-block plans into per-round padded tensors.

    Returns (src, dst, length) of shape (R_total_padded, B) laid out
    round-major with static per-round capacities, plus the caps list.
    Padded slots get len=0 (masked out on device)."""
    B = len(plans)
    n_rounds = max(p["n_rounds"] for p in plans)
    if round_caps is None:
        round_caps = []
        for r in range(n_rounds):
            cap = max(int((p["round"] == r).sum()) for p in plans)
            # bucket to limit jit recompilation across inputs
            cap = max(64, 1 << int(np.ceil(np.log2(max(cap, 1)))))
            round_caps.append(cap)
    total = sum(round_caps)
    src = np.zeros((total, B), np.int32)
    dst = np.full((total, B), OUT_BASE, np.int32)
    length = np.zeros((total, B), np.int32)
    # vectorized placement: per plan, one stable sort by round + one
    # scatter (the r3 per-(round, block) masked loops cost ~15 ms/frame —
    # the dominant host wall in decompress_frames_device, measured r4)
    caps_arr = np.asarray(round_caps, np.int64)
    bases = np.concatenate([[0], np.cumsum(caps_arr)])[:-1]
    for b, p in enumerate(plans):
        rnd = p["round"]
        order = np.argsort(rnd, kind="stable")
        rs = rnd[order]
        counts = np.bincount(rs, minlength=len(round_caps))
        if (counts > caps_arr).any():
            raise ValueError("round capacity overflow")
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        # destination slot for sorted piece i: bases[r] + (i - starts[r])
        idx = bases[rs] + np.arange(len(rs)) - starts[rs]
        src[idx, b] = p["src"][order]
        dst[idx, b] = p["dst"][order]
        length[idx, b] = p["len"][order]
    return src, dst, length, tuple(round_caps)


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dft_tables():
    # numpy constants (safe to cache across jit traces; jnp conversion
    # happens at use so each trace gets its own constant)
    k = np.arange(128)
    ang = 2.0 * np.pi * np.outer(k, k) / 128.0
    C = np.cos(ang).astype(np.float32)          # (l, k) forward cos
    S = np.sin(ang).astype(np.float32)
    d = np.arange(128)
    pang = 2.0 * np.pi * np.outer(d, k) / 128.0
    PC = np.cos(pang).astype(np.float32)        # (delta, k) phase cos
    PS = np.sin(pang).astype(np.float32)
    return C, S, PC, PS


def _rotate_lanes(rows, delta):
    """rows: (..., 128) f32; delta: (...) int32 in [0,128).
    Returns rows rotated left by delta: out[m] = rows[(m+delta) % 128].
    DFT phase shift: two static 128x128 matmuls + per-item phase."""
    Cn, Sn, PCn, PSn = _dft_tables()
    C, S = jnp.asarray(Cn), jnp.asarray(Sn)
    PC, PS = jnp.asarray(PCn), jnp.asarray(PSn)
    hp = jax.lax.Precision.HIGHEST
    a = jnp.matmul(rows, C, precision=hp)   # (..., k)
    b = jnp.matmul(rows, S, precision=hp)
    oh = jax.nn.one_hot(delta, 128, dtype=jnp.float32)
    cph = jnp.matmul(oh, PC, precision=hp)  # cos(2 pi delta k / 128)
    sph = jnp.matmul(oh, PS, precision=hp)
    A = a * cph + b * sph
    Bb = b * cph - a * sph
    out = (jnp.matmul(A, C.T, precision=hp)
           + jnp.matmul(Bb, S.T, precision=hp)) / 128.0
    return jnp.round(out)


def _round_step(arena, src, dst, length, chunk, source=None):
    """One execute round. arena (B, AR, 128) f32. src/dst/len (B, N).

    source (B, R, 128) overrides the gather source (default: the arena
    itself) — the multi-block path routes history-tensor pieces with the
    carried history as the source; dst always lands in the arena.

    Chunks run under lax.scan (NOT an unrolled Python loop): M-scaled
    arenas with many pieces made the unrolled graph pathological to
    compile (>4 min on CPU for a 256 KiB-class block batch)."""
    B, N = src.shape
    if source is None:
        source = arena
    src_rows = source.shape[1]
    arena_rows = arena.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    Np = -(-N // chunk) * chunk

    def prep(x):
        return jnp.pad(x, ((0, 0), (0, Np - N))).reshape(
            B, Np // chunk, chunk).transpose(1, 0, 2)

    ab = source.astype(jnp.bfloat16)

    def body(add, xs):
        s, d, ln = xs
        b0 = d & 127
        g0 = s - b0                     # lane-aligned source base
        delta = g0 % 128                # jnp: result in [0,128) even g0<0
        r0 = (g0 - delta) // 128
        oh0 = jax.nn.one_hot(jnp.clip(r0, 0, src_rows - 1), src_rows,
                             dtype=jnp.bfloat16)
        oh1 = jax.nn.one_hot(jnp.clip(r0 + 1, 0, src_rows - 1),
                             src_rows, dtype=jnp.bfloat16)
        row0 = jnp.einsum("bcs,bsl->bcl", oh0, ab,
                          preferred_element_type=jnp.float32)
        row1 = jnp.einsum("bcs,bsl->bcl", oh1, ab,
                          preferred_element_type=jnp.float32)
        rot0 = _rotate_lanes(row0, delta)
        rot1 = _rotate_lanes(row1, delta)
        # lane m of the aligned strip: from row0 while m + delta < 128
        use0 = (lane + delta[..., None]) < 128
        strip = jnp.where(use0, rot0, rot1)
        mask = (lane >= b0[..., None]) & (lane < (b0 + ln)[..., None])
        strip = jnp.where(mask, strip, 0.0)
        ohd = jax.nn.one_hot(d >> 7, arena_rows, dtype=jnp.bfloat16)
        add = add + jnp.einsum("bcs,bcl->bsl", ohd,
                               strip.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        return add, None

    add, _ = jax.lax.scan(body, jnp.zeros_like(arena),
                          (prep(src), prep(dst), prep(length)))
    return arena + add


def execute_rounds(lit_rows, src, dst, length, round_caps, chunk=512):
    """Run the planned rounds. lit_rows (B, LR, 128) byte values (u8 or
    f32 — u8 keeps the host->device transfer 4x smaller; cast happens on
    device). LR = 512 * M for the M-scaled arena class (>64 KiB s2
    blocks); the output region mirrors it. src/dst/length: (total, B)
    round-major per pack_plans. Returns (B, LR, 128) output rows."""
    B, LR = lit_rows.shape[0], lit_rows.shape[1]
    arena = jnp.concatenate(
        [lit_rows.astype(jnp.float32),
         jnp.zeros((B, LR, 128), jnp.float32)], axis=1)
    base = 0
    for cap in round_caps:
        sl = slice(base, base + cap)
        arena = _round_step(arena,
                            src[sl].T, dst[sl].T, length[sl].T, chunk)
        base += cap
    return arena[:, LR:, :].astype(jnp.uint8)


execute_rounds_jit = jax.jit(execute_rounds, static_argnames=("round_caps",
                                                              "chunk"))


# ---------------------------------------------------------------------------
# Multi-block frames: lax.scan over 64 KiB blocks with a carried history
# tensor (reference role: zstd window/history across blocks,
# zstd/history.go — re-designed as a static 512-row shift per step)
# ---------------------------------------------------------------------------


def pack_plans_mb(plans_kb, hist_cap_bytes):
    """Stack per-frame, per-block plans for the scan executor.

    plans_kb: list over frames of lists over blocks of plan dicts
    (frames may have different block counts; shorter frames pad with
    no-op steps). Pieces with src >= HIST_BASE are split into the
    round-0 history-routing stage, with src rebased to the history
    tensor (0..hist_cap_bytes).

    Returns (hsrc, hdst, hlen, src, dst, length, advance, round_caps,
    hcap): h* are (K, hcap, B); src/dst/length (K, total, B) round-major;
    advance (K, B) f32."""
    Bn = len(plans_kb)
    K = max(len(pb) for pb in plans_kb)
    n_rounds = 1
    hmax = 1
    for pb in plans_kb:
        for p in pb:
            n_rounds = max(n_rounds, p["n_rounds"])
            hmax = max(hmax, int((p["src"] >= HIST_BASE).sum()))
    hcap = max(64, 1 << int(np.ceil(np.log2(hmax))))
    round_caps = []
    for r in range(n_rounds):
        cap = 1
        for pb in plans_kb:
            for p in pb:
                local = p["src"] < HIST_BASE
                cap = max(cap, int((local & (p["round"] == r)).sum()))
        round_caps.append(max(64, 1 << int(np.ceil(np.log2(cap)))))
    total = sum(round_caps)
    hsrc = np.zeros((K, hcap, Bn), np.int32)
    hdst = np.full((K, hcap, Bn), OUT_BASE, np.int32)
    hlen = np.zeros((K, hcap, Bn), np.int32)
    src = np.zeros((K, total, Bn), np.int32)
    dst = np.full((K, total, Bn), OUT_BASE, np.int32)
    length = np.zeros((K, total, Bn), np.int32)
    advance = np.zeros((K, Bn), np.float32)
    for b, pb in enumerate(plans_kb):
        for k, p in enumerate(pb):
            advance[k, b] = 1.0
            hist = p["src"] >= HIST_BASE
            hn = int(hist.sum())
            if hn:
                if int(p["round"][hist].max()) != 0:
                    raise ValueError("history piece beyond round 0")
                hs = p["src"][hist].astype(np.int64) - HIST_BASE
                if hs.min() < 0 or int(
                        (hs + p["len"][hist]).max()) > hist_cap_bytes:
                    raise ValueError("history source out of range")
                hsrc[k, :hn, b] = hs
                hdst[k, :hn, b] = p["dst"][hist]
                hlen[k, :hn, b] = p["len"][hist]
            base = 0
            for r, cap in enumerate(round_caps):
                m = (~hist) & (p["round"] == r)
                cnt = int(m.sum())
                if cnt > cap:
                    raise ValueError("round capacity overflow")
                src[k, base : base + cnt, b] = p["src"][m]
                dst[k, base : base + cnt, b] = p["dst"][m]
                length[k, base : base + cnt, b] = p["len"][m]
                base += cap
    return (hsrc, hdst, hlen, src, dst, length, advance,
            tuple(round_caps), hcap)


def execute_blocks_hist(lit_rows, hsrc, hdst, hlen, src, dst, length,
                        advance, round_caps, hist_rows, chunk=512):
    """Scan the blocks of B frames with a carried history tensor.

    lit_rows (K, B, 512, 128) byte values (u8 or f32; cast on device);
    h*/(src,dst,length) per pack_plans_mb; advance (K, B) — 1.0 shifts
    this frame's history after the step (padded no-op steps pass 0.0).
    hist_rows static (hist_blocks * 512).
    Returns (K, B, 512, 128) output rows (u8)."""
    Bn = lit_rows.shape[1]
    H0 = jnp.zeros((Bn, hist_rows, 128), jnp.float32)

    def step(H, xs):
        lit, hs, hd, hl, s, d, ln, adv = xs
        arena = jnp.concatenate(
            [lit.astype(jnp.float32),
             jnp.zeros((Bn, 512, 128), jnp.float32)], axis=1)
        # history pieces route first (round 0: sources fully resolved)
        arena = _round_step(arena, hs.T, hd.T, hl.T, chunk, source=H)
        base = 0
        for cap in round_caps:
            sl = slice(base, base + cap)
            arena = _round_step(arena, s[sl].T, d[sl].T, ln[sl].T, chunk)
            base += cap
        out = arena[:, 512:, :]
        new_h = jnp.concatenate([H[:, 512:, :], out], axis=1)
        H = jnp.where(adv[:, None, None] > 0, new_h, H)
        return H, out

    _, outs = jax.lax.scan(
        step, H0, (lit_rows, hsrc, hdst, hlen, src, dst, length, advance))
    return outs.astype(jnp.uint8)


execute_blocks_hist_jit = jax.jit(
    execute_blocks_hist, static_argnames=("round_caps", "hist_rows",
                                          "chunk"))
