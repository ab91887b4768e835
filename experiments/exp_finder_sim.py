"""Numpy simulation of the Pallas hash-table match finder semantics.

Tunes (table size T, ways, probe/insert stride, suffix length L_CAP)
against the current sort-based exact-nearest finder before any kernel is
written: the bench bar is ratio <= 0.59 on Twain AND >= 1 GB/s, so the
finder's match quality budget is thin.

Semantics simulated (must match the kernel exactly):
  - waves of W=128 positions; wave k probes the table state after wave
    k-1 (within-wave matches invisible to the hash; short offsets are
    covered by the separate rle/shift-compare probes).
  - per slot: `ways` entries, LRU shift on insert; last-writer-wins
    within a wave (numpy sim: plain sequential insert is equivalent
    except for the rare collided-wave poisoning, modelled too).
  - candidate valid if tag (injective with slot) matches; match length
    = 4 + common prefix of stored suffix bytes, capped at L_CAP, then
    chain-extended by the existing _chain_extend/_rle machinery.

Usage: python experiments/exp_finder_sim.py
"""

import sys, time, zipfile

sys.path.insert(0, "/root/repo")
import numpy as np

M = np.uint32(0x9E3779B1)
B = 1 << 16


def v32_of(block):
    b = np.concatenate([block, np.zeros(20, np.uint8)]).astype(np.uint32)
    v = b[:B] | (b[1:B+1] << 8) | (b[2:B+2] << 16) | (b[3:B+3] << 24)
    return v


def sim_hash_finder(block, T=1024, ways=2, stride=1, l_cap=16, W=128):
    """Returns (off, L) arrays, wave-accurate."""
    bs = len(block)
    v = v32_of(block)
    u = (v * M)  # uint32 wrap
    tbits = int(np.log2(T))
    slot = (u >> np.uint32(32 - tbits)).astype(np.int64)
    off = np.zeros(bs, np.int32)
    L = np.zeros(bs, np.int32)
    # table: pos per (slot, way); -1 empty
    tab = np.full((T, ways), -1, np.int64)
    ext = np.concatenate([block, np.zeros(l_cap + 4, np.uint8)])
    for w0 in range(0, bs, W):
        idx = np.arange(w0, min(w0 + W, bs))
        idx = idx[idx % stride == 0]
        if len(idx) == 0:
            continue
        s = slot[idx]
        cands = tab[s]  # (n, ways)
        # probe: candidate valid if v32 equal (tag check == exact equality
        # given injective tag) and pos < i
        for j, i in enumerate(idx):
            best_l, best_c = 0, -1
            for c in cands[j]:
                if c < 0 or c >= i:
                    continue
                if v[c] != v[i]:
                    continue
                # match length from stored suffix (cap l_cap)
                l = 4
                while l < l_cap and i + l < bs and ext[c + l] == ext[i + l]:
                    l += 1
                if l > best_l:
                    best_l, best_c = l, c
            if best_c >= 0:
                off[i] = i - best_c
                L[i] = best_l
        # insert (last-writer-wins per slot within wave)
        lastw = {}
        for i in idx:
            lastw[slot[i]] = i
        for s_, i in lastw.items():
            tab[s_, 1:] = tab[s_, :-1]
            tab[s_, 0] = i
    return off, L


def sim_sort_finder(block, l_cap=16):
    """Current device finder: exact nearest previous equal v32, length
    from carried suffix words (cap 16)."""
    bs = len(block)
    v = v32_of(block)
    order = np.lexsort((np.arange(bs), v))
    vs = v[order]
    same = np.concatenate([[False], vs[1:] == vs[:-1]])
    cand_s = np.where(same, np.concatenate([[-1], order[:-1]]), -1)
    cand = np.zeros(bs, np.int64)
    cand[order] = cand_s
    ext = np.concatenate([block, np.zeros(l_cap + 4, np.uint8)])
    off = np.zeros(bs, np.int32)
    L = np.zeros(bs, np.int32)
    for i in range(bs):
        c = cand[i]
        if c < 0:
            continue
        l = 4
        while l < l_cap and i + l < bs and ext[c + l] == ext[i + l]:
            l += 1
        off[i] = i - c
        L[i] = l
    return off, L


def rle_and_chain(block, off, L, l_cap):
    """Apply the shift-compare short-offset probes and chain extension
    (ports of ops/lz2.py _rle_lengths and _chain_extend in numpy)."""
    bs = len(block)
    bi = block.astype(np.int32)
    idx = np.arange(bs)
    best_L = L.copy()
    best_off = off.copy()
    # chain extension at l_cap
    nxt_off = np.concatenate([best_off[l_cap:], np.zeros(l_cap, np.int32)])
    cont = (best_L == l_cap) & (nxt_off == best_off) & (best_off > 0)
    # iterate: extend runs (simple O(n) walk, sim only)
    Lx = best_L.copy()
    for i in range(bs - l_cap - 1, -1, -1):
        if cont[i]:
            Lx[i] = l_cap + Lx[i + l_cap]
    best_L = Lx
    for o in (1, 2, 3, 4, 8):
        m = np.concatenate([np.zeros(o, bool), bi[o:] == bi[:-o]])
        mismatch_at = np.where(m, bs, idx)
        next_mm = np.minimum.accumulate(mismatch_at[::-1])[::-1]
        Lr = np.where(m, next_mm - idx, 0)
        better = Lr > best_L
        better &= Lr >= 4
        best_L = np.where(better, Lr, best_L)
        best_off = np.where(better, o, best_off)
    return best_off, best_L


def greedy_cost(off, L):
    """Approximate emitted size: greedy parse + s2 tag cost model."""
    bs = len(off)
    i = 0
    out = 0
    lit = 0
    while i < bs:
        if L[i] >= 4:
            if lit:
                out += lit + 1 + (lit > 60) + (lit > 256)
                lit = 0
            l = int(L[i])
            o = int(off[i])
            l1 = 64 if l >= 68 else (l - 4 if l >= 65 else l)
            out += 2 if (o < 2048 and l1 <= 11) else 3
            l2 = l - l1
            while l2 > 0:
                t = min(l2, 64 + 3 if False else l2)
                out += 2 if l2 <= 8 else (3 if l2 <= 263 else 4)
                l2 = 0 if l2 <= 263 + 64 else 0  # coarse: one repeat tag
            i += l
        else:
            lit += 1
            i += 1
    if lit:
        out += lit + 1 + (lit > 60) + (lit > 256)
    return out


def load_corpora():
    out = {}
    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    out["twain"] = np.frombuffer(tw[:B], np.uint8)
    try:
        zf = zipfile.ZipFile("/root/reference/zstd/testdata/benchdecoder.zip")
        import io
        from compress_tpu import zstd as z
        for n in zf.namelist()[:6]:
            d = z.decompress(zf.read(n))
            if len(d) >= B:
                out[n[:12]] = np.frombuffer(d[:B], np.uint8)
    except Exception as e:
        print("corpus load:", e)
    rng = np.random.default_rng(0)
    per = bytes(rng.integers(0, 6, 300, np.uint8)) * 300
    out["period"] = np.frombuffer(per[:B], np.uint8)
    return out


def main():
    corp = load_corpora()
    print(f"{'corpus':14s} {'sort16':>8s}", end="")
    cfgs = [
        dict(T=1024, ways=2, stride=1, l_cap=16),
        dict(T=1024, ways=2, stride=2, l_cap=16),
        dict(T=2048, ways=1, stride=1, l_cap=16),
        dict(T=2048, ways=2, stride=2, l_cap=16),
        dict(T=512, ways=2, stride=1, l_cap=16),
        dict(T=1024, ways=2, stride=2, l_cap=12),
        dict(T=1024, ways=4, stride=2, l_cap=16),
    ]
    for c in cfgs:
        print(f" T{c['T']}w{c['ways']}s{c['stride']}c{c['l_cap']:>2d}", end="")
    print(flush=True)
    for name, blk in corp.items():
        res = []
        o, l = sim_sort_finder(blk)
        o, l = rle_and_chain(blk, o, l, 16)
        res.append(greedy_cost(o, l))
        for c in cfgs:
            o, l = sim_hash_finder(blk, **c)
            o, l = rle_and_chain(blk, o, l, c["l_cap"])
            res.append(greedy_cost(o, l))
        print(f"{name:14s}" + "".join(f" {r:>11d}" for r in res), flush=True)


if __name__ == "__main__":
    main()


# ---- r4 additions: local-exact + wave hash hybrid --------------------------

def sim_hybrid(block, T=4096, W=256, l_cap=8, local_max=31, ways=1):
    """local exact offsets 1..local_max (byte-precise L up to 12) +
    tag-verified hash table at wave granularity W."""
    bs = len(block)
    v = v32_of(block)
    u = (v * M)
    tbits = int(np.log2(T))
    slot = (u >> np.uint32(32 - tbits)).astype(np.int64)
    ext = np.concatenate([block, np.zeros(64, np.uint8)])
    off = np.zeros(bs, np.int32)
    L = np.zeros(bs, np.int32)
    # local exact: offsets 1..local_max
    for o in range(1, local_max + 1):
        m = np.zeros(bs, bool)
        m[o:] = v[o:] == v[:-o]
        # length: byte-precise up to 12
        l = np.full(bs, 4, np.int32)
        for k in range(4, 12):
            eq = np.zeros(bs, bool)
            eq[o:] = ext[4 + np.arange(bs - o) + o - 4 + k - k]  # placeholder
        # vectorized byte-precise length
        l = np.full(bs, 0, np.int32)
        l[m] = 4
        for k in range(4, 12):
            ok = m.copy()
            ok[:] = False
            idx = np.nonzero(m)[0]
            good = idx + k < bs + 48
            ii = idx[good]
            cont = ext[ii + k] == ext[ii + k - o]
            upd = np.zeros(bs, bool)
            upd[ii[cont & (l[ii] == k)]] = True
            l[upd] += 1
        better = (l > L) & (l >= 4)
        L = np.where(better, l, L)
        off = np.where(better, o, off)
    # wave hash (tag-verified = exact v32 since tag injective)
    tab = np.full((T, ways), -1, np.int64)
    for w0 in range(0, bs, W):
        idx = np.arange(w0, min(w0 + W, bs))
        s = slot[idx]
        cands = tab[s]
        for j, i in enumerate(idx):
            best_l, best_c = 0, -1
            for c in cands[j]:
                if c < 0 or v[c] != v[i]:
                    continue
                l = 4
                while l < l_cap and i + l < bs and ext[c + l] == ext[i + l]:
                    l += 1
                if l > best_l:
                    best_l, best_c = l, c
            if best_c >= 0 and (L[i] < best_l or (L[i] == best_l and off[i] == 0)):
                if best_l > L[i]:
                    off[i] = i - best_c
                    L[i] = best_l
        lastw = {}
        for i in idx:
            lastw[slot[i]] = i
        for s_, i in lastw.items():
            tab[s_, 1:] = tab[s_, :-1]
            tab[s_, 0] = i
    return off, L


def main2():
    corp = load_corpora()
    cfgs = [
        ("sortC16", None),
        ("T4096 W256 loc31", dict(T=4096, W=256, local_max=31)),
        ("T8192 W256 loc31", dict(T=8192, W=256, local_max=31)),
        ("T4096 W512 loc31", dict(T=4096, W=512, local_max=31)),
        ("T4096 W256 loc15", dict(T=4096, W=256, local_max=15)),
        ("T4096 W256 loc63", dict(T=4096, W=256, local_max=63)),
        ("T4096w2 W256 loc31", dict(T=4096, W=256, local_max=31, ways=2)),
        ("T8192 W1024 loc31", dict(T=8192, W=1024, local_max=31)),
    ]
    names = [n for n, _ in cfgs]
    print(f"{'corpus':14s} " + " ".join(f"{n:>20s}" for n in names))
    for cn, block in corp.items():
        row = []
        for n, c in cfgs:
            if c is None:
                off, L = sim_sort_finder(block, l_cap=16)
            else:
                off, L = sim_hybrid(block, **c)
            off, L = rle_and_chain(block, off, L, 16 if c is None else 8)
            row.append(greedy_cost(off, L))
        print(f"{cn:14s} " + " ".join(f"{v:20d}" for v in row))


if __name__ == "__main__" and "--hybrid" in sys.argv:
    main2()
