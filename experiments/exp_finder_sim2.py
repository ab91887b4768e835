"""Round-5 finder redesign sim: quality of linear-traffic finder designs.

Candidates (all must beat/stay near the full exact sort's ratio, which the
r4 kernel implements at 0.535 GB/s — the VERDICT bar is >= 1 GB/s at
ratio <= 0.60):

  sortN   : full-block exact nearest-prev-equal, suffix cap N (r4 = cap 10)
  segS/cN : segmented exact within S-byte segments, cap N
  +anch   : + content-defined anchor layer (hash < 2^32/8, <=256/segment,
            global exact among anchors, cap N)
  rowdyad : 128-byte row-local exact + dyadic row probes (r-1,2,4,8)
            within a 2048 segment + anchors

Usage: python experiments/exp_finder_sim2.py
"""
import sys, zipfile

sys.path.insert(0, "/root/repo")
import numpy as np

from exp_finder_sim import (B, M, v32_of, rle_and_chain, greedy_cost,
                            load_corpora, sim_sort_finder)


def _ext_len(block, i, c, l_cap):
    l = 4
    bs = len(block)
    while l < l_cap and i + l < bs and block[(c + l) % bs] == block[i + l]:
        l += 1
    return l


def sim_seg_exact(block, S=2048, l_cap=6):
    bs = len(block)
    v = v32_of(block)
    off = np.zeros(bs, np.int32)
    L = np.zeros(bs, np.int32)
    for s0 in range(0, bs, S):
        sl = slice(s0, min(s0 + S, bs))
        vv = v[sl]
        n = len(vv)
        order = np.lexsort((np.arange(n), vv))
        vs = vv[order]
        same = np.concatenate([[False], vs[1:] == vs[:-1]])
        for k in np.nonzero(same)[0]:
            i = s0 + order[k]
            c = s0 + order[k - 1]
            if c >= i:
                continue
            off[i] = i - c
            L[i] = _ext_len(block, i, c, l_cap)
    return off, L


def anchor_layer(block, off, L, l_cap=6, thresh=1 << 29, S=2048, cap=256):
    bs = len(block)
    v = v32_of(block)
    u = (v * M).astype(np.uint32)
    keep = np.zeros(bs, bool)
    for s0 in range(0, bs, S):
        sl = np.arange(s0, min(s0 + S, bs))
        m = u[sl] < thresh
        idx = sl[m]
        if len(idx) > cap:
            # device keeps the first `cap` slots of the hash-sorted segment
            ksmall = np.argsort(u[idx], kind="stable")[:cap]
            idx = idx[np.sort(ksmall)]
        keep[idx] = True
    aidx = np.nonzero(keep)[0]
    if len(aidx) == 0:
        return off, L, 0
    va = v[aidx]
    order = np.lexsort((aidx, va))
    vs = va[order]
    same = np.concatenate([[False], vs[1:] == vs[:-1]])
    nrep = 0
    for k in np.nonzero(same)[0]:
        i = int(aidx[order[k]])
        c = int(aidx[order[k - 1]])
        if c >= i:
            continue
        l = _ext_len(block, i, c, l_cap)
        if l > L[i]:
            off[i] = i - c
            L[i] = l
            nrep += 1
    return off, L, len(aidx)


def sim_rowdyad(block, l_cap=6, seg_rows=16, probes=(1, 2, 4, 8)):
    bs = len(block)
    W = 128
    v = v32_of(block)
    off, L = sim_seg_exact(block, S=W, l_cap=l_cap)
    nrow = bs // W
    # per row: sorted v for searchsorted, with max-pos per key
    sorted_rows = []
    for r in range(nrow):
        vv = v[r * W:(r + 1) * W]
        o = np.lexsort((np.arange(W), vv))
        sorted_rows.append((vv[o], o))
    for r in range(nrow):
        base = r * W
        vq = v[base:base + W]
        for d in probes:
            rp = r - d
            if rp < 0 or (r // seg_rows) != (rp // seg_rows):
                continue
            vs, o = sorted_rows[rp]
            # last equal entry: searchsorted right side - 1
            j = np.searchsorted(vs, vq, side="right") - 1
            hit = (j >= 0) & (vs[np.clip(j, 0, W - 1)] == vq)
            for k in np.nonzero(hit)[0]:
                i = base + k
                c = rp * W + o[j[k]]
                if c >= i:
                    continue
                l = _ext_len(block, i, c, l_cap)
                if l > L[i] or (l == L[i] and i - c < off[i]):
                    off[i] = i - c
                    L[i] = l
                break_ = None
    return off, L


def main():
    corp = load_corpora()
    variants = []
    variants.append(("sort10", lambda b: sim_sort_finder(b, l_cap=10), 10))
    variants.append(("sort6", lambda b: sim_sort_finder(b, l_cap=6), 6))
    for S in (1024, 2048, 4096):
        variants.append((f"seg{S}c6", lambda b, S=S: sim_seg_exact(b, S, 6), 6))
    def seg_anch(b, S, l_cap):
        o, l = sim_seg_exact(b, S, l_cap)
        o, l, na = anchor_layer(b, o, l, l_cap, S=S)
        return o, l
    for S in (2048, 4096):
        variants.append((f"seg{S}c6+a", lambda b, S=S: seg_anch(b, S, 6), 6))
    def rd(b):
        o, l = sim_rowdyad(b, l_cap=6)
        o, l, na = anchor_layer(b, o, l, 6)
        return o, l
    variants.append(("rowdyad+a", rd, 6))

    print(f"{'corpus':14s}" + "".join(f" {n:>11s}" for n, _, _ in variants),
          flush=True)
    tots = np.zeros(len(variants))
    for name, blk in corp.items():
        res = []
        for vn, fn, cap in variants:
            o, l = fn(blk)
            o, l = rle_and_chain(blk, o, l, cap)
            res.append(greedy_cost(o, l))
        tots += np.array(res, float)
        print(f"{name:14s}" + "".join(f" {r:>11d}" for r in res), flush=True)
    base = tots[0]
    print(f"{'TOTAL':14s}" + "".join(f" {int(r):>11d}" for r in tots))
    print(f"{'vs sort10':14s}" + "".join(f" {r/base:>11.4f}" for r in tots))


if __name__ == "__main__":
    main()
