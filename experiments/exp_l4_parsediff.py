"""Dump (ll, ml, off) parses of ours-L4 vs libzstd-11, align by absolute
position, and show where they diverge + summary stats."""
import sys
import zipfile
from collections import Counter

sys.path.insert(0, "/root/repo")

import zstandard

from compress_tpu.zstd.encoder import compress as zc
from compress_tpu.zstd import frame as zframe
from compress_tpu.zstd import block as zblock

name = sys.argv[1] if len(sys.argv) > 1 else "asyoulik.txt.zst"
zf = zipfile.ZipFile("/root/reference/zstd/testdata/benchdecoder.zip")
raw = zstandard.ZstdDecompressor().decompress(zf.read(name),
                                              max_output_size=64 << 20)

def parse_seqs(frame):
    hdr = zframe.parse_frame_header(frame)
    pos = hdr.header_size
    hist = zblock.History(window_size=1 << 23)
    seqs = []  # (abs_pos, ll, ml, off)
    base = 0
    reps = [1, 4, 8]
    while True:
        bh = int.from_bytes(frame[pos:pos + 3], "little")
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        pos += 3
        body = frame[pos:pos + (1 if btype == 1 else bsize)]
        if btype == 2:
            lits, p2 = zblock.decode_literals(body, 0, hist)
            lls, mls, ofvals, _ = zblock.decode_sequences_section(body, p2, hist)
            if lls is None: lls = mls = ofvals = []
            cur = base
            for ll, ml, ofv in zip(lls, mls, ofvals):
                # resolve rep
                if ofv > 3:
                    off = ofv - 3
                    reps = [off, reps[0], reps[1]]
                else:
                    idx = ofv - 1
                    if ll == 0:
                        idx += 1
                    if idx == 0:
                        off = reps[0]
                    elif idx == 1:
                        off = reps[1]; reps = [off, reps[0], reps[2]]
                    elif idx == 2:
                        off = reps[2]; reps = [off, reps[0], reps[1]]
                    else:
                        off = reps[0] - 1; reps = [off, reps[0], reps[1]]
                seqs.append((cur + ll, ll, ml, off))
                cur += ll + ml
            out = zblock.decode_block(body, hist, 1 << 23)
            hist.append(out)
            base += len(out)
        else:
            out = body * bsize if btype == 1 else body
            hist.append(out)
            base += len(out)
        pos += len(body) if btype != 1 else 1
        if last:
            break
    return seqs

ours = parse_seqs(zc(raw, level=4))
lib = parse_seqs(zstandard.ZstdCompressor(level=11).compress(raw))
print(f"{name}: ours {len(ours)} seqs, lib {len(lib)} seqs")

om = {p: (ll, ml, off) for p, ll, ml, off in ours}
lm = {p: (ll, ml, off) for p, ll, ml, off in lib}
# where lib has a match and we dont cover the same start
only_lib = [p for p in lm if p not in om]
only_ours = [p for p in om if p not in lm]
print(f"match-starts only in lib: {len(only_lib)}, only in ours: {len(only_ours)}")
# length comparison at shared starts
dl = Counter()
for p in om:
    if p in lm:
        dl[om[p][1] - lm[p][1]] += 1
print("ml delta at shared starts (ours-lib):",
      sorted(dl.items(), key=lambda x: -x[1])[:8])
# offsets: how often ours picks larger offsets at shared starts
bigger = sum(1 for p in om if p in lm and om[p][2] > lm[p][2])
smaller = sum(1 for p in om if p in lm and om[p][2] < lm[p][2])
print(f"offset at shared starts: ours-bigger {bigger}, ours-smaller {smaller}")
# sample divergences
sample = sorted(only_lib)[:15]
for p in sample:
    ll, ml, off = lm[p]
    near = [(q, om[q]) for q in range(max(0, p - 3), p + 4) if q in om]
    print(f"lib@{p}: ml={ml} off={off} ll={ll}   ours near: {near}")
# distribution of lib match lens vs ours
def lens(seqs):
    c = Counter()
    for _, _, ml, _ in seqs:
        c[min(ml, 20)] += 1
    return c
print("ml<=20 hist ours:", sorted(lens(ours).items())[:10])
print("ml<=20 hist lib :", sorted(lens(lib).items())[:10])
print("total match bytes ours", sum(m for _, _, m, _ in ours),
      "lib", sum(m for _, _, m, _ in lib))
print("rep0 usage ours", sum(1 for p in om if p in lm),  # placeholder
      )
