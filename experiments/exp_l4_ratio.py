"""L4 ratio A/B vs libzstd-11 on the benchdecoder corpus (bench.py's
zstd_l4_corpus_ratio_vs_libzstd11 row, reproduced for fast iteration).

Usage: python experiments/exp_l4_ratio.py [level [lib_level]]
"""
import sys
import time
import zipfile

sys.path.insert(0, "/root/repo")

import zstandard

from compress_tpu.zstd.encoder import compress as zc
from compress_tpu import zstd as z2

level = int(sys.argv[1]) if len(sys.argv) > 1 else 4
lib_lv = int(sys.argv[2]) if len(sys.argv) > 2 else 11

zf = zipfile.ZipFile("/root/reference/zstd/testdata/benchdecoder.zip")
d = zstandard.ZstdDecompressor()
raws = [(n, d.decompress(zf.read(n), max_output_size=64 << 20))
        for n in zf.namelist()]

c = zstandard.ZstdCompressor(level=lib_lv)
to = tl = tr = 0
t0 = time.time()
for n, r in raws:
    ours = zc(r, level=level)
    assert z2.decompress(ours) == r, n
    lib = c.compress(r)
    to += len(ours)
    tl += len(lib)
    tr += len(r)
    print(f"{n:30s} raw {len(r):9d}  ours {len(ours):8d}  lib {len(lib):8d}  "
          f"{len(ours)/max(len(lib),1):.4f}")
print(f"TOTAL ours {to} lib {tl}  ratio {to/tl:.4f}  "
      f"(ours/raw {to/tr:.4f})  {time.time()-t0:.1f}s")
