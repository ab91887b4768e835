"""Host decode A/B vs libzstd, paired same-run (bench.py's
zstd_dec_vs_libzstd_speed + benchdecoder rows reproduced)."""
import sys, time, zipfile

sys.path.insert(0, "/root/repo")
import zstandard
from compress_tpu import zstd as z2

data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
big = (data * 5)[: 2 << 20]

frame = zstandard.ZstdCompressor(level=3).compress(big)
dd = zstandard.ZstdDecompressor()
bo = bl = 0.0
for _ in range(9):
    t = time.time(); z2.decompress(frame); bo = max(bo, len(big) / (time.time() - t))
    t = time.time(); dd.decompress(frame); bl = max(bl, len(big) / (time.time() - t))
print(f"2MB libzstd-3 frame: ours {bo/1e9:.3f} GB/s  lib {bl/1e9:.3f} GB/s  ratio {bo/bl:.4f}")

zf = zipfile.ZipFile("/root/reference/zstd/testdata/benchdecoder.zip")
frames = [zf.read(n) for n in zf.namelist()]
outs = [z2.decompress(f) for f in frames]
total = sum(len(o) for o in outs)
bo = bl = 0.0
for _ in range(7):
    t = time.time()
    for f in frames: z2.decompress(f)
    bo = max(bo, total / (time.time() - t))
    t = time.time()
    for f in frames: dd.decompress(f)
    bl = max(bl, total / (time.time() - t))
print(f"benchdecoder corpus: ours {bo/1e9:.3f} GB/s  lib {bl/1e9:.3f} GB/s  ratio {bo/bl:.4f}")
# per-file paired
for n in zf.namelist():
    f = zf.read(n)
    o = z2.decompress(f)
    vo = vl = 0.0
    for _ in range(5):
        t = time.time(); z2.decompress(f); vo = max(vo, len(o)/(time.time()-t))
        t = time.time(); dd.decompress(f); vl = max(vl, len(o)/(time.time()-t))
    print(f"  {n:26s} {len(o)//1024:6d}KB ours {vo/1e9:6.3f} lib {vl/1e9:6.3f}  {vo/vl:.3f}")
