"""Compare our L4 frame anatomy vs libzstd-11 on one file: per-block
literal-section size, sequence count, sequence-section size."""
import sys
import zipfile

sys.path.insert(0, "/root/repo")

import zstandard

from compress_tpu.zstd.encoder import compress as zc
from compress_tpu.zstd import frame as zframe
from compress_tpu.zstd import block as zblock

name = sys.argv[1] if len(sys.argv) > 1 else "alice29.txt.zst"
zf = zipfile.ZipFile("/root/reference/zstd/testdata/benchdecoder.zip")
raw = zstandard.ZstdDecompressor().decompress(zf.read(name),
                                              max_output_size=64 << 20)

def anatomy(frame, tag):
    hdr = zframe.parse_frame_header(frame)
    pos = hdr.header_size if hasattr(hdr, "header_size") else hdr[1]
    # walk blocks
    tot = dict(lit_raw=0, lit_comp=0, nseq=0, seq_bytes=0, blocks=0,
               lit_secs=0)
    hist = zblock.History(window_size=1 << 23)
    while True:
        bh = int.from_bytes(frame[pos:pos + 3], "little")
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        pos += 3
        body = frame[pos:pos + (1 if btype == 1 else bsize)]
        if btype == 2:  # compressed
            lits, p2, ltype = None, None, None
            lits, p2 = zblock.decode_literals(body, 0, hist)
            nseq_pos = p2
            # sequences header: count
            b0 = body[p2]
            if b0 < 128:
                nseq = b0; p2 += 1
            elif b0 < 255:
                nseq = ((b0 - 128) << 8) + body[p2 + 1]; p2 += 2
            else:
                nseq = int.from_bytes(body[p2+1:p2+3], "little") + 0x7F00; p2 += 3
            tot["lit_raw"] += len(lits)
            tot["lit_comp"] += nseq_pos
            tot["nseq"] += nseq
            tot["seq_bytes"] += len(body) - nseq_pos
            tot["blocks"] += 1
            out = zblock.decode_block(body, hist, 1 << 23)
            hist.append(out)
        else:
            out = body * bsize if btype == 1 else body
            hist.append(out)
        pos += len(body) if btype != 1 else 1
        if last:
            break
    print(f"{tag}: frame {len(frame)}  blocks {tot['blocks']}  "
          f"lit_raw {tot['lit_raw']}  lit_sec {tot['lit_comp']}  "
          f"nseq {tot['nseq']}  seq_sec {tot['seq_bytes']}")
    return tot

ours = zc(raw, level=4)
lib = zstandard.ZstdCompressor(level=11).compress(raw)
print(name, "raw", len(raw))
anatomy(ours, "ours-L4 ")
anatomy(lib, "lib-11  ")
