"""Regenerate the flate golden pins (run deliberately after intentional
bit-writer changes): python tests/golden/regen_flate.py"""
import glob
import hashlib
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from compress_tpu import flate  # noqa: E402

gold = {}
ins = sorted(glob.glob("/root/reference/flate/testdata/huffman-*.in"))
extra = ["/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
         "/root/reference/testdata/e.txt"]
for p in ins + extra:
    data = open(p, "rb").read()[:262144]
    ent = {}
    for lv in (-2, 1, 2, 3, 6, 9):
        out = flate.deflate(data, lv)
        assert zlib.decompress(out, -15) == data
        ent[str(lv)] = {"size": len(out),
                        "sha256": hashlib.sha256(out).hexdigest()}
    gold[os.path.basename(p)] = ent
out_path = os.path.join(os.path.dirname(__file__), "flate_golden.json")
json.dump(gold, open(out_path, "w"), indent=1, sort_keys=True)
print("wrote", out_path)
