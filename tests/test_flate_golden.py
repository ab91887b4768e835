"""Golden exact-bitstream regression pins for flate (the reference's
huffman-*.expect strategy, SURVEY §4.2: deterministic output means a
silent bit-writer/ratio regression fails CI instead of shipping).

The pinned bytes are OUR encoder's (the reference pins its own too —
deflate bitstreams are implementation-specific); regenerate the JSON
deliberately via tests/golden/regen_flate.py when the encoder changes
on purpose. Native-core output is the pinned path; the pure-Python
fallback has its own (stable) pins where it diverges.
"""

import glob
import hashlib
import json
import os
import pathlib
import zlib

import pytest

from compress_tpu import flate
from compress_tpu import _native

GOLDEN = json.load(open(
    pathlib.Path(__file__).parent / "golden" / "flate_golden.json"))


def _inputs():
    ins = sorted(glob.glob("/root/reference/flate/testdata/huffman-*.in"))
    extra = ["/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
             "/root/reference/testdata/e.txt"]
    return ins + extra


@pytest.mark.skipif(_native.raw() is None,
                    reason="golden pins cover the native bit writer")
@pytest.mark.parametrize("path", _inputs(),
                         ids=[os.path.basename(p) for p in _inputs()])
def test_flate_bitstream_golden(path):
    data = open(path, "rb").read()[:262144]
    name = os.path.basename(path)
    assert name in GOLDEN, f"regenerate golden for {name}"
    for lv, want in GOLDEN[name].items():
        out = flate.deflate(data, int(lv))
        assert zlib.decompress(out, -15) == data, (name, lv)
        got = hashlib.sha256(out).hexdigest()
        assert (len(out), got) == (want["size"], want["sha256"]), (
            f"{name} level {lv}: output changed "
            f"({len(out)} B vs pinned {want['size']} B). If intentional, "
            f"regenerate tests/golden/flate_golden.json")
