"""s2 batched device block decode (s2/device_dec.py) — r3, the
s2/decode_amd64.s role (VERDICT r2 missing #6)."""

import numpy as np
import pytest

from compress_tpu import s2
from compress_tpu.s2 import device_dec as SD


def _corpus():
    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    html = open("/root/reference/testdata/html.txt", "rb").read()
    rnd = open("/root/reference/testdata/sharnd.out", "rb").read()
    return twain, html, rnd


def test_s2_device_decode_all_tiers():
    twain, html, rnd = _corpus()
    srcs = [twain[:40000], html[:30000], b"z" * 20000, rnd[:16000],
            twain[:100]]
    blocks = ([s2.encode(x) for x in srcs]
              + [s2.encode_better(twain[:40000]),
                 s2.encode_best(html[:20000])])
    wants = srcs + [twain[:40000], html[:20000]]
    got = SD.decode_blocks_device(blocks)
    assert got == wants


def test_s2_device_decode_snappy_strict():
    twain, html, _ = _corpus()
    srcs = [twain[:20000], html[:20000]]
    blocks = [s2.encode_snappy(x) for x in srcs]
    assert SD.decode_blocks_device(blocks, allow_repeat=False) == srcs


def test_s2_device_decode_fallback_large():
    twain, _, _ = _corpus()
    data = twain[:200000]  # > 64 KiB arena: host fallback path
    assert SD.decode_blocks_device([s2.encode(data)]) == [data]


def test_s2_device_decode_degenerate_repeats():
    srcs = [b"\x00" * 30000, (b"abc" * 12000)[:30000]]
    blocks = [s2.encode(x) for x in srcs]
    assert SD.decode_blocks_device(blocks) == srcs


def test_decode_blocks_device_sharded():
    """Blocks shard data-parallel over the mesh (batch % devices != 0)."""
    from compress_tpu import s2
    from compress_tpu.parallel import block_mesh
    from compress_tpu.s2.device_dec import decode_blocks_device

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    srcs = [twain[i * 5000 : (i + 1) * 5000] for i in range(13)]
    blocks = [s2.encode(x) for x in srcs]
    out = decode_blocks_device(blocks, mesh=block_mesh())
    assert out == srcs


def test_s2_device_decode_hostile_inputs():
    """Corrupt/truncated s2 blocks must never crash or mis-decode: the
    device path either produces the same result as the host decoder or
    both reject."""
    import numpy as np

    from compress_tpu import s2
    from compress_tpu.s2.device_dec import decode_blocks_device

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    base = s2.encode(twain[:8000])
    rng = np.random.default_rng(4)
    for _ in range(48):
        b = bytearray(base)
        k = int(rng.integers(0, len(b)))
        b[k] ^= 1 + int(rng.integers(0, 255))
        blk = bytes(b)
        try:
            want = s2.decode(blk)
        except Exception:  # noqa: BLE001
            want = None
        try:
            got = decode_blocks_device([blk])[0]
        except Exception:  # noqa: BLE001
            got = None
        # a flipped bit may corrupt silently (s2 blocks carry no
        # checksum) — but device and host must AGREE
        assert got == want, (k, "device/host divergence")
    # truncations
    for cut in (1, 3, 7, len(base) // 2):
        blk = base[:-cut]
        try:
            want = s2.decode(blk)
        except Exception:  # noqa: BLE001
            want = None
        try:
            got = decode_blocks_device([blk])[0]
        except Exception:  # noqa: BLE001
            got = None
        assert got == want, (cut, "device/host divergence on truncation")


def test_device_decode_beyond_64k():
    """Blocks up to 256 KiB decode on device via M-scaled arenas
    (VERDICT r4 #8a: the 64 KiB block cap)."""
    import numpy as np

    from compress_tpu import s2
    from compress_tpu.s2 import device_dec as DD

    tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
              "rb").read()
    rng = np.random.default_rng(5)
    cases = [
        tw[:65537],                        # M=2 boundary
        tw[:130000],
        tw[:262144],                       # M=4
        (tw[:1000] * 300)[:200000],        # periodic
        rng.integers(0, 256, 100000, dtype=np.uint8).tobytes(),
        b"\x00" * 250000,                  # rle/repeat chains
    ]
    blocks = [s2.encode(bytes(c)) for c in cases]
    outs = DD.decode_blocks_device(blocks)
    for i, (c, o) in enumerate(zip(cases, outs)):
        assert o == bytes(c), (i, len(c))
