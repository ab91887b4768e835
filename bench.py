"""Round benchmark — runs on the real TPU chip.

Measures the device S2 block-encode pipeline (the flagship kernel chain:
sort-based candidate search + tiled parse + emission) on Twain-replicated
text, validates a sample decodes bit-exactly, and prints ONE JSON line.

Baseline: the reference's s2 default block encode, single goroutine —
936.73 MB/s on its mixed 4GB corpus (BASELINE.md, s2/README.md:468-475).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from compress_tpu.ops import lz2 as lz

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    target = 16 << 20
    big = (data * (target // len(data) + 1))[:target]
    nb = len(big) // lz.B
    arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, lz.B))

    out, lens = lz.s2_encode_blocks(arr)  # compile + warm
    np.asarray(lens[-1:])

    iters = 2
    t = time.time()
    for _ in range(iters):
        out, lens = lz.s2_encode_blocks(arr)
    lens_np = np.asarray(lens)
    dt = (time.time() - t) / iters
    gbps = len(big) / dt / 1e9
    ratio = float(lens_np.sum()) / len(big)

    # validity: first block decodes bit-exactly via the host decoder
    from compress_tpu import s2
    from compress_tpu.utils.varint import put_uvarint

    hdr = bytearray()
    put_uvarint(hdr, lz.B)
    body = np.asarray(out[0])[: lens_np[0]].tobytes()
    assert s2.decode(bytes(hdr) + body) == big[: lz.B], "decode mismatch"

    baseline_gbps = 0.93673  # reference s2 default, 1 core
    print(json.dumps({
        "metric": "s2_block_encode_device",
        "value": round(gbps, 5),
        "unit": "GB/s",
        "vs_baseline": round(gbps / baseline_gbps, 5),
        "ratio": round(ratio, 4),
        "n_bytes": len(big),
    }))


if __name__ == "__main__":
    main()
