"""Profile decompress_frames_device on the accel-sidecar path (real chip).

Reproduces the bench's dev_dec measurement (64 x 60 KiB frames) and
cProfiles the steady-state call to find where the ~2 s goes.
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# honor JAX_PLATFORMS=cpu even though axon sitecustomize already imported
# jax (env alone is ignored after that)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from compress_tpu.zstd import accel as AC  # noqa: E402
from compress_tpu.zstd import device_dec as DD  # noqa: E402


def main():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()
    big = (data * 10)[: 16 << 20]
    nfr = 64
    srcs = [big[i * 61440 : (i + 1) * 61440] for i in range(nfr)]
    t = time.time()
    blobs = [AC.compress_accel(s, level=1) for s in srcs]
    print(f"encode+sidecar: {time.time()-t:.2f}s "
          f"({sum(len(b) for b in blobs)/sum(len(s) for s in srcs):.3f} blob/src)")

    outs = DD.decompress_frames_device(blobs)  # compile + warm
    assert outs == srcs
    for it in range(3):
        t = time.time()
        DD.decompress_frames_device(blobs)
        dt = time.time() - t
        print(f"iter {it}: {dt*1e3:.1f} ms  "
              f"{sum(len(s) for s in srcs)/dt/1e9:.4f} GB/s")

    pr = cProfile.Profile()
    pr.enable()
    DD.decompress_frames_device(blobs)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
