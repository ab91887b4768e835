"""One-shot measurement sweep for when the TPU tunnel comes back.

The tunnel has been dead or ~1000x degraded for most of rounds 2-3; any
window of health must be exploited fully and automatically. Each step
runs as a SUBPROCESS with a hard timeout (a dead tunnel blocks C calls
forever and SIGALRM cannot interrupt them — bench.py learned this the
hard way), results append to docs/chip_sweep_results.md.

Usage:  python tools/chip_sweep.py
"""

import datetime
import subprocess
import sys

REPO = "/root/repo"
OUT = f"{REPO}/docs/chip_sweep_results.md"

STEPS = [
    # (name, argv, timeout_s)
    ("probe", [sys.executable, "-c",
               "import jax, jax.numpy as jnp, numpy as np, time\n"
               "a = jnp.ones((2048, 2048), jnp.bfloat16)\n"
               "f = jax.jit(lambda x: x @ x)\n"
               "r = f(a); np.asarray(r.ravel()[0:1])\n"
               "t0 = time.perf_counter()\n"
               "for _ in range(10): r = f(r)\n"
               "np.asarray(r.ravel()[0:1])\n"
               "print('calib_matmul_ms',"
               " (time.perf_counter()-t0)/10*1e3)\n"], 420),
    ("device_smoke", [sys.executable, f"{REPO}/tools/device_smoke.py"], 420),
    ("bench", [sys.executable, f"{REPO}/bench.py"], 3000),
    ("hash_find_timing",
     [sys.executable, f"{REPO}/experiments/exp_hash_find.py", "--time"],
     1800),
    ("s2_stage_timing",
     [sys.executable, f"{REPO}/experiments/exp_s2_stages.py"], 1800),
    ("compact_ab",
     [sys.executable, f"{REPO}/experiments/exp_compact_ab.py"], 1800),
    ("accel_decode_profile",
     [sys.executable, f"{REPO}/experiments/exp_accel_dec_profile.py"], 1800),
]


def main() -> int:
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    with open(OUT, "a") as f:
        f.write(f"\n## chip sweep {stamp}\n\n")
    ok = True
    for name, argv, tmo in STEPS:
        try:
            r = subprocess.run(argv, capture_output=True, text=True,
                               timeout=tmo, cwd=REPO)
            body = (r.stdout or "") + ("\n[stderr tail]\n" +
                                       r.stderr[-1500:] if r.returncode
                                       else "")
        except subprocess.TimeoutExpired:
            body = f"TIMEOUT after {tmo}s (tunnel dead/degraded)"
            ok = False
        except Exception as e:  # noqa: BLE001
            body = f"ERROR: {e}"
            ok = False
        with open(OUT, "a") as f:
            f.write(f"### {name}\n```\n{body.strip()[-4000:]}\n```\n")
        print(f"[{name}] done")
        if name == "probe" and ("calib_matmul_ms" not in body):
            with open(OUT, "a") as f:
                f.write("probe failed: aborting sweep\n")
            print("probe failed: aborting sweep")
            return 1
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
