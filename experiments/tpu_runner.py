"""Persistent TPU job runner — keeps one jax/TPU context alive and execs
queued snippet files (tunnel init costs minutes; this pays it once).

Usage:  python experiments/tpu_runner.py <jobdir>
Submit: write foo.py into <jobdir>/; runner execs it (fresh globals with
        jax/jnp/np/pl/pltpu preloaded), stdout+traceback -> foo.out,
        then renames foo.py -> foo.done. Drop a file named STOP to exit.
"""

import io
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def main():
    jobdir = sys.argv[1]
    os.makedirs(jobdir, exist_ok=True)
    dev = jax.devices()
    with open(os.path.join(jobdir, "READY"), "w") as f:
        f.write(repr(dev))
    print("runner ready:", dev, flush=True)
    while True:
        if os.path.exists(os.path.join(jobdir, "STOP")):
            print("runner stopping", flush=True)
            return
        jobs = sorted(f for f in os.listdir(jobdir) if f.endswith(".py"))
        if not jobs:
            time.sleep(0.5)
            continue
        name = jobs[0]
        path = os.path.join(jobdir, name)
        src = open(path).read()
        buf = io.StringIO()
        t0 = time.time()
        old = sys.stdout
        sys.stdout = buf
        try:
            g = {"jax": jax, "jnp": jnp, "np": np, "pl": pl, "pltpu": pltpu,
                 "time": time, "__name__": "__tpu_job__"}
            exec(compile(src, path, "exec"), g)
            status = "ok"
        except BaseException:
            buf.write(traceback.format_exc())
            status = "err"
        finally:
            sys.stdout = old
        dt = time.time() - t0
        with open(path[:-3] + ".out", "w") as f:
            f.write(f"# status={status} wall={dt:.1f}s\n" + buf.getvalue())
        os.replace(path, path[:-3] + ".done")
        print(f"job {name}: {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
