import time, numpy as np, jax, jax.numpy as jnp
from compress_tpu.ops import lzkern, lzemit, lz2

tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt","rb").read()
big = (tw * ((16<<20)//len(tw)+1))[:16<<20]
nb = len(big)//65536
arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, 65536))
N = 10

def run(label, fn):
    r = fn(); jax.block_until_ready(r); np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    t=time.time()
    outs=[fn() for _ in range(N)]
    np.asarray(jax.tree.leaves(outs[-1])[0].reshape(-1)[:1])  # one sync
    dt=(time.time()-t - 0.040)/N
    print(f"{label}: {dt*1000:.2f} ms/iter, {len(big)/dt/1e9:.3f} GB/s")

run("finder", lambda: lzkern.find_matches_blocks(arr))
off, L = lzkern.find_matches_blocks(arr)
run("emit", lambda: lzemit.emit_blocks(arr, off, L))
run("finder+emit", lambda: lzemit.emit_blocks(arr, *lzkern.find_matches_blocks(arr)))
run("xla-pipeline", lambda: lz2.s2_encode_blocks(arr))
