import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((8,128), jnp.int32)
y = (x+1); np.asarray(y[:1,:1])
t=time.time()
for _ in range(20):
    y = y + 1
    np.asarray(y[:1,:1])
print(f"RTT+tiny-op: {(time.time()-t)/20*1000:.2f} ms")

# XLA s2 pipeline on healthy chip
from compress_tpu.ops import lz2
tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt","rb").read()
big = (tw * ((16<<20)//len(tw)+1))[:16<<20]
nb = len(big)//65536
arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, 65536))
out, lens = lz2.s2_encode_blocks(arr); np.asarray(lens[-1:])
t=time.time()
for _ in range(3):
    out, lens = lz2.s2_encode_blocks(arr); np.asarray(lens[-1:])
dt=(time.time()-t)/3
ln=np.asarray(lens)
print(f"XLA s2 pipeline: {dt*1000:.1f} ms, {len(big)/dt/1e9:.3f} GB/s, ratio {ln.sum()/len(big):.4f}")
