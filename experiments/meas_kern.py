import time, numpy as np, jax, jax.numpy as jnp
from compress_tpu.ops import lzkern, lzemit
from compress_tpu import s2
from compress_tpu.utils.varint import put_uvarint

print(jax.devices())
tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt","rb").read()
MB = 16
big = (tw * ((MB<<20)//len(tw)+1))[:MB<<20]
nb = len(big)//65536
arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, 65536))

def sync(x):  # force completion through the tunnel
    return np.asarray(x.reshape(-1)[:1])

# finder only
off, L = lzkern.find_matches_blocks(arr); sync(off); sync(L)
t=time.time()
for _ in range(3):
    off, L = lzkern.find_matches_blocks(arr); sync(off); sync(L)
dt=(time.time()-t)/3
print(f"finder: {dt*1000:.1f} ms, {len(big)/dt/1e9:.3f} GB/s")

# emit only
b0,b1,rl = lzemit.emit_blocks(arr, off, L); sync(b0); sync(rl)
t=time.time()
for _ in range(3):
    b0,b1,rl = lzemit.emit_blocks(arr, off, L); sync(b0); sync(rl)
dt=(time.time()-t)/3
print(f"emit: {dt*1000:.1f} ms, {len(big)/dt/1e9:.3f} GB/s")

# device->host transfer of outputs
t=time.time()
for _ in range(3):
    a=np.asarray(b0); b=np.asarray(b1); c=np.asarray(rl)
dt=(time.time()-t)/3
print(f"fetch: {dt*1000:.1f} ms ({(a.nbytes+b.nbytes+c.nbytes)/1e6:.1f} MB)")

# host assembly
t=time.time()
for _ in range(3):
    bodies = lzemit.assemble_bodies(b0,b1,rl)
dt=(time.time()-t)/3
print(f"assemble(incl fetch): {dt*1000:.1f} ms")
tot=sum(len(x) for x in bodies)
print(f"ratio {tot/len(big):.4f}")
hdr = bytearray(); put_uvarint(hdr, 65536)
assert s2.decode(bytes(hdr)+bodies[0]) == big[:65536], "MISMATCH"
print("decode ok")
