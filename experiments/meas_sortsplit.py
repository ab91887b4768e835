"""Microbench: cost split of the finder (prep / fwd sort / back sort)."""
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from compress_tpu.ops import lzkern

ROWS, LANES, BS = lzkern.ROWS, lzkern.LANES, lzkern.BS

def make_variant(do_fwd, do_back, fwd_payloads=2):
    def body(blk_i32, key_ref, p1_ref, p2_ref):
        g = lzkern._giota()
        def b(k):
            return lzkern._shift_up(blk_i32, k) if k else blk_i32
        b1, b2, b3 = b(1), b(2), b(3)
        v32 = blk_i32 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        key_ref[:] = jnp.where(g >= lzkern._SENT_BASE, g ^ jnp.int32(0x5A5A5A5A), v32)
        p1_ref[:] = g | (b(4) << 16) | (b(5) << 24)
        p2_ref[:] = b(6) | (b(7) << 8) | (b(8) << 16) | (b(9) << 24)
        sec = lambda k_, ps: ps[0] & 0xFFFF
        if do_fwd:
            prefs = [p1_ref, p2_ref][:fwd_payloads]
            lzkern._bitonic_refs(key_ref, prefs, g, sec_of=sec)
        if do_back:
            lzkern._bitonic_refs(key_ref, [p1_ref], g)
        return key_ref[:], p1_ref[:]
    def kern(blk_ref, off_ref, len_ref, key_s, p1_s, p2_s):
        blk = blk_ref[0].astype(jnp.int32)
        o, l = body(blk, key_s, p1_s, p2_s)
        off_ref[0] = o
        len_ref[0] = l
    @jax.jit
    def run(blocks_u8):
        nb = blocks_u8.shape[0]
        blk3 = blocks_u8.reshape(nb, ROWS, LANES)
        spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(kern, grid=(nb,), in_specs=[spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32),
                       jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32) for _ in range(3)],
        )(blk3)
    return run

tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt","rb").read()
big = (tw * ((16<<20)//len(tw)+1))[:16<<20]
nb = len(big)//65536
arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, 65536))
N=10

def timed(f):
    r=f(arr); jax.block_until_ready(r); np.asarray(r[0].ravel()[:1])
    t=time.time()
    for _ in range(N): r=f(arr)
    np.asarray(r[0].ravel()[:1])
    return (time.time()-t-0.04)/N*1000

base = timed(make_variant(False, False))
fwd2 = timed(make_variant(True, False, 2))
fwd1 = timed(make_variant(True, False, 1))
both = timed(make_variant(True, True, 2))
print(f"prep only:        {base:8.2f} ms")
print(f"prep+fwd(2pl):    {fwd2:8.2f} ms  -> fwd2 = {fwd2-base:.2f}")
print(f"prep+fwd(1pl):    {fwd1:8.2f} ms  -> fwd1 = {fwd1-base:.2f}")
print(f"prep+fwd2+back:   {both:8.2f} ms  -> back = {both-fwd2:.2f}")
