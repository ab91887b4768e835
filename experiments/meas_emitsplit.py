"""Microbench: emit kernel substage costs (chain-ext / rle / parse / merge / emission / route)."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from compress_tpu.ops import lzemit, lzkern

ROWS, LANES, BS, TILE, NT = lzemit.ROWS, lzemit.LANES, lzemit.BS, lzemit.TILE, lzemit.NT

def make_variant(upto):
    """upto: 1=chain_ext, 2=+rle, 3=+parse, 4=+merge, 5=+emission-headers, 6=+route(full)."""
    def kern(blk_ref, off_ref, len_ref, out0_ref, out1_ref, rl_ref, vT, LT, takeT, litT):
        blk = blk_ref[0].astype(jnp.int32)
        off = off_ref[0]; L = len_ref[0]
        rowi, lane = lzemit._iota2()
        g = rowi * LANES + lane
        r_t = g & (TILE - 1)
        if upto >= 1:
            L = lzemit._chain_ext10(off, L, g)
        if upto >= 2:
            for o in (1,2,3,4,8):
                m = (blk == lzemit._shift_down(blk, o)) & (g >= o)
                Lr = lzemit._runlen_fwd(m.astype(jnp.int32), r_t)
                better = (Lr > L) & (Lr >= 4)
                L = jnp.where(better, Lr, L); off = jnp.where(better, o, off)
        take = lit = None
        if upto >= 3:
            L_t = jnp.minimum(L, TILE - r_t)
            valid = L_t >= 4
            off = jnp.where(valid, off, 0)
            lzemit._nat_to_T(valid.astype(jnp.int32), vT)
            lzemit._nat_to_T(L_t, LT)
            def scan_body(it, p):
                for u in range(4):
                    r = it*4+u
                    vrow = vT[pl.ds(r,1),:]; Lrow = LT[pl.ds(r,1),:]
                    active = p == r
                    tk = active & (vrow > 0); li = active & (vrow == 0)
                    p = jnp.where(tk, r + Lrow, jnp.where(active, p+1, p))
                    takeT[pl.ds(r,1),:] = tk.astype(jnp.int32)
                    litT[pl.ds(r,1),:] = li.astype(jnp.int32)
                return p
            jax.lax.fori_loop(0, TILE//4, scan_body, jnp.zeros((1,LANES), jnp.int32))
            take = lzemit._T_to_nat(takeT) > 0
            lit = lzemit._T_to_nat(litT) > 0
        # keep everything alive through the outputs (defeat DCE)
        acc = L + off
        if take is not None:
            acc = acc + take.astype(jnp.int32) * 2 + lit.astype(jnp.int32)
        out0_ref[0] = (acc & 0xFF).astype(jnp.uint8)
        out1_ref[0] = ((acc >> 8) & 0xFF).astype(jnp.uint8)
        rl_ref[0] = jnp.zeros((4, LANES), jnp.int32)
    @jax.jit
    def run(blocks_u8, off, L):
        nb = blocks_u8.shape[0]
        blk3 = blocks_u8.reshape(nb, ROWS, LANES)
        off3 = off.reshape(nb, ROWS, LANES); L3 = L.reshape(nb, ROWS, LANES)
        spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b,0,0), memory_space=pltpu.VMEM)
        return pl.pallas_call(kern, grid=(nb,), in_specs=[spec]*3,
            out_specs=(spec, spec, pl.BlockSpec((1,4,LANES), lambda b:(b,0,0), memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((nb,ROWS,LANES), jnp.uint8),
                       jax.ShapeDtypeStruct((nb,ROWS,LANES), jnp.uint8),
                       jax.ShapeDtypeStruct((nb,4,LANES), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((ROWS,LANES), jnp.int32) for _ in range(4)],
        )(blk3, off3, L3)
    return run

tw = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt","rb").read()
big = (tw * ((16<<20)//len(tw)+1))[:16<<20]
nb = len(big)//65536
arr = jnp.asarray(np.frombuffer(big, np.uint8).reshape(nb, 65536))
off, L = lzkern.find_matches_blocks(arr)
off = off.block_until_ready(); N=10

def timed(f):
    r=f(arr, off, L); jax.block_until_ready(r); np.asarray(r[2].ravel()[:1])
    t=time.time()
    for _ in range(N): r=f(arr, off, L)
    np.asarray(r[2].ravel()[:1])
    return (time.time()-t-0.04)/N*1000

prev = 0.0
for s, name in [(0,"base"),(1,"chain_ext"),(2,"rle"),(3,"parse")]:
    ms = timed(make_variant(s))
    print(f"{name:10s}: {ms:7.2f} ms (+{ms-prev:.2f})")
    prev = ms
# full kernel for reference
r = lzemit.emit_blocks(arr, off, L); jax.block_until_ready(r); np.asarray(r[2].ravel()[:1])
t=time.time()
for _ in range(N): r = lzemit.emit_blocks(arr, off, L)
np.asarray(r[2].ravel()[:1])
print(f"full emit : {(time.time()-t-0.04)/N*1000:7.2f} ms")
