"""Micro-bench 2: hierarchical K-candidate tile gather (route_tiles shape
class: large batch, small operands, one-hot fused into dot).

Gather semantics per 64KB block: out[p] = V[src[p]] where the distinct
source TILES touched by each 128-byte dst tile are capped at K (slot =
run index of src-tile changes; spill bytes masked out).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

P = 1 << 16
T = 512
L = 128
K = 8


def bench(fn, args, iters, name):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    dt = (time.time() - t0) / iters
    B = args[1].shape[0]
    print(f"{name}: B={B}  {dt*1e3:.2f} ms/round  "
          f"({B*P/dt/1e9:.2f} Gbyte/s gathered)")
    return dt


@jax.jit
def k_gather(V, st, sl):
    """V (B,T,L) int16; st (B,P) src tile; sl (B,P) src lane.
    Returns (B,P) gathered + (B,P) ok-mask (False = spilled)."""
    B = V.shape[0]
    stt = st.reshape(B, T, L)  # per dst tile (axis1), 128 bytes
    sll = sl.reshape(B, T, L)
    # slot = run index of src-tile changes within the dst tile
    chg = jnp.concatenate(
        [jnp.zeros((B, T, 1), jnp.int32),
         (stt[:, :, 1:] != stt[:, :, :-1]).astype(jnp.int32)], axis=2)
    slot = jnp.cumsum(chg, axis=2)  # (B,T,L)
    ok = slot < K
    slot_c = jnp.minimum(slot, K - 1)
    # cand[b,t,k] = src tile of run k (route first st of each run to slot k)
    oh_slot = jax.nn.one_hot(slot_c, K, dtype=jnp.bfloat16)  # (B,T,L,K)
    first = (chg == 1) | (
        jax.lax.broadcasted_iota(jnp.int32, (B, T, L), 2) == 0)
    cand = jnp.einsum("btl,btlk->btk",
                      jnp.where(first & ok, stt, 0).astype(jnp.bfloat16),
                      oh_slot * jnp.where(first & ok, 1.0, 0.0)[..., None],
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    # gather K candidate source rows per dst tile (one-hot over T=512)
    oh_cand = jax.nn.one_hot(cand, T, dtype=jnp.bfloat16)  # (B,T,K,T)
    # V as two bf16-exact planes (lo 8 bits fine; sentinel plane separate)
    vpos = jnp.maximum(V, 0).astype(jnp.bfloat16)       # 0..255 exact
    vres = (V >= 0).astype(jnp.bfloat16)
    rows_v = jnp.einsum("btks,bsl->btkl", oh_cand, vpos,
                        preferred_element_type=jnp.float32)
    rows_r = jnp.einsum("btks,bsl->btkl", oh_cand, vres,
                        preferred_element_type=jnp.float32)
    # per-byte: select slot k then lane l
    m_v = jnp.einsum("btlk,btkm->btlm", oh_slot, rows_v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # (B,T,L,Lsrc)
    m_r = jnp.einsum("btlk,btkm->btlm", oh_slot, rows_r.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
    pick = lane == sll[..., None]
    v = jnp.sum(jnp.where(pick, m_v, 0.0), axis=-1)
    r = jnp.sum(jnp.where(pick, m_r, 0.0), axis=-1) > 0.5
    vi = v.astype(jnp.int32).reshape(B, P)
    ri = (r & ok).reshape(B, P)
    return jnp.where(ri, vi, -1), ri


def reference(Vn, src):
    B = Vn.shape[0]
    vf = Vn.reshape(B, P)
    bidx = np.arange(B)[:, None]
    return vf[bidx, src]


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    for B in (16, 64, 256):
        # realistic run structure: piecewise-constant offsets (runs of ~24)
        n_runs = P // 24 + 1
        run_off = rng.integers(1, P // 2, (B, n_runs))
        off = np.repeat(run_off, 24, axis=1)[:, :P]
        pos = np.arange(P)[None, :]
        src = np.maximum(pos - off, 0).astype(np.int32)
        V = rng.integers(-1, 256, (B, T, L)).astype(np.int16)
        args = (jnp.asarray(V), jnp.asarray(src >> 7), jnp.asarray(src & 127))
        dt = bench(k_gather, args, 10, f"E hierarchical K={K}")
        got, ok = [np.asarray(x) for x in k_gather(*args)]
        want = reference(V, src)
        okf = ok.mean()
        exact = (got[ok] == np.where(want >= 0, want & 0xFF, -1)[ok]).all()
        print(f"   ok-frac={okf*100:.2f}%  exact-on-ok={exact}")


if __name__ == "__main__":
    main()
