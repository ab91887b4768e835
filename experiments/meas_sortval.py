"""A/B the bitonic sort structure: ref-roundtrip-per-stage (current
lzkern._bitonic_refs) vs value-carried variants that touch VMEM scratch
only at phase boundaries (or never).

Hypothesis from meas_gather: a register-resident 1-panel compare-exchange
stage costs 0.024 us vs the ~0.5 us/stage the current kernel pays, i.e.
the sort is VMEM-ref-roundtrip bound, not compute bound.
"""

import sys, time, functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compress_tpu.ops import lzkern

ROWS, LANES = 512, 128
BS = ROWS * LANES
LOG_N = 16


def _stage_vals(key, payloads, g, k, j, lane, row, sec_of):
    d = 1 << j
    if j < 7:
        lidx = lane ^ d
        partner = lambda a: jnp.take_along_axis(a, lidx, axis=1)
    else:
        rd = d >> 7
        up = (row & rd) == 0
        def partner(a):
            fwd = pltpu.roll(a, ROWS - rd, 0)
            bwd = pltpu.roll(a, rd, 0)
            return jnp.where(up, fwd, bwd)
    pkey = partner(key)
    pps = [partner(p) for p in payloads]
    asc = (jax.lax.shift_right_logical(g, k) & 1) == 0
    lower = (g & d) == 0
    want_min = lower == asc
    if sec_of is not None:
        ms = sec_of(key, payloads)
        ps = sec_of(pkey, pps)
        p_less = (pkey < key) | ((pkey == key) & (ps < ms))
    else:
        p_less = pkey < key
    swap = p_less == want_min
    key = jnp.where(swap, pkey, key)
    payloads = [jnp.where(swap, pp, p) for pp, p in zip(pps, payloads)]
    return key, payloads


def bitonic_vals(key, payloads, g, sec_of=None):
    """Value-carried bitonic: fori over k phases, j stages unrolled inside,
    panels live in the loop carry (registers/compiler-managed)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)

    def phase_a(k, c):
        key, payloads = c[0], list(c[1:])
        for j in range(6, -1, -1):
            nk, nps = _stage_vals(key, payloads, g, k, j, lane, row, sec_of)
            take = j < k
            # static-shape predication via select on traced (j < k)
            m = jnp.asarray(take if isinstance(take, bool) else take)
            key = jnp.where(m, nk, key)
            payloads = [jnp.where(m, np_, p) for np_, p in zip(nps, payloads)]
        return (key, *payloads)

    c = jax.lax.fori_loop(1, 8, phase_a, (key, *payloads))

    def phase_b(k, c):
        key, payloads = c[0], list(c[1:])
        for j in range(LOG_N - 1, 6, -1):
            nk, nps = _stage_vals(key, payloads, g, k, j, lane, row, sec_of)
            m = j < k
            m = jnp.asarray(m if isinstance(m, bool) else m)
            key = jnp.where(m, nk, key)
            payloads = [jnp.where(m, np_, p) for np_, p in zip(nps, payloads)]
        for j in range(6, -1, -1):
            key, payloads = _stage_vals(key, payloads, g, k, j, lane, row, sec_of)
        return (key, *payloads)

    c = jax.lax.fori_loop(8, LOG_N + 1, phase_b, c)
    return c[0], list(c[1:])


def make_kernel(npay, sec):
    def kern(x_ref, o_ref, *scr):
        g = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        key = x_ref[0]
        payloads = [jnp.bitwise_xor(key, jnp.int32(17 * (i + 1))) for i in range(npay)]
        sec_of = (lambda k_, ps: ps[0] & 0xFFFF) if sec else None
        key, payloads = bitonic_vals(key, payloads, g, sec_of)
        acc = key
        for p in payloads:
            acc = acc ^ p
        o_ref[0] = acc
    return kern


def make_ref_kernel(npay, sec):
    def kern(x_ref, o_ref, *scr):
        g = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES + \
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        key_ref = scr[0]
        p_refs = list(scr[1:1 + npay])
        key_ref[:] = x_ref[0]
        for i, p in enumerate(p_refs):
            p[:] = jnp.bitwise_xor(x_ref[0], jnp.int32(17 * (i + 1)))
        sec_of = (lambda k_, ps: ps[0] & 0xFFFF) if sec else None
        lzkern._bitonic_refs(key_ref, p_refs, g, sec_of=sec_of)
        acc = key_ref[:]
        for p in p_refs:
            acc = acc ^ p[:]
        o_ref[0] = acc
    return kern


def run(name, kern, nscr, nb=256):
    x = jnp.asarray(np.random.randint(0, 1 << 30, (nb, ROWS, LANES), np.int32))
    spec = pl.BlockSpec((1, ROWS, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda a: pl.pallas_call(
            kern, grid=(nb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nb, ROWS, LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32) for _ in range(nscr)],
        )(a))
        f(x).block_until_ready()
        t0 = time.perf_counter()
        f(x).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name:34s} {dt*1e3:8.2f} ms /16MiB  ({dt/nb*1e6:7.2f} us/block)")
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}")


def main():
    run("REF 3-panel sec (current fwd)", make_ref_kernel(2, True), 3)
    run("REF 2-panel (current back)", make_ref_kernel(1, False), 2)
    run("VAL 3-panel sec", make_kernel(2, True), 0)
    run("VAL 2-panel sec", make_kernel(1, True), 0)
    run("VAL 2-panel", make_kernel(1, False), 0)
    run("VAL 1-panel", make_kernel(0, False), 0)


if __name__ == "__main__":
    main()
