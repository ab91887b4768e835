"""Pallas VMEM-arena LZ executor vs the XLA round graph — bit-exact
differentials in interpret mode (the noasm-analogue for this kernel)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu.ops import exec_pallas as XP  # noqa: E402
from compress_tpu.ops import execute as X  # noqa: E402

OUT = X.OUT_BASE


def _run_both(lit, plans):
    src, dst, length, caps = X.pack_plans(plans)
    args = (jnp.asarray(lit), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(length), caps)
    a = np.asarray(X.execute_rounds_jit(*args))
    b = np.asarray(XP.execute_rounds_pallas(*args, interpret=True))
    return a, b


def test_hand_plan_shapes():
    rng = np.random.default_rng(1)
    lit = rng.integers(0, 256, (2, 512, 128)).astype(np.uint8)
    plans = []
    # block 0: lit copies incl. row-crossing unaligned source + a copy
    # whose aligned base is row -1 (regression: r1 clipped after +1)
    plans.append(dict(
        src=np.array([5, 200, OUT + 3, 6], np.int32),
        dst=np.array([OUT + 0, OUT + 10, OUT + 40, OUT + 56], np.int32),
        len=np.array([10, 20, 7, 6], np.int32),
        round=np.array([0, 0, 1, 0], np.int32), n_rounds=2))
    # block 1: chained rounds
    plans.append(dict(
        src=np.array([0, OUT, OUT + 64], np.int32),
        dst=np.array([OUT, OUT + 64, OUT + 128], np.int32),
        len=np.array([64, 64, 64], np.int32),
        round=np.array([0, 1, 2], np.int32), n_rounds=3))
    a, b = _run_both(lit, plans)
    assert np.array_equal(a, b)


def test_real_frame_plan():
    from compress_tpu.zstd import accel as AC

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()
    src_data = data[:16384]
    blob = AC.compress_accel(src_data, level=1)
    side, _ = AC.split_sidecar(blob)
    _, ab = AC.parse_sidecar(side)
    plan = AC.accel_plan(ab[0])
    rng = np.random.default_rng(2)
    lit = rng.integers(0, 256, (1, 512, 128)).astype(np.uint8)
    a, b = _run_both(lit, [plan])
    assert np.array_equal(a, b)


def test_roundtrip_through_device_dec_cpu_path_unchanged():
    # CPU keeps the XLA path; the full accel decode remains bit-exact
    from compress_tpu.zstd import accel as AC
    from compress_tpu.zstd import device_dec as DD

    data = open("/root/reference/testdata/html.txt", "rb").read()[:30000]
    blob = AC.compress_accel(data, level=1)
    assert DD.decompress_frames_device([blob]) == [data]
