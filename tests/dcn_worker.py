"""Worker for the multi-process (DCN) mesh test.

Launched as: python dcn_worker.py <coordinator> <num_procs> <pid> <outdir>

Each process contributes 4 virtual CPU devices to a global 8-device mesh
spanning two processes, runs zstd_encode_sharded over the GLOBAL mesh
(the halo ppermute crosses the process boundary — the DCN path of
SURVEY §5.8), and writes the resulting frame bytes for the test to
compare (every host assembles the same frame)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

# the axon sitecustomize imports jax before us; env alone is too late
jax.config.update("jax_platforms", "cpu")


def main():
    coord, nprocs, pid, outdir = sys.argv[1:5]
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nprocs),
                               process_id=int(pid))
    assert jax.device_count() == 8, jax.devices()
    assert jax.process_count() == int(nprocs)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from compress_tpu.parallel import engine

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()
    # tiny jobs: CPU-emulated device kernels are slow; what matters is the
    # halo crossing the process boundary, not volume
    job, block = 1 << 15, 1 << 13
    data = data[: 9 * job + 4321]  # 8 mesh jobs + remainder

    mesh = engine.block_mesh()
    frame = engine.zstd_encode_sharded(data, mesh=mesh, job=job,
                                       block=block, checksum=True)
    with open(os.path.join(outdir, f"frame_{pid}.bin"), "wb") as f:
        f.write(frame)


if __name__ == "__main__":
    main()
