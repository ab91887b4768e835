"""Block-parallel compression over a device mesh.

The unit of parallelism is the independent 64 KiB S2 chunk (offsets reset
per chunk — s2/README.md "offset is reset on every block in streams"), so
the whole engine is data-parallel on the leading block axis: shard it over
the mesh's "data" axis, run the device encoder, and gather outputs in block
order (the jobFlusher equivalent is a host-side ordered concat).

Reference parity: zstd enc_jobs.go job engine + s2 writer fan-out
(SURVEY.md §2.9 P3/P5).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compress_tpu.ops import lz2 as lz
from compress_tpu.utils.crc import crc32c_masked
from compress_tpu.utils.varint import put_uvarint

MAGIC_CHUNK_S2 = b"\xff\x06\x00\x00S2sTwO"


def block_mesh(devices=None) -> Mesh:
    """1-D data mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("data",))


def encode_blocks_sharded(blocks, mesh: Mesh | None = None,
                          tile: int = lz.TILE, level: int = 1):
    """Encode (NB, block_size) uint8 blocks sharded over the mesh.

    NB must divide by the mesh size. Returns (out, lens) with the same
    sharding; host gathers preserve block order. level 2 = the device
    better tier (chain extension + top-K offset probing — the
    s2.EncodeBetter analogue on device)."""
    mesh = mesh or block_mesh()
    sharding = NamedSharding(mesh, P("data", None))
    blocks = jax.device_put(jnp.asarray(blocks), sharding)
    out, lens = jax.jit(
        lz.s2_encode_blocks,
        static_argnames=("tile", "level"),
        out_shardings=(NamedSharding(mesh, P("data", None)),
                       NamedSharding(mesh, P("data"))),
    )(blocks, tile=tile, level=level)
    return out, lens


def encode_step_stats(blocks, mesh: Mesh | None = None, tile: int = lz.TILE):
    """The full sharded "step" with collectives — encode + cluster stats.

    Uses shard_map so the collectives are explicit: per-device encode, psum
    of compressed bytes (throughput accounting) and all_gather of lengths
    (the ordered-flusher's size table). Returns (out, lens, total_bytes)."""
    mesh = mesh or block_mesh()

    def step(b):
        out, lens = lz.s2_encode_blocks(b, tile=tile)
        total = jax.lax.psum(jnp.sum(lens), "data")
        all_lens = jax.lax.all_gather(lens, "data", tiled=True)
        return out, all_lens, total

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P("data", None), P(), P()),
        check_vma=False,  # encode is per-shard; collectives are explicit
    )
    sharding = NamedSharding(mesh, P("data", None))
    blocks = jax.device_put(jnp.asarray(blocks), sharding)
    return jax.jit(fn)(blocks)


def s2_stream_encode_device(data: bytes, mesh: Mesh | None = None) -> bytes:
    """Produce a complete .s2 framed stream using the device encoder for

    full 64 KiB chunks (host framing + CRC), host codec for the tail.
    The output is decodable by the reference S2 reader."""
    from compress_tpu.s2 import block as s2block

    out = bytearray(MAGIC_CHUNK_S2)
    n = len(data)
    nb = n // lz.B
    bodies = []
    if nb > 0:
        mesh = mesh or block_mesh()
        m = mesh.devices.size
        full = (nb // m) * m
        arr = np.frombuffer(data[: full * lz.B], np.uint8).reshape(-1, lz.B)
        if full:
            enc, lens = encode_blocks_sharded(arr, mesh)
            enc = np.asarray(enc)
            lens = np.asarray(lens)
            bodies += [enc[i, : lens[i]].tobytes() for i in range(full)]
        for i in range(full, nb):  # remainder blocks on host
            bodies.append(s2block._encode_body(data[i * lz.B : (i + 1) * lz.B], 0))
    tail = data[nb * lz.B :]
    if tail:
        bodies.append(s2block._encode_body(tail, 0))

    pos = 0
    for i, body in enumerate(bodies):
        chunk_data = data[pos : pos + (lz.B if i < nb else len(tail))]
        pos += len(chunk_data)
        crc = crc32c_masked(chunk_data)
        payload = bytearray()
        put_uvarint(payload, len(chunk_data))
        payload += body
        if len(payload) >= len(chunk_data):  # store uncompressed
            chunk = bytes([0x01]) + (len(chunk_data) + 4).to_bytes(3, "little") \
                + crc.to_bytes(4, "little") + chunk_data
        else:
            chunk = bytes([0x00]) + (len(payload) + 4).to_bytes(3, "little") \
                + crc.to_bytes(4, "little") + bytes(payload)
        out += chunk
    return bytes(out)


# ---------------------------------------------------------------------------
# Sharded zstd job engine with halo (overlap-prefix) exchange
# ---------------------------------------------------------------------------


def zstd_encode_sharded(data: bytes, mesh: Mesh | None = None,
                        job: int | None = None, block: int | None = None,
                        checksum: bool = False, level: int = 2) -> bytes:
    """zstd-compress `data` with 1 MiB jobs sharded over the device mesh.

    The reference's concurrent job engine (zstd/enc_jobs.go, SURVEY §2.9
    P3) maps to: data-parallel job shards; each shard fetches its left
    neighbour's job tail as overlap prefix with a ppermute over the mesh
    (the ICI halo exchange of SURVEY §5.8); compressed outputs are pulled
    per shard and concatenated in job order on the host (the jobFlusher).
    Sub-job leftovers go through the host matcher.
    """
    import jax.numpy as jnp

    from compress_tpu.ops import zdev
    from compress_tpu.utils.xxhash64 import xxh64
    from compress_tpu.zstd import frame as F
    from compress_tpu.zstd.device import (_assemble_job, emit_blocks,
                                          tail_bodies)

    job = job or zdev.JOB
    block = block or zdev.BLOCK
    pre = job // 8
    mesh = mesh or block_mesh()
    m = mesh.devices.size
    from compress_tpu.utils.debuglog import dbg

    dbg("engine", "zstd_encode_sharded n=%d mesh=%d job=%d block=%d",
        len(data), m, job, block)
    n = len(data)
    n_jobs = n // job
    full = (n_jobs // m) * m  # jobs handled on the mesh

    if full == 0:
        # nothing for the mesh to do (includes n == 0, which must still
        # produce a valid frame with a last block) — host encoder handles it
        from compress_tpu.zstd.encoder import compress

        return compress(data, level=1, checksum=checksum)

    # the mesh-remainder tail goes through the host Matcher, which may match
    # anywhere within `rest` — the declared window must cover it
    rest_len = n - full * job
    window = max(job + pre, rest_len)
    out = bytearray(F.write_frame_header(n, window, False, checksum))
    bodies, regens = [], []
    if full:
        arr = np.frombuffer(data[: full * job], np.uint8).reshape(full, job)
        prefixes = np.zeros((full, pre), np.uint8)
        has_prefix = np.zeros(full, bool)
        for j in range(1, full):
            prefixes[j] = np.frombuffer(data[j * job - pre : j * job], np.uint8)
            has_prefix[j] = True
        # jobs are laid out shard-major so each device gets a contiguous
        # run of jobs; the first job of shard s>0 needs the tail of shard
        # s-1's last job — shipped with a ppermute ring step.
        k = full // m

        def step(jobs_l, pref_l, hasp_l):
            # halo: send my last job's tail right, receive from the left
            tail = jobs_l[-1, job - pre:]
            halo = jax.lax.ppermute(tail, "data",
                                    perm=[(i, i + 1) for i in range(m - 1)])
            first_pref = jnp.where(jax.lax.axis_index("data") > 0,
                                   halo, pref_l[0])
            pref = jnp.concatenate([first_pref[None], pref_l[1:]], axis=0)
            hasp = hasp_l | (jnp.zeros(k, bool)
                             .at[0].set(jax.lax.axis_index("data") > 0))
            return zdev.zstd_encode_jobs(jobs_l, job=job, block=block,
                                         prefixes=pref, has_prefix=hasp,
                                         level=level)

        fn = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data",)),
            out_specs=P("data"),
            check_vma=False)
        sharding = NamedSharding(mesh, P("data", None))
        t = jax.jit(fn)(
            jax.device_put(jnp.asarray(arr), sharding),
            jax.device_put(jnp.asarray(prefixes), sharding),
            jax.device_put(jnp.asarray(has_prefix), NamedSharding(mesh, P("data"))))
        if jax.process_count() > 1:
            # DCN path (SURVEY §5.8): shards live on multiple hosts; pull
            # the full arrays to every host so each can assemble the frame
            # identically (the reference jobFlusher role, host-side)
            from jax.experimental import multihost_utils

            t = {kk: np.asarray(
                multihost_utils.process_allgather(v, tiled=True))
                for kk, v in t.items()}
        else:
            t = {kk: np.asarray(v) for kk, v in t.items()}
        for j in range(full):
            jb = data[j * job : (j + 1) * job]
            for body in _assemble_job(jb, t, j, block):
                bodies.append(body)
                regens.append(block)

    # leftover jobs (mesh remainder) + sub-job tail via the host matcher
    rest = data[full * job :]
    if rest:
        tb, tr = tail_bodies(rest)
        bodies += tb
        regens += tr
    emit_blocks(out, data, bodies, regens)
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def zstd_decode_sharded(frames, mesh: Mesh | None = None,
                        max_rounds: int = 4):
    """Batched device decode sharded over the mesh (reference P4/P5 at
    pod scale: frames are independent, so decode is pure data
    parallelism — the literal scan and LZ-execute batches carry a
    'data'-sharded leading axis; outputs gather on the host in order).

    Accepts the same items as zstd.device_dec.decompress_frames_device
    (accel-sidecar frames decode with zero per-symbol host work)."""
    from compress_tpu.zstd import device_dec

    mesh = mesh or block_mesh()
    return device_dec.decompress_frames_device(frames, max_rounds,
                                               mesh=mesh)
