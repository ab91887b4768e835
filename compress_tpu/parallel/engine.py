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


def encode_blocks_sharded(blocks, mesh: Mesh | None = None, tile: int = lz.TILE):
    """Encode (NB, block_size) uint8 blocks sharded over the mesh.

    NB must divide by the mesh size. Returns (out, lens) with the same
    sharding; host gathers preserve block order."""
    mesh = mesh or block_mesh()
    sharding = NamedSharding(mesh, P("data", None))
    blocks = jax.device_put(jnp.asarray(blocks), sharding)
    out, lens = jax.jit(
        lz.s2_encode_blocks,
        static_argnames=("tile",),
        out_shardings=(NamedSharding(mesh, P("data", None)),
                       NamedSharding(mesh, P("data"))),
    )(blocks, tile=tile)
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
