"""Mesh-parallel engine tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import pytest

from compress_tpu.ops import lz2 as lz


def _make_blocks(nb, bs, seed=0):
    rng = np.random.default_rng(seed)
    motif = rng.integers(0, 8, 61, dtype=np.uint8).tobytes()
    data = (motif * (nb * bs // len(motif) + 1))[: nb * bs]
    return np.frombuffer(data, np.uint8).reshape(nb, bs), data


def test_mesh_is_virtual_8():
    assert len(jax.devices()) == 8


def test_encode_blocks_sharded_matches_single_device():
    from compress_tpu.parallel import block_mesh, encode_blocks_sharded

    blocks, _ = _make_blocks(8, 4096)
    mesh = block_mesh()
    out, lens = encode_blocks_sharded(blocks, mesh, tile=256)
    out1, lens1 = lz.s2_encode_blocks(np.asarray(blocks), tile=256)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out1))


def test_encode_blocks_sharded_better_tier():
    """Device better (lz2 level 2) over the mesh: valid and no larger
    than the fast tier (the s2.EncodeBetter analogue)."""
    from compress_tpu.parallel import block_mesh, encode_blocks_sharded
    from compress_tpu import s2
    from compress_tpu.utils.varint import put_uvarint

    blocks, data = _make_blocks(8, 4096, seed=3)
    mesh = block_mesh()
    out1, lens1 = encode_blocks_sharded(blocks, mesh, tile=256, level=1)
    out2, lens2 = encode_blocks_sharded(blocks, mesh, tile=256, level=2)
    lens1, lens2 = np.asarray(lens1), np.asarray(lens2)
    out2 = np.asarray(out2)
    assert lens2.sum() <= lens1.sum()
    for i in range(8):
        hdr = bytearray()
        put_uvarint(hdr, 4096)
        got = s2.decode(bytes(hdr) + out2[i, : lens2[i]].tobytes())
        assert got == data[i * 4096 : (i + 1) * 4096]


def test_encode_step_stats_collectives():
    from compress_tpu.parallel import block_mesh, encode_step_stats

    blocks, data = _make_blocks(16, 4096, seed=2)
    out, lens, total = encode_step_stats(blocks, block_mesh(), tile=256)
    lens = np.asarray(lens)
    assert int(total) == int(lens.sum())
    # ordered gather: every block decodes in order
    from compress_tpu import s2
    from compress_tpu.utils.varint import put_uvarint

    out = np.asarray(out)
    for i in range(16):
        hdr = bytearray()
        put_uvarint(hdr, 4096)
        assert s2.decode(bytes(hdr) + out[i, : lens[i]].tobytes()) == data[i * 4096 : (i + 1) * 4096]


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out, lens = jax.jit(fn)(*args)
    assert np.asarray(lens).shape == (4,)
    g.dryrun_multichip(8)


def test_s2_stream_encode_device_decodable():
    from compress_tpu.parallel import s2_stream_encode_device
    from compress_tpu.s2.stream import Reader
    import io

    data = open("/root/reference/testdata/html.txt", "rb").read() * 3
    stream = s2_stream_encode_device(data)
    got = Reader(io.BytesIO(stream)).read()
    assert got == data


def test_zstd_encode_sharded_roundtrip():
    """Sharded zstd job engine: ppermute halo exchange over the virtual
    mesh, ordered host gather; frame decodes bit-exactly (incl. matches
    into a neighbour shard's overlap prefix)."""
    import numpy as np

    from compress_tpu import zstd
    from compress_tpu.parallel import block_mesh, zstd_encode_sharded

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    JOB, BLOCK = 1 << 13, 1 << 12
    mesh = block_mesh()
    m = mesh.devices.size
    # 2 jobs per device + a tail; repeated pattern so shard-boundary jobs
    # benefit from (and exercise) the halo prefix
    data = (twain[:3000] * (2 * m * JOB // 3000 + 2))[: 2 * m * JOB + 777]
    frame = zstd_encode_sharded(data, mesh, job=JOB, block=BLOCK, checksum=True)
    assert zstd.decompress(frame) == data


def test_zstd_decode_sharded_roundtrip():
    """Sharded batched device decode (P4/P5 pod-scale role): accel and
    plain frames mixed, batch not divisible by the mesh (padding path),
    bit-exact ordered gather."""
    import os

    from compress_tpu.parallel import block_mesh, zstd_decode_sharded
    from compress_tpu.zstd import accel as A
    from compress_tpu.zstd.encoder import compress

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    srcs = [twain[i * 7000 : (i + 1) * 7000] for i in range(11)]
    items = []
    for i, s in enumerate(srcs):
        if i % 3 == 2 or os.environ.get("COMPRESS_TPU_NONATIVE") == "1":
            items.append(compress(s, level=1))   # no sidecar: host walks
        else:
            items.append(A.compress_accel(s, level=1 + i % 2))
    mesh = block_mesh()
    assert zstd_decode_sharded(items, mesh) == srcs


def test_zstd_decode_sharded_multi_block():
    """Multi-block (carried-history scan) frames also shard over the
    mesh, with batch padding."""
    from compress_tpu.parallel import block_mesh, zstd_decode_sharded
    from compress_tpu.zstd import accel as A

    twain = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                 "rb").read()
    srcs = [(twain[i * 9000 :] * 4)[:140_000] for i in range(3)]
    items = [it for s in srcs
             for it in A.split_stream_accel(
                 A.compress_accel(s, multi_block=True))]
    if len(items) != 3 or any(
            A.split_sidecar(it)[0] is None for it in items):
        import pytest

        pytest.skip("sidecar builder unavailable (NONATIVE)")
    assert zstd_decode_sharded(items, block_mesh()) == srcs
