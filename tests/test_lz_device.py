"""Device (JAX) S2 encoder tests — run on the CPU backend.

The device encoder's output bytes differ from the host encoder's (both are
valid S2; the reference makes the same non-promise between its own
versions). What must hold: every emitted block decodes bit-exactly with the
host (reference-semantics) decoder, and the ratio is in the same league.
"""

import numpy as np
import pytest

from compress_tpu import s2
from compress_tpu.ops import lz2 as lz
from compress_tpu.s2 import block as s2block
from compress_tpu.utils.varint import put_uvarint


def _decode_body(body: np.ndarray) -> bytes:
    hdr = bytearray()
    put_uvarint(hdr, lz.B)
    return s2.decode(bytes(hdr) + body.tobytes())


@pytest.fixture(scope="module")
def twain():
    return open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()


def test_device_encode_roundtrip_text(twain):
    n_blocks = min(len(twain) // lz.B, 3)
    data = twain[: n_blocks * lz.B]
    bodies = lz.encode_blocks_np(data)
    assert len(bodies) == n_blocks
    for i, body in enumerate(bodies):
        assert _decode_body(body) == data[i * lz.B : (i + 1) * lz.B]


def test_device_encode_ratio_competitive(twain):
    data = twain[: lz.B]
    body = lz.encode_blocks_np(data)[0]
    host = s2.encode(data)
    # device exact-candidate search should be within 5% of (usually better
    # than) the host greedy encoder
    assert len(body) <= len(host) * 1.05


@pytest.mark.parametrize(
    "kind", ["zeros", "random", "rle_period3", "alternating", "text_random_mix"]
)
def test_device_encode_adversarial(kind, twain):
    rng = np.random.default_rng(7)
    if kind == "zeros":
        data = bytes(lz.B)
    elif kind == "random":
        data = rng.integers(0, 256, lz.B, dtype=np.uint8).tobytes()
    elif kind == "rle_period3":
        data = (b"abc" * (lz.B // 3 + 1))[: lz.B]
    elif kind == "alternating":
        # 4-byte matches everywhere, worst case for op density
        data = (b"abcdefgh" * (lz.B // 8))[: lz.B]
    else:
        half = lz.B // 2
        data = twain[:half] + rng.integers(0, 256, lz.B - half, dtype=np.uint8).tobytes()
    body = lz.encode_blocks_np(data)[0]
    assert len(body) <= lz._max_out(lz.B)
    assert _decode_body(body) == data


def test_device_encode_level2_better(twain):
    """level 2 (chain extension + offset probing) must roundtrip and beat
    level 1 on long-range-redundant data."""
    import jax.numpy as jnp

    seg = twain[: lz.B // 2]
    data = seg + seg  # second half repeats at offset 32K
    arr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(1, lz.B))
    out1, len1 = lz.s2_encode_blocks(arr, level=1)
    out2, len2 = lz.s2_encode_blocks(arr, level=2)
    for out, lens in ((out1, len1), (out2, len2)):
        body = np.asarray(out[0])[: int(lens[0])]
        assert _decode_body(body) == data
    assert int(len2[0]) < int(len1[0])


def test_device_encode_long_match_repeat_tags(twain):
    """Matches longer than one copy tag split into copy + repeat tags."""
    import jax.numpy as jnp

    # period 4: the RLE probe sees the full run length even at level 1
    data = (b"abcd" * (lz.B // 4))[: lz.B]
    bodies = lz.encode_blocks_np(data)
    assert _decode_body(bodies[0]) == data
    assert len(bodies[0]) < lz.B // 40

    # long period needs level 2 (chain extension) for full-length matches
    data = (twain[:701] * (lz.B // 701 + 1))[: lz.B]
    arr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(1, lz.B))
    out, lens = lz.s2_encode_blocks(arr, level=2)
    body = np.asarray(out[0])[: int(lens[0])]
    assert _decode_body(body) == data
    assert len(body) < lz.B // 12


def test_compact_route_matches_logshift():
    """compact_route (two one-hot routings) is bit-identical to
    compact_logshift on every payload width and mask density."""
    import numpy as np
    import jax.numpy as jnp

    from compress_tpu.ops import common as C

    rng = np.random.default_rng(11)
    for N, tile in ((1536, None), (1664, None), (100, None), (4096, 256)):
        for dens in (0.0, 0.01, 0.5, 0.97, 1.0):
            mask = rng.random((3, N)) < dens
            v = jnp.asarray(mask)
            byte = jnp.asarray(rng.integers(0, 256, (3, N), dtype=np.int32))
            wide = jnp.asarray(rng.integers(0, 1 << 26, (3, N), dtype=np.int32))
            h16 = jnp.asarray(rng.integers(0, 1 << 16, (3, N), dtype=np.int32))
            for arrays, bits in (([byte], 8), ([h16], 16), ([wide, h16], 32)):
                a0, r0 = C.compact_logshift(v, arrays)
                a1, r1 = C.compact_route(v, arrays, plane_bits=bits, tile=tile)
                assert np.array_equal(np.asarray(a0), np.asarray(a1)), (N, dens)
                for x, y in zip(r0, r1):
                    # logshift leaves stale values past the alive prefix;
                    # both contracts only define the alive region
                    xa = np.where(np.asarray(a0), np.asarray(x), 0)
                    ya = np.asarray(y)
                    assert np.array_equal(xa, ya), (N, dens, bits)
