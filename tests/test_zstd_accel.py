"""Encoder-emitted checkpoint side channel (zstd/accel.py) — r3.

The sidecar must make batched device decode self-sufficient: zero
per-symbol host work (no _hwalk, no seq_accel, no per-seq Python), while
the combined stream stays decodable by libzstd (skippable frame).
"""

import io
import os

import numpy as np
import pytest
import zstandard

# the sidecar BUILDER is native-only by design (encode-time C++ walk);
# NONATIVE mode has no sidecars to test — the fallback contract is
# covered by test_ineligible_shapes_fall_back running in native mode
pytestmark = pytest.mark.skipif(
    os.environ.get("COMPRESS_TPU_NONATIVE") == "1",
    reason="accel sidecar builder is native-only")

from compress_tpu.zstd import accel as A
from compress_tpu.zstd import decompress, device_dec
from compress_tpu.zstd.encoder import compress


def _twain(n=24000, off=0):
    d = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
             "rb").read()
    return d[off : off + n]


def test_sidecar_roundtrip_and_plan_simulation():
    data = _twain(30000)
    for level in (1, 2, 3):
        frame = compress(data, level=level)
        side = A.build_sidecar(frame)
        assert side is not None
        payload, rest = A.split_sidecar(side + frame)
        assert rest == frame
        a = A.parse_sidecar(payload)[1][0]
        assert a is not None
        want = decompress(frame)
        assert a.total_out == len(want)
        # host-simulate the plan round by round: output must be exact
        plan = A.accel_plan(a)
        lit = device_dec._parse_literals_any(frame[_hdr(frame) + 3 :])
        lits = _host_literals(lit)
        arena = np.zeros(1024 * 128, np.int64)
        arena[: len(lits)] = np.frombuffer(lits, np.uint8)
        for r in range(plan["n_rounds"]):
            m = plan["round"] == r
            for s, d, ln in zip(plan["src"][m], plan["dst"][m],
                                plan["len"][m]):
                arena[d : d + ln] = arena[s : s + ln]
        got = arena[512 * 128 : 512 * 128 + a.total_out].astype(
            np.uint8).tobytes()
        assert got == want


def _hdr(frame):
    from compress_tpu.zstd.frame import parse_frame_header

    return parse_frame_header(frame).header_size


def _host_literals(lit):
    kind, regen, lens, streams, table, _ = lit
    if kind == 1:
        return streams
    if kind == 2:
        return streams * regen
    sym_t, nb_t, max_bits = table
    parts = []
    for q in range(len(streams)):
        from compress_tpu.fse.core import BitReaderReverse

        br = BitReaderReverse(streams[q])
        bitpos = br.bitpos
        out = bytearray()
        for _ in range(lens[q]):
            bp = bitpos - max_bits
            if bp >= 0:
                chunk = int.from_bytes(streams[q][bp >> 3 : (bp >> 3) + 9],
                                       "little")
                w = (chunk >> (bp & 7)) & ((1 << max_bits) - 1)
            else:
                chunk = int.from_bytes(streams[q][0:9], "little")
                w = (chunk << -bp) & ((1 << max_bits) - 1)
            out.append(int(sym_t[w]))
            bitpos -= min(int(nb_t[w]), bitpos)
        parts.append(bytes(out))
    return b"".join(parts)


def test_checkpoint_parity_with_host_walks():
    data = _twain(20000)
    frame = compress(data, level=1)
    side = A.build_sidecar(frame)
    payload, _ = A.split_sidecar(side + frame)
    a = A.parse_sidecar(payload)[1][0]
    body = device_dec._parse_single_block(frame)
    lit = device_dec._parse_4x_literals(body)
    regen, lens, streams, (sym_t, nb_t, max_bits), _spos = lit
    for q in range(4):
        cks = device_dec._hwalk(streams[q], sym_t, nb_t, max_bits,
                                lens[q], 32)
        assert list(a.lit_cks[q]) == cks


def test_device_decode_zero_host_walks(monkeypatch):
    torig = device_dec._hwalk
    calls = {"n": 0}

    def counting(*args, **kw):
        calls["n"] += 1
        return torig(*args, **kw)

    monkeypatch.setattr(device_dec, "_hwalk", counting)
    srcs = [_twain(12000), _twain(12000, 40000),
            b"A" * 9000, _twain(6000) + bytes(range(256)) * 8]
    blobs = [A.compress_accel(s, level=1 + i % 3)
             for i, s in enumerate(srcs)]
    out = device_dec.decompress_frames_device(blobs)
    assert out == srcs
    assert calls["n"] == 0  # the whole batch decoded without host walks


def test_accel_stream_is_valid_zstd():
    data = _twain(15000)
    blob = A.compress_accel(data, level=2)
    r = zstandard.ZstdDecompressor().stream_reader(
        io.BytesIO(blob), read_across_frames=True)
    assert r.read() == data
    assert decompress(blob) == data


def test_ineligible_shapes_fall_back():
    # tiny input: encoder emits a raw block -> no sidecar, host decode
    data = b"xy"
    blob = A.compress_accel(data, level=1)
    assert A.split_sidecar(blob)[0] is None
    assert device_dec.decompress_frames_device([blob]) == [data]


def test_hostile_sidecar_falls_back():
    """Corrupt sidecar payloads must never crash or mis-decode: the
    decoder either rejects them (host fallback) or the plan validation
    trips (ValueError -> host fallback). Output stays bit-exact."""
    import numpy as np

    data = _twain(9000)
    blob = A.compress_accel(data, level=1)
    payload_len = int.from_bytes(blob[4:8], "little")
    rng = np.random.default_rng(0)
    for _ in range(24):
        b = bytearray(blob)
        # flip a random byte INSIDE the sidecar payload
        k = 8 + int(rng.integers(0, payload_len))
        b[k] ^= 1 + int(rng.integers(0, 255))
        out = device_dec.decompress_frames_device([bytes(b)])
        assert out == [data]


def test_multi_segment_accel_stream():
    """r3: inputs over 64 KiB segment into independent single-block
    frames, all device-decodable and libzstd-decodable as one stream."""
    data = _twain(200000)
    blob = A.compress_accel(data, level=1)
    r = zstandard.ZstdDecompressor().stream_reader(
        io.BytesIO(blob), read_across_frames=True)
    assert r.read() == data
    assert decompress(blob) == data
    items = A.split_stream_accel(blob)
    assert len(items) == -(-len(data) // A.SEG)
    outs = device_dec.decompress_frames_device(items)
    assert b"".join(outs) == data


def test_multi_block_accel_roundtrip():
    """r3: multi_block=True emits ONE frame of 64 KiB blocks with
    cross-block matches (carried-history device decode). Bit-exact on
    device with zero host walks, libzstd-decodable, and smaller than
    the segmented stream on repetitive input."""
    data = (_twain(65536) * 5)[:300_000]
    blob = A.compress_accel(data, level=1, multi_block=True)
    seg = A.compress_accel(data, level=1)
    assert len(blob) < len(seg)  # history reaches across blocks
    r = zstandard.ZstdDecompressor().stream_reader(
        io.BytesIO(blob), read_across_frames=True)
    assert r.read() == data
    items = A.split_stream_accel(blob)
    assert len(items) == 1  # one frame, one sidecar
    outs = device_dec.decompress_frames_device(items)
    assert b"".join(outs) == data


def test_multi_block_zero_host_walks(monkeypatch):
    from compress_tpu.ops import execute as X

    torig = device_dec._hwalk
    calls = {"n": 0, "exec": 0}

    def counting(*args, **kw):
        calls["n"] += 1
        return torig(*args, **kw)

    xorig = X.execute_blocks_hist_jit

    def counting_exec(*args, **kw):
        calls["exec"] += 1
        return xorig(*args, **kw)

    monkeypatch.setattr(device_dec, "_hwalk", counting)
    monkeypatch.setattr(X, "execute_blocks_hist_jit", counting_exec)
    srcs = [(_twain(40000) * 4)[:150_000],
            (_twain(30000, 50000) * 6)[:170_000]]
    blobs = [A.compress_accel(s, level=1 + i, multi_block=True)
             for i, s in enumerate(srcs)]
    items = [it for b in blobs for it in A.split_stream_accel(b)]
    out = device_dec.decompress_frames_device(items)
    assert b"".join(out) == b"".join(srcs)
    assert calls["n"] == 0
    # the carried-history device executor actually ran (a silent host
    # fallback would pass the roundtrip vacuously)
    assert calls["exec"] >= 1


def test_multi_block_repetitive_cross_boundary(monkeypatch):
    """Matches that straddle the block boundary with mixed history+local
    sources (off < ml across the boundary) exercised the planner's
    direct-read branch; a r3 review bug tagged history bytes round>0
    there. Periodic data at many periods hits all branch shapes."""
    from compress_tpu.ops import execute as X

    calls = {"exec": 0}
    xorig = X.execute_blocks_hist_jit

    def counting_exec(*args, **kw):
        calls["exec"] += 1
        return xorig(*args, **kw)

    monkeypatch.setattr(X, "execute_blocks_hist_jit", counting_exec)
    srcs = []
    for period in (3, 7, 64, 1000, 65521):
        unit = _twain(period)
        srcs.append((unit * (200_000 // period + 1))[:200_000])
    blobs = [A.compress_accel(s, level=1, multi_block=True) for s in srcs]
    items = [it for b in blobs for it in A.split_stream_accel(b)]
    out = device_dec.decompress_frames_device(items)
    assert out == srcs
    assert calls["exec"] >= 1


def test_multi_block_hostile_sidecar_falls_back():
    data = (_twain(50000) * 3)[:140_000]
    blob = A.compress_accel(data, level=1, multi_block=True)
    payload_len = int.from_bytes(blob[4:8], "little")
    rng = np.random.default_rng(3)
    for _ in range(16):
        b = bytearray(blob)
        k = 8 + int(rng.integers(0, payload_len))
        b[k] ^= 1 + int(rng.integers(0, 255))
        out = device_dec.decompress_frames_device([bytes(b)])
        assert out == [data]


def test_multi_block_mixed_batch():
    """Multi-block, single-block, and sidecar-less frames in ONE batch."""
    mb = (_twain(60000) * 3)[:160_000]
    sb = _twain(11000)
    plain = _twain(7000, 90000)
    items = (A.split_stream_accel(A.compress_accel(mb, multi_block=True))
             + [A.compress_accel(sb)]
             + [compress(plain, level=1)])
    out = device_dec.decompress_frames_device(items)
    assert b"".join(out) == mb + sb + plain
