"""LZ4 converters, snappy->zstd conversion, ReadSeeker, and CLI tools."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest
import zstandard

from compress_tpu import s2
from compress_tpu.s2 import lz4convert
from compress_tpu.s2 import stream as s2stream
from compress_tpu.s2.seek import ReadSeeker
from compress_tpu.zstd import snappy_convert


def _lz4_block(data: bytes) -> bytes:
    """Reference LZ4 block encoder (test oracle; simple greedy)."""
    out = bytearray()
    n = len(data)
    pos = 0
    lit_start = 0

    def emit(lit, ml, off):
        tok_lit = min(len(lit), 15)
        tok_ml = min(ml - 4, 15) if ml else 0
        out.append((tok_lit << 4) | tok_ml)
        rest = len(lit) - 15
        if tok_lit == 15:
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(max(rest, 0))
        out.extend(lit)
        if ml:
            out.extend(off.to_bytes(2, "little"))
            r = ml - 4 - 15
            if tok_ml == 15:
                while r >= 255:
                    out.append(255)
                    r -= 255
                out.append(max(r, 0))

    # trivial matcher: find 4-byte repeats at offset <= 65535 via dict
    table = {}
    pos = 0
    while pos + 12 < n:
        key = data[pos : pos + 4]
        c = table.get(key, -1)
        table[key] = pos
        if c >= 0 and pos - c <= 65535:
            length = 4
            while pos + length < n - 5 and length < 200 and \
                    data[c + length] == data[pos + length]:
                length += 1
            emit(data[lit_start:pos], length, pos - c)
            pos += length
            lit_start = pos
        else:
            pos += 1
    emit(data[lit_start:], 0, 0)
    return bytes(out)


def test_lz4_convert_block():
    data = (b"lz4 conversion test data! " * 300) + bytes(np.random.default_rng(0)
                                                         .integers(0, 256, 500, dtype=np.uint8))
    lz4_blob = _lz4_block(data)
    assert lz4convert.lz4_decompressed_len(lz4_blob) == len(data)
    s2_block = lz4convert.convert_block(lz4_blob)
    assert s2.decode(s2_block) == data
    snappy_block = lz4convert.convert_block(lz4_blob, snappy=True)
    assert s2.decode(snappy_block, allow_repeat=False) == data


def test_lz4_corrupt():
    with pytest.raises(lz4convert.LZ4Error):
        lz4convert.convert_block(b"\xf0")  # extended literal, truncated


def test_snappy_to_zstd_convert():
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()
    buf = io.BytesIO()
    w = s2stream.Writer(buf, snappy=True, block_size=1 << 16)
    w.write(data)
    w.close()
    zst = snappy_convert.convert(buf.getvalue())
    # libzstd accepts the converted frame bit-exactly
    assert zstandard.ZstdDecompressor().decompress(
        zst, max_output_size=len(data) + 16) == data
    from compress_tpu import zstd as Z

    assert Z.decompress(zst) == data


def test_readseeker_random_access():
    rng = np.random.default_rng(2)
    data = rng.integers(65, 91, 2 << 20, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    w = s2stream.Writer(buf, block_size=1 << 16, add_index=True)
    w.write(data)
    w.close()
    f = io.BytesIO(buf.getvalue())
    rs = ReadSeeker(f)
    assert rs.size() == len(data)
    for off in [0, 1, 65535, 65536, 1 << 20, len(data) - 100]:
        rs.seek(off)
        assert rs.read(100) == data[off : off + 100]
    rs.seek(-50, io.SEEK_END)
    assert rs.read() == data[-50:]
    assert rs.read_at(12345, 77) == data[12345 : 12345 + 77]


def _run_cli(mod, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable, "-m", mod, *args],
                          capture_output=True, env=env, timeout=600)


def test_cli_s2_roundtrip(tmp_path):
    src = tmp_path / "data.txt"
    src.write_bytes(b"cli round trip " * 4000)
    r = _run_cli("compress_tpu.cli.s2c", "-index", "-verify", str(src))
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "data.txt.s2").exists()
    r2 = _run_cli("compress_tpu.cli.s2d", "-o", str(tmp_path / "back.txt"),
                  str(tmp_path / "data.txt.s2"))
    assert r2.returncode == 0, r2.stderr
    assert (tmp_path / "back.txt").read_bytes() == src.read_bytes()
    # random access via -offset
    r3 = _run_cli("compress_tpu.cli.s2d", "-c", "-offset", "15",
                  str(tmp_path / "data.txt.s2"))
    assert r3.returncode == 0, r3.stderr
    assert r3.stdout == (b"cli round trip " * 4000)[15:]


def test_cli_zstdio_roundtrip(tmp_path):
    src = tmp_path / "z.txt"
    src.write_bytes(b"zstd cli data " * 3000)
    r = _run_cli("compress_tpu.cli.zstdio", "-crc", str(src))
    assert r.returncode == 0, r.stderr
    r2 = _run_cli("compress_tpu.cli.zstdio", "-d", "-o", str(tmp_path / "z.out"),
                  str(tmp_path / "z.txt.zst"))
    assert r2.returncode == 0, r2.stderr
    assert (tmp_path / "z.out").read_bytes() == src.read_bytes()
    # libzstd can read the CLI's output
    assert zstandard.ZstdDecompressor().decompress(
        (tmp_path / "z.txt.zst").read_bytes(), max_output_size=1 << 20
    ) == src.read_bytes()


def test_cli_builddict(tmp_path):
    for i in range(8):
        (tmp_path / f"s{i}.json").write_bytes(
            b'{"name": "user", "id": %d, "tags": ["a","b"]}' % i * 20)
    r = _run_cli("compress_tpu.cli.builddict", "-format", "zstd",
                 "-o", str(tmp_path / "d.bin"),
                 *[str(tmp_path / f"s{i}.json") for i in range(8)])
    assert r.returncode == 0, r.stderr
    from compress_tpu.zstd.dict import load_dict

    d = load_dict((tmp_path / "d.bin").read_bytes())
    assert d.content


def test_s2sx_self_extract(tmp_path):
    """s2sx builds a dependency-free self-extracting script (reference
    s2/cmd/_s2sx equivalent)."""
    import subprocess
    import sys

    from compress_tpu.cli.s2sx import build_sx

    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt", "rb").read()[:100000]
    src = tmp_path / "doc.bin"
    src.write_bytes(data)
    sx = build_sx(str(src))
    src.unlink()
    subprocess.run([sys.executable, sx], cwd=tmp_path, check=True,
                   capture_output=True)
    assert src.read_bytes() == data
