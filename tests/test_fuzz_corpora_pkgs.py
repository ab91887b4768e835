"""The reference's per-package fuzz corpora (s2, huff0, fse, flate)
against this framework: robustness (typed errors only) + native-vs-
Python agreement (the asm/noasm differential role) + independent
oracles where one exists (stdlib zlib for flate).
"""

import pathlib
import zipfile

import pytest

from tests.test_fuzz_corpora import gofuzz_unquote

REF = pathlib.Path("/root/reference")


def _entries(path):
    zf = zipfile.ZipFile(path)
    for n in zf.namelist():
        raw = gofuzz_unquote(zf.read(n))
        if raw is not None:
            yield n, raw


def test_flate_fuzz_encoding_roundtrip():
    """flate FuzzEncoding corpus: every input through deflate 1/5/9,
    decoded by us AND stdlib zlib."""
    import zlib as stdzlib

    from compress_tpu import flate

    n = 0
    for i, (name, raw) in enumerate(
            _entries(REF / "flate/testdata/fuzz/FuzzEncoding.zip")):
        lvl = (1, 5, 9)[i % 3]
        f = flate.deflate(raw, lvl)
        assert flate.inflate(f) == raw, (name, lvl)
        assert stdzlib.decompress(f, -15) == raw, (name, lvl)
        n += 1
    assert n > 300


def test_s2_block_fuzz_decode_agreement():
    """s2 block-corpus-enc: hostile encoded blocks — native and Python
    decoders must agree (decode or typed reject), never crash."""
    import os

    from compress_tpu.s2 import block as B

    native_mode = os.environ.get("COMPRESS_TPU_NONATIVE") != "1"
    for name, raw in _entries(REF / "s2/testdata/fuzz/block-corpus-enc.zip"):
        try:
            got = B.decode(raw)
        except Exception as e:  # noqa: BLE001
            assert isinstance(e, ValueError), (name, type(e))
            got = None
        if native_mode:
            try:
                want = B._decode_py(raw)
            except AttributeError:
                break  # no explicit python twin exposed; robustness held
            except Exception:  # noqa: BLE001
                want = None
            assert got == want, (name, "native/python divergence")


def test_huff0_fuzz_decompress():
    """huff0 hostile containers: typed errors only, and valid entries
    roundtrip through our encoder."""
    from compress_tpu import huff0

    for src in ("huff0/testdata/huff0_decompress1x.zip",
                "huff0/testdata/decompress1x_regression.zip"):
        for name, raw in _entries(REF / src):
            try:
                out = huff0.decompress_1x(raw)
            except Exception as e:  # noqa: BLE001
                assert isinstance(e, (ValueError, IndexError)), \
                    (src, name, type(e))
                continue
            if out:
                try:
                    blob = huff0.compress_1x(bytes(out))
                except ValueError:
                    continue  # degenerate (RLE/incompressible)
                assert huff0.decompress_1x(blob) == out, (src, name)


def test_fse_fuzz_decompress():
    from compress_tpu import fse

    for name, raw in _entries(REF / "fse/testdata/fse_decompress.zip"):
        try:
            out = fse.decompress(raw)
        except Exception as e:  # noqa: BLE001
            assert isinstance(e, (ValueError, IndexError)), (name, type(e))
            continue
        if out:
            blob = fse.compress(bytes(out))
            if blob is not None:
                assert fse.decompress(blob) == out, name


def test_fse_fuzz_compress_corpus():
    """fse_compress.zip: raw inputs through our fse encoder."""
    from compress_tpu import fse

    n = 0
    for name, raw in _entries(REF / "fse/testdata/fse_compress.zip"):
        try:
            blob = fse.compress(raw)
        except ValueError:
            continue  # incompressible / degenerate: reference errors too
        if blob is not None:
            assert fse.decompress(blob) == raw, name
            n += 1
    assert n > 10


def test_lz4_block_fuzz_convert():
    """s2 FuzzLZ4Block corpus: hostile LZ4 blocks through the LZ4->S2
    converter — typed errors only; successful conversions must decode."""
    from compress_tpu import s2
    from compress_tpu.s2 import lz4convert

    n_ok = 0
    for name, raw in _entries(REF / "s2/testdata/fuzz/FuzzLZ4Block.zip"):
        try:
            blob = lz4convert.convert_block(raw)
        except Exception as e:  # noqa: BLE001
            assert isinstance(e, (ValueError, IndexError)), (name, type(e))
            continue
        s2.decode(blob)  # must be a valid s2 block
        n_ok += 1


def test_flate_encode_raw_corpus():
    """flate encode-raw-corpus: 1,995 raw fuzz inputs (sampled) through
    deflate, stdlib-verified."""
    import zlib as stdzlib

    from compress_tpu import flate

    n = 0
    for i, (name, raw) in enumerate(
            _entries(REF / "flate/testdata/fuzz/encode-raw-corpus.zip")):
        if i % 5:
            continue
        lvl = (1, 4, 6, 9)[i % 4]
        f = flate.deflate(raw, lvl)
        assert stdzlib.decompress(f, -15) == raw, (name, lvl)
        n += 1
    assert n > 300
