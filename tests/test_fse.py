"""FSE codec tests: round-trips, NCount self-consistency, contracts,

and fuzz corpus from the reference's fse/testdata."""

import pathlib
import zipfile

import numpy as np
import pytest

from compress_tpu import fse
from compress_tpu.fse import core

FSE_TESTDATA = pathlib.Path("/root/reference/fse/testdata")


def test_roundtrip_corpus(corpus_file):
    data = corpus_file.read_bytes()[: 1 << 16]
    try:
        blob = fse.compress(data)
    except (fse.IncompressibleError, fse.UseRLEError):
        pytest.skip("not FSE-compressible (contract)")
    assert len(blob) < len(data)
    assert fse.decompress(blob) == data


@pytest.mark.parametrize("n", [2, 3, 4, 5, 100, 1000, 65536])
def test_roundtrip_skewed_sizes(n):
    rng = np.random.default_rng(n)
    # skewed distribution so FSE accepts it
    data = rng.choice(
        np.arange(8, dtype=np.uint8), size=n, p=[0.5, 0.2, 0.1, 0.08, 0.06, 0.03, 0.02, 0.01]
    ).tobytes()
    try:
        blob = fse.compress(data)
    except (fse.IncompressibleError, fse.UseRLEError):
        if n <= 64:
            return  # tiny inputs may legitimately refuse (header overhead)
        raise
    assert fse.decompress(blob) == data


def test_contracts():
    with pytest.raises(fse.UseRLEError):
        fse.compress(b"a" * 1000)
    with pytest.raises(fse.IncompressibleError):
        fse.compress(b"x")
    rng = np.random.default_rng(0)
    with pytest.raises(fse.IncompressibleError):
        fse.compress(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())


def test_ncount_roundtrip_random_tables():
    rng = np.random.default_rng(1)
    for trial in range(50):
        tl = int(rng.integers(core.MIN_TABLELOG, core.MAX_TABLELOG + 1))
        max_sym = int(rng.integers(1, 256))
        hist = rng.integers(0, 1000, max_sym + 1).astype(np.int64)
        hist[rng.integers(0, max_sym + 1)] += 2000  # ensure a dominant symbol
        if (hist > 0).sum() < 2:
            continue
        total = int(hist.sum())
        if (1 << tl) < int((hist > 0).sum()):
            continue
        norm = core.normalize_count(hist, tl, total, max_sym)
        hdr = core.write_ncount(norm, tl)
        norm2, tl2, pos = core.read_ncount(hdr, 0, max_symbol=255)
        assert tl2 == tl
        assert pos == len(hdr)
        np.testing.assert_array_equal(norm2, norm[: len(norm2)])
        # trailing symbols of norm beyond parsed alphabet must be zero
        assert (norm[len(norm2):] == 0).all()


def test_normalize_validity_stress():
    rng = np.random.default_rng(2)
    for trial in range(100):
        nsym = int(rng.integers(2, 256))
        hist = np.zeros(256, dtype=np.int64)
        idx = rng.choice(256, nsym, replace=False)
        hist[idx] = rng.integers(1, 10000, nsym)
        total = int(hist.sum())
        max_sym = int(np.nonzero(hist)[0][-1])
        tl = core.optimal_table_log(0, total, max_sym)
        if (1 << tl) < nsym:
            continue
        norm = core.normalize_count(hist, tl, total, max_sym)
        assert int(np.abs(norm).sum()) == 1 << tl
        assert ((hist[: max_sym + 1] > 0) == (norm != 0)).all()


def test_decode_table_matches_encode_table():
    # encode with ctable then decode with dtable over every table log
    rng = np.random.default_rng(3)
    for tl in range(core.MIN_TABLELOG, core.MAX_TABLELOG + 1):
        data = rng.choice(
            np.arange(5, dtype=np.uint8), size=4096, p=[0.4, 0.3, 0.15, 0.1, 0.05]
        )
        hist = np.bincount(data, minlength=256).astype(np.int64)
        max_sym = 4
        norm = core.normalize_count(hist, tl, len(data), max_sym)
        stream = core.encode_interleaved2(data, norm, tl)
        out = core.decode_interleaved2(stream, norm, tl, len(data))
        np.testing.assert_array_equal(out, data)


def test_reference_fuzz_corpus():
    """Inputs from the reference's compress-fuzz corpus must round-trip or

    refuse cleanly — never crash or mis-decode."""
    zips = list(FSE_TESTDATA.glob("*.zip"))
    seen = 0
    for zp in zips:
        with zipfile.ZipFile(zp) as z:
            for info in z.infolist():
                if info.is_dir() or info.file_size > 1 << 20:
                    continue
                data = z.read(info)
                if len(data) == 0:
                    continue
                seen += 1
                try:
                    blob = fse.compress(data)
                except (fse.IncompressibleError, fse.UseRLEError, ValueError):
                    continue
                assert fse.decompress(blob) == data, info.filename
    assert seen > 0 or not zips


def test_native_streams_byte_identical_to_python():
    """The native standalone-entropy loops (entropy_standalone.cpp) must
    be byte-identical to the Python reference loops (the repo's noasm
    differential convention)."""
    import numpy as np

    from compress_tpu import fse as F
    from compress_tpu import huff0 as H
    from compress_tpu.fse import core as C

    if C._native_entropy_lib() is None:
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(17)
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()
    samples = [data[:65536], data[5000:9096],
               rng.choice(np.arange(24, dtype=np.uint8), size=4000,
                          p=np.arange(1, 25) / np.arange(1, 25).sum()
                          ).tobytes()]
    orig = C._native_entropy_lib
    try:
        for s in samples:
            cn = F.compress(s)
            h1 = H.compress_1x(np.frombuffer(s, np.uint8))
            h4 = H.compress_4x(np.frombuffer(s, np.uint8)) \
                if len(s) >= 12 else None
            C._native_entropy_lib = lambda: None
            assert cn == F.compress(s)
            assert h1 == H.compress_1x(np.frombuffer(s, np.uint8))
            d_py = F.decompress(cn, max_size=1 << 20)
            h_py = H.decompress_1x(h1)
            if h4 is not None:
                assert h4 == H.compress_4x(np.frombuffer(s, np.uint8))
                h4_py = H.decompress_4x(h4)
            C._native_entropy_lib = orig
            assert F.decompress(cn, max_size=1 << 20) == d_py == s
            assert H.decompress_1x(h1) == h_py == s
            if h4 is not None:
                assert H.decompress_4x(h4) == h4_py == s
    finally:
        C._native_entropy_lib = orig
