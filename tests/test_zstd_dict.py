"""zstd dictionary tests — cross-validated with libzstd-trained dicts."""

import zipfile

import numpy as np
import pytest
import zstandard

from compress_tpu import zstd as Z
from compress_tpu.zstd.dict import build_dict, inspect_dictionary, load_dict, raw_dict


def _samples():
    rng = np.random.default_rng(0)
    hdr = b'{"user": "name-%04d", "role": "admin", "perms": ["read", "write"]}'
    return [
        hdr.replace(b"%04d", str(i).encode()) + rng.integers(
            65, 91, 30, dtype=np.uint8).tobytes()
        for i in range(200)
    ]


@pytest.fixture(scope="module")
def trained_dict():
    """A real dictionary trained by libzstd (zstd --train equivalent)."""
    return zstandard.train_dictionary(4096, _samples() * 3).as_bytes()


def test_load_libzstd_trained_dict(trained_dict):
    d = load_dict(trained_dict)
    assert d.id != 0
    assert len(d.content) > 0
    assert d.huf is not None
    assert all(r > 0 for r in d.reps)
    assert inspect_dictionary(trained_dict).id == d.id


def test_decode_libzstd_dict_frames(trained_dict):
    zd = zstandard.ZstdCompressionDict(trained_dict)
    c = zstandard.ZstdCompressor(level=3, dict_data=zd)
    d = load_dict(trained_dict)
    for sample in _samples()[:20]:
        blob = c.compress(sample)
        assert Z.decompress(blob, dicts=[d]) == sample


def test_encode_with_dict_decoded_by_libzstd(trained_dict):
    d = load_dict(trained_dict)
    zd = zstandard.ZstdCompressionDict(trained_dict)
    dec = zstandard.ZstdDecompressor(dict_data=zd)
    for sample in _samples()[:20]:
        blob = Z.compress(sample, level=2, dict_=d)
        assert dec.decompress(blob, max_output_size=len(sample) + 16) == sample
        assert Z.decompress(blob, dicts=[d]) == sample


def test_encode_with_dict_all_levels(trained_dict):
    """The native ladder handles dictionary frames at every level
    (dict content as overlap prefix; libzstd must accept the frames)."""
    d = load_dict(trained_dict)
    zd = zstandard.ZstdCompressionDict(trained_dict)
    dec = zstandard.ZstdDecompressor(dict_data=zd)
    sample = _samples()[0] * 30  # > 16 bytes so the native path engages
    for lvl in (1, 2, 3, 4):
        blob = Z.compress(sample, level=lvl, dict_=d, checksum=True)
        assert dec.decompress(blob, max_output_size=len(sample) + 16) == sample
        assert Z.decompress(blob, dicts=[d]) == sample
        assert len(blob) < len(Z.compress(sample, level=lvl))


def test_dict_improves_ratio(trained_dict):
    d = load_dict(trained_dict)
    samples = _samples()[:50]
    with_dict = sum(len(Z.compress(s, dict_=d)) for s in samples)
    without = sum(len(Z.compress(s)) for s in samples)
    assert with_dict < without


def test_build_dict_roundtrip():
    samples = _samples()
    history = b"".join(samples[:5])[:2048]
    blob = build_dict(samples[5:60], history, dict_id=77)
    d = load_dict(blob)
    assert d.id == 77
    assert d.content == history
    # usable by both our codec and libzstd
    sample = samples[100]
    enc = Z.compress(sample, dict_=d)
    assert Z.decompress(enc, dicts=[d]) == sample
    zd = zstandard.ZstdCompressionDict(blob)
    dec = zstandard.ZstdDecompressor(dict_data=zd)
    assert dec.decompress(enc, max_output_size=len(sample) + 16) == sample


def test_raw_dict():
    content = b"the quick brown fox jumps over the lazy dog " * 10
    d = raw_dict(content)
    data = b"the quick brown fox says hello to the lazy dog!"
    enc = Z.compress(data, dict_=d)
    assert Z.decompress(enc, dicts=[d]) == data
    assert len(enc) < len(Z.compress(data))


def test_missing_dict_rejected(trained_dict):
    d = load_dict(trained_dict)
    blob = Z.compress(b"needs the dictionary " * 10, dict_=d)
    with pytest.raises(Z.ZstdError):
        Z.decompress(blob)


def test_reference_dict_corpus():
    """Dictionaries from the reference's dict-tests-small.zip load cleanly."""
    p = "/root/reference/zstd/testdata/dict-tests-small.zip"
    import pathlib

    if not pathlib.Path(p).exists():
        pytest.skip("no dict corpus")
    n = 0
    with zipfile.ZipFile(p) as z:
        for info in z.infolist():
            if info.is_dir():
                continue
            blob = z.read(info)
            if len(blob) < 8:
                continue
            try:
                d = load_dict(blob)
                assert d.content
                n += 1
            except ValueError:
                continue
    assert n > 0
