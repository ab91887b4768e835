"""Device zstd sequence decode vs the host loop (bit-exact).

Reference role: zstd/seqdec_amd64.s (entropy part)."""

import numpy as np
import pytest
import zstandard

from compress_tpu import zstd as Z
from compress_tpu.zstd import block as B
from compress_tpu.zstd import seqdev
from compress_tpu.zstd import seqs as S


def _seq_items_from_frame(frame: bytes):
    """Parse every compressed block's sequences section into
    (stream, n_seqs, tables) items + host-decoded ground truth."""
    h = Z.parse_frame_header(frame)
    pos = h.header_size
    hist = B.History(window_size=max(h.window_size, 1024))
    items, truth = [], []
    while True:
        bh = int.from_bytes(frame[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == B.BLOCK_COMPRESSED:
            body = frame[pos : pos + bsize]
            p2 = 0
            _lits, p2 = B.decode_literals(body, p2, hist)
            b0 = body[p2]
            if b0 != 0:
                # re-parse the section to capture tables + stream
                n_seqs = b0
                q = p2 + 1
                if b0 >= 128:
                    if b0 == 255:
                        n_seqs = int.from_bytes(body[q : q + 2],
                                                "little") + 0x7F00
                        q += 2
                    else:
                        n_seqs = ((b0 - 128) << 8) + body[q]
                        q += 1
                modes = body[q]
                q += 1
                t_ll, q = B._read_table(body, q, (modes >> 6) & 3, "ll",
                                        hist, hist.t_ll)
                t_of, q = B._read_table(body, q, (modes >> 4) & 3, "of",
                                        hist, hist.t_of)
                t_ml, q = B._read_table(body, q, (modes >> 2) & 3, "ml",
                                        hist, hist.t_ml)
                hist.t_ll, hist.t_of, hist.t_ml = t_ll, t_of, t_ml
                stream = body[q:]
                items.append((stream, n_seqs, t_ll, t_of, t_ml))
                truth.append(S.decode_sequences(stream, n_seqs, t_ll,
                                                t_of, t_ml))
            # decode the block fully to keep history coherent
            hist2_out = B.decode_block(body, B.History(
                window_size=max(h.window_size, 1024)), B.MAX_BLOCK_SIZE) \
                if False else None
            del hist2_out
            pos += bsize
        elif btype == B.BLOCK_RAW:
            pos += bsize
        else:
            pos += 1
        if last:
            break
    return items, truth


@pytest.mark.parametrize("maker", ["ours2", "ours4", "libzstd3"])
def test_seq_device_decode_matches_host(maker):
    data = open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
                "rb").read()[: 1 << 18]
    if maker == "ours2":
        frame = Z.compress(data, level=2)
    elif maker == "ours4":
        frame = Z.compress(data, level=4)
    else:
        frame = zstandard.ZstdCompressor(level=3).compress(data)
    items, truth = _seq_items_from_frame(frame)
    assert items, "no compressed blocks with sequences"
    got = seqdev.decode_sequences_device(items)
    for (gl, gm, go), (tl, tm, to) in zip(got, truth):
        assert (gl == tl).all()
        assert (gm == tm).all()
        assert (go == to).all()


def test_seq_device_decode_rle_and_predef_modes():
    """RLE-heavy input exercises RLE table modes; small inputs exercise
    predefined tables."""
    rng = np.random.default_rng(5)
    data = (bytes([7]) * 5000 + rng.integers(0, 4, 3000,
                                             dtype=np.uint8).tobytes()) * 3
    frame = Z.compress(data, level=2)
    items, truth = _seq_items_from_frame(frame)
    if not items:
        pytest.skip("no sequence blocks produced")
    got = seqdev.decode_sequences_device(items)
    for (gl, gm, go), (tl, tm, to) in zip(got, truth):
        assert (gl == tl).all() and (gm == tm).all() and (go == to).all()


def test_seq_device_rep_resolution_on_device():
    """r3: resolve=True runs repeat-offset resolution in the scan carry;
    resolved offsets must match the host per-sequence resolver exactly."""
    from compress_tpu.zstd.device_dec import _resolve_reps

    corpora = [
        open("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt",
             "rb").read()[:50000],
        open("/root/reference/testdata/html.txt", "rb").read()[:40000],
        (b"abcabcabd" * 4000)[:30000],
    ]
    items, truth = [], []
    for data in corpora:
        frame = Z.compress(data, level=1)
        it, tr = _seq_items_from_frame(frame)
        items += it
        truth += tr
    if not items:
        pytest.skip("no sequence blocks produced")
    got = seqdev.decode_sequences_device(items, resolve=True)
    for (gl, gm, go, goff), (tl, tm, to) in zip(got, truth):
        assert (gl == tl).all() and (gm == tm).all() and (go == to).all()
        want_off = _resolve_reps(tl, tm, to)
        assert (goff == want_off).all(), "device rep resolution mismatch"
