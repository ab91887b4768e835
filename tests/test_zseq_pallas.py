"""Pallas sequence decoder (ops/zseq_pallas.py) vs the host sequence
oracle — interpret mode, predefined-table frames."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from compress_tpu.zstd import accel as AC  # noqa: E402
from compress_tpu.zstd import block as zblock  # noqa: E402
from compress_tpu.zstd import encoder as E  # noqa: E402
from compress_tpu.zstd import frame as F  # noqa: E402
from compress_tpu.ops import zseq_pallas as ZP  # noqa: E402


def _oracle_seqs(frame):
    h = F.parse_frame_header(frame)
    body = frame[h.header_size + 3:]
    hist = zblock.History(window_size=1 << 23)
    zblock.decode_literals(body, 0, hist)
    p2 = ZP._skip_literals(body)
    lls, mls, ofvals, _ = zblock.decode_sequences_section(body, p2, hist)
    reps = [1, 4, 8]
    out = []
    for l_, m_, ofv in zip(lls, mls, ofvals):
        l_, m_, ofv = int(l_), int(m_), int(ofv)
        if ofv > 3:
            o = ofv - 3
            reps = [o, reps[0], reps[1]]
        else:
            idx = ofv - 1 + (1 if l_ == 0 else 0)
            if idx == 0:
                o = reps[0]
            elif idx == 1:
                o = reps[1]
                reps = [o, reps[0], reps[2]]
            elif idx == 2:
                o = reps[2]
                reps = [o, reps[0], reps[1]]
            else:
                o = reps[0] - 1
                reps = [o, reps[0], reps[1]]
        out.append((l_, m_, o))
    return out


@pytest.mark.parametrize("name,sl", [
    ("Mark.Twain-Tom.Sawyer.txt", slice(0, 61440)),
    ("html.txt", slice(0, 40000)),
    ("e.txt", slice(0, 30000)),
])
def test_zseq_kernel_matches_oracle(name, sl):
    data = open(f"/root/reference/testdata/{name}", "rb").read()[sl]
    with E.predef_seq_tables():
        frame = E.compress(data, level=2)
    side = AC.build_sidecar(frame, seq_cks=True)
    assert side is not None
    wins, lbit, nsym, sts, rps, last, metas = ZP.prep_frames([side + frame])
    tst, xb = ZP.pack_tables()
    ll, ml, off, _ = ZP.zseq_decode_chunks_shared(
        jnp.asarray(wins), jnp.asarray(lbit), jnp.asarray(nsym),
        jnp.asarray(sts), jnp.asarray(rps), jnp.asarray(last),
        tst, xb, interpret=True)
    ll, ml, off = np.asarray(ll), np.asarray(ml), np.asarray(off)
    want = _oracle_seqs(frame)
    got = []
    for c in range(metas[0][1]):
        for k in range(int(nsym[c])):
            got.append((int(ll[c, k]), int(ml[c, k]), int(off[c, k])))
    assert got == want
    # libzstd accepts the predef frame (format-legal profile)
    import zstandard

    assert zstandard.ZstdDecompressor().decompress(frame) == data
