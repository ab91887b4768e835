"""enc_jobs-class streaming Writer scenarios (reference:
zstd/enc_jobs_test.go — interleaved write/flush/close/read_from/reset
across levels and worker counts; every output must be a valid single
frame that libzstd and our own decoder round-trip)."""

import io

import numpy as np
import pytest

from compress_tpu import zstd as tz
from compress_tpu.zstd import stream as zs


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    blob = bytearray()
    i = 0
    while len(blob) < n:
        if rng.integers(0, 3) == 0:
            blob += bytes(rng.integers(0, 256, 997, np.uint8))
        else:
            blob += (b"the quick brown fox jumps over the lazy dog %d " % i) * 40
        i += 1
    return bytes(blob[:n])


def _check(blob, want):
    # ours
    assert tz.decompress(blob, max_size=len(want) + 64) == want
    # libzstd oracle
    import zstandard

    assert zstandard.ZstdDecompressor().decompress(
        blob, max_output_size=len(want) + 64) == want
    # the stream parses as frames (one data frame + optional padding)
    assert len(tz.split_frames(blob)) >= 1


# -- scripted scenarios -------------------------------------------------------
# each op: (name, args); executed in order against one Writer

SCENARIOS = [
    # tiny writes, one flush mid-stream
    [("write", 10), ("write", 1), ("flush",), ("write", 100)],
    # empty flushes interleaved
    [("flush",), ("write", 1000), ("flush",), ("flush",), ("write", 3)],
    # write exactly one job worth
    [("write", "job"),],
    # job-1 / job / job+1 boundary writes
    [("write", "job-1"), ("write", 2)],
    [("write", "job+1"), ("flush",)],
    # many small writes crossing several jobs
    [("write", 65536)] * 20,
    # big single write (multiple jobs at once)
    [("write", "job*3+17")],
    # flush after every write
    [("write", 4096), ("flush",)] * 6,
    # read_from a stream source
    [("read_from", 300000)],
    # read_from then writes then flush
    [("read_from", 70000), ("write", 12345), ("flush",), ("write", 1)],
    # zero-length writes sprinkled in
    [("write", 0), ("write", 5000), ("write", 0), ("flush",), ("write", 0)],
    # close with empty buffered tail after flush
    [("write", 20000), ("flush",)],
    # nothing at all (empty stream)
    [],
    # only a flush
    [("flush",)],
]


def _run_script(script, level, workers, checksum=False, seed=1):
    buf = io.BytesIO()
    w = zs.Writer(buf, level=level, workers=workers, checksum=checksum,
                  job_size=1 << 17, window_log=None)
    job = w._job_size
    fed = bytearray()
    cursor = 0

    def take(n):
        nonlocal cursor
        d = _data(cursor + n, seed)[cursor:cursor + n]
        cursor += n
        fed.extend(d)
        return d

    for op in script:
        if op[0] == "write":
            spec = op[1]
            n = (eval(str(spec).replace("job", str(job)))  # noqa: S307
                 if isinstance(spec, str) else spec)
            w.write(take(n))
        elif op[0] == "flush":
            w.flush()
        elif op[0] == "read_from":
            w.read_from(io.BytesIO(take(op[1])), chunk=37_000)
    w.close()
    _check(buf.getvalue(), bytes(fed))
    return len(buf.getvalue())


@pytest.mark.parametrize("idx", range(len(SCENARIOS)))
@pytest.mark.parametrize("level,workers", [(1, 0), (2, 0), (2, 3), (3, 2)])
def test_scenario(idx, level, workers):
    _run_script(SCENARIOS[idx], level, workers)


def test_checksum_across_flushes():
    _run_script([("write", 100000), ("flush",), ("write", 50000)],
                level=2, workers=0, checksum=True)


def test_double_close_and_write_after_close():
    buf = io.BytesIO()
    w = zs.Writer(buf, level=1)
    w.write(b"x" * 1000)
    w.close()
    w.close()  # idempotent
    with pytest.raises(tz.ZstdError):
        w.write(b"y")
    with pytest.raises(tz.ZstdError):
        w.flush()


def test_reset_reuses_writer():
    a, b = io.BytesIO(), io.BytesIO()
    w = zs.Writer(a, level=2, checksum=True, job_size=1 << 17)
    d1 = _data(300000, seed=2)
    w.write(d1)
    w.close()
    w.reset(b)
    d2 = _data(123457, seed=3)
    w.write(d2)
    w.flush()
    w.write(b"tail")
    w.close()
    _check(a.getvalue(), d1)
    _check(b.getvalue(), d2 + b"tail")


def test_reset_discards_unflushed():
    a, b = io.BytesIO(), io.BytesIO()
    w = zs.Writer(a, level=1, job_size=1 << 17)
    w.write(b"discard me")  # buffered, never flushed
    w.reset(b)
    w.write(b"keep me")
    w.close()
    _check(b.getvalue(), b"keep me")


def test_reset_with_workers():
    a, b = io.BytesIO(), io.BytesIO()
    w = zs.Writer(a, level=2, workers=4, job_size=1 << 17)
    d1 = _data(500000, seed=4)
    w.write(d1)
    w.close()
    w.reset(b)
    d2 = _data(400000, seed=5)
    w.write(d2)
    w.close()
    _check(a.getvalue(), d1)
    _check(b.getvalue(), d2)


def test_workers_output_matches_serial_across_scripts():
    for idx in (0, 5, 7, 9):
        sizes = set()
        for workers in (0, 2, 5):
            buf = io.BytesIO()
            w = zs.Writer(buf, level=2, workers=workers, job_size=1 << 17)
            job = w._job_size
            fed = bytearray()
            cursor = 0
            for op in SCENARIOS[idx]:
                if op[0] == "write":
                    spec = op[1]
                    n = (eval(str(spec).replace("job", str(job)))  # noqa: S307
                         if isinstance(spec, str) else spec)
                    d = _data(cursor + n, 7)[cursor:cursor + n]
                    cursor += n
                    fed.extend(d)
                    w.write(d)
                elif op[0] == "flush":
                    w.flush()
                elif op[0] == "read_from":
                    d = _data(cursor + op[1], 7)[cursor:cursor + op[1]]
                    cursor += op[1]
                    fed.extend(d)
                    w.read_from(io.BytesIO(d), chunk=37_000)
            w.close()
            sizes.add(buf.getvalue())
        # async workers must produce byte-identical streams
        assert len(sizes) == 1, f"scenario {idx} diverged across workers"
