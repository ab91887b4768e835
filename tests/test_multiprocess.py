"""Multi-process (DCN) mesh test — SURVEY §4 implication (d), §5.8.

Two OS processes, each with 4 virtual CPU devices, form one global
8-device mesh. zstd_encode_sharded runs over the global mesh, so the
overlap-prefix halo ppermute between shard 3 and shard 4 crosses the
process boundary (the DCN hop). The frame must be byte-identical to the
single-process result and decode with libzstd."""

import pathlib
import subprocess
import sys
import tempfile

import pytest
import zstandard

TWAIN = pathlib.Path("/root/reference/testdata/Mark.Twain-Tom.Sawyer.txt")


@pytest.mark.timeout(600)
def test_dcn_two_process_sharded_encode():
    job, block = 1 << 15, 1 << 13
    data = TWAIN.read_bytes()[: 9 * job + 4321]
    worker = pathlib.Path(__file__).parent / "dcn_worker.py"
    with tempfile.TemporaryDirectory() as td:
        coord = "localhost:12973"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coord, "2", str(pid), td],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for pid in (0, 1)
        ]
        for p in procs:
            try:
                _, err = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, err.decode()[-2000:]
        frames = [pathlib.Path(td, f"frame_{pid}.bin").read_bytes()
                  for pid in (0, 1)]
    # both hosts assembled the identical frame
    assert frames[0] == frames[1]
    # DCN result == single-process result (same mesh size)
    from compress_tpu.parallel import engine

    single = engine.zstd_encode_sharded(data, job=job, block=block,
                                        checksum=True)
    assert frames[0] == single
    # and it is a conformant zstd frame
    d = zstandard.ZstdDecompressor()
    assert d.decompress(frames[0], max_output_size=len(data) + 16) == data
