"""Mesh-parallel engines — the reference's goroutine engines, TPU-native.

SURVEY.md §2.9 mapping:
- P1 (encoder pool)        -> batch axis on one chip (vmap) and across chips
- P3 (job engine)          -> block shards over a `jax.sharding.Mesh`,
                              ordered gather of per-shard outputs
- P5 (s2 writer fan-out)   -> same data-parallel shard; chunk CRCs on host
Collectives ride ICI via XLA (psum for stats, all_gather for the ordered
flusher bookkeeping) — no NCCL/MPI analogue, per the design brief.
"""

from compress_tpu.parallel.engine import (
    block_mesh,
    encode_blocks_sharded,
    encode_step_stats,
    s2_stream_encode_device,
    zstd_decode_sharded,
    zstd_encode_sharded,
)

__all__ = [
    "block_mesh",
    "encode_blocks_sharded",
    "encode_step_stats",
    "s2_stream_encode_device",
    "zstd_decode_sharded",
    "zstd_encode_sharded",
]
