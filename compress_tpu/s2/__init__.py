"""S2 — snappy-extended block and stream format (reference: s2/ package).

Block API here; stream Writer/Reader, seek index, and dictionaries in
sibling modules. The device (JAX/Pallas) encode path is exposed through
compress_tpu.parallel for block-sharded throughput.
"""

from compress_tpu.s2.block import (  # noqa: F401
    concat_blocks,
    estimate_block_size,
    CorruptError,
    MAX_BLOCK_SIZE,
    decode,
    decoded_len,
    encode,
    encode_better,
    encode_best,
    encode_snappy,
    encode_snappy_better,
    encode_snappy_best,
    max_encoded_len,
)

__all__ = [
    "CorruptError",
    "MAX_BLOCK_SIZE",
    "concat_blocks",
    "decode",
    "decoded_len",
    "encode",
    "encode_better",
    "encode_best",
    "estimate_block_size",
    "encode_snappy",
    "encode_snappy_better",
    "encode_snappy_best",
    "max_encoded_len",
]
