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
    "decode_blocks_device",
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


def decode_blocks_device(blocks, *, allow_repeat: bool = True,
                         max_rounds: int = 4):
    """Batched device decode of S2/snappy blocks (r3; s2/device_dec.py)."""
    from compress_tpu.s2.device_dec import decode_blocks_device as _d

    return _d(blocks, allow_repeat=allow_repeat, max_rounds=max_rounds)
