"""flate — DEFLATE (RFC 1951), stdlib-compatible capability set.

Reference parity: the flate/ package — levels -2 (HuffmanOnly), 0 (store),
1-9, custom windows (NewWriterWindow), stateless mode, resumable inflate
with checkpoints (SURVEY.md §2.3).
"""

from compress_tpu.flate.deflate import (
    BEST_COMPRESSION,
    BEST_SPEED,
    DEFAULT_COMPRESSION,
    HUFFMAN_ONLY,
    MAX_OFFSET,
    NO_COMPRESSION,
    deflate,
    stateless_deflate,
)
from compress_tpu.flate.inflate import Checkpoint, InflateError, inflate

__all__ = [
    "deflate", "inflate", "stateless_deflate",
    "Checkpoint", "InflateError",
    "HUFFMAN_ONLY", "NO_COMPRESSION", "DEFAULT_COMPRESSION",
    "BEST_SPEED", "BEST_COMPRESSION", "MAX_OFFSET",
]
