"""L1 primitives: varints, checksums, histograms, little-endian views.

Reference parity: internal/le, xxhash, crc32 usage, varint plumbing in
s2/index.go and s2/encode.go (see SURVEY.md §2.8).
"""

from compress_tpu.utils.varint import (
    put_uvarint,
    read_uvarint,
    uvarint_len,
    put_varint,
    read_varint,
)
from compress_tpu.utils.crc import crc32c, crc32c_masked, crc_snappy
from compress_tpu.utils.xxhash64 import xxh64

__all__ = [
    "put_uvarint",
    "read_uvarint",
    "uvarint_len",
    "put_varint",
    "read_varint",
    "crc32c",
    "crc32c_masked",
    "crc_snappy",
    "xxh64",
]
