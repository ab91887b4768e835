"""compress_tpu — a TPU-native lossless compression framework.

A from-scratch reimplementation of the capabilities of klauspost/compress
(zstd, S2/Snappy, deflate/gzip/zlib/zip, FSE, huff0, dictionaries, seekable
indexes, HTTP middleware) designed TPU-first:

- Device compute path: JAX / XLA / Pallas kernels (``compress_tpu.ops``) for
  hash-table match finding, N-stream entropy decode, histogramming and
  parallel bit-packing, scaled over ``jax.sharding.Mesh`` device meshes
  (``compress_tpu.parallel``).
- Host runtime: a C++ native core (``compress_tpu._native``) for the serial
  byte/bit plumbing (framing, bitstream assembly), mirroring the reference's
  generated-assembly layer, with pure-Python/numpy fallbacks everywhere
  (the reference's ``noasm`` build-tag analogue; set COMPRESS_TPU_NONATIVE=1).

Layer map mirrors SURVEY.md §1 (reference: /root/reference).
"""

from compress_tpu.estimate import estimate, shannon_entropy_bits

__version__ = "0.1.0"

__all__ = [
    "estimate",
    "shannon_entropy_bits",
    "__version__",
]
