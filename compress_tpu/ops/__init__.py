"""Device compute kernels (JAX/XLA/Pallas) — the reference's asm layer,

re-designed TPU-first (SURVEY.md §2.10 mapping table):
- lz: LZ match finding + parse + emit for S2/Snappy (and the zstd ladders)
- bitpack: parallel bitstream pack/unpack (lengths -> scan -> gather)
- entropy kernels (FSE/huff0) live next to their codecs and import from here
"""
