"""TPU compute path: batched, jittable kernels (JAX/XLA + Pallas).

Every op here is differential-tested against the host oracle in
zstd_tpu.format. Blocks are the batch dimension: a 128 KiB block is one lane
of work, and B blocks run as one device program. Shapes are static (blocks
are padded); per-block validity is carried as lengths.
"""
