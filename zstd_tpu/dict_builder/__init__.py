"""Dictionary training (`zstd --train` analog).

fastCover-style d-mer frequency training (reference:
/root/reference/lib/dictBuilder/fastcover.c) with numpy-vectorized counting —
the same statistics pipeline the TPU kernels batch across chips for the k,d
hyper-parameter sweep (SURVEY.md §2.4).
"""
