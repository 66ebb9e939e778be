"""Exact RFC 8878 format layer (host-side reference codec + (de)serialization).

This package is the format oracle of the framework: a precise, testable
implementation of every on-wire structure (frames, blocks, FSE/Huffman table
descriptions, sequence bitstreams). The TPU compute path (zstd_tpu.ops)
produces/consumes the same structures; this layer is the ground truth the
kernels are differential-tested against, and handles the tiny header-level
work that stays on host in production.
"""
