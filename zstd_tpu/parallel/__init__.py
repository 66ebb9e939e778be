"""Distributed execution: mesh construction + sharded block compression.

The reference's parallelism is thread-level (zstdmt job sharding within a
frame, /root/reference/lib/compress/zstdmt_compress.c; pzstd frame sharding
across files, /root/reference/contrib/pzstd). The TPU-native equivalents:

- blocks of one frame shard across chips over a `dp` mesh axis (zstdmt analog)
- per-shard compressed lengths are exchanged with an all_gather; the ordered
  stitch (ZSTDMT_flushProduced analog) is an ordered concatenation on host
- one frame shards across chips end-to-end (zstdmt analog): parallel.zstdmt
- frames shard across hosts (pzstd analog): parallel.pzstd ranges +
  parallel.multihost (jax.distributed process group, DCN gather)
"""
