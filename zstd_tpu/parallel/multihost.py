"""Multi-host runtime: pzstd-style frame data-parallelism across processes.

Role parity: /root/reference/contrib/pzstd/Pzstd.cpp:73,87 — each worker
compresses an independent, contiguous chunk range into frames; outputs are
concatenated in shard order. On a pod this is host-level DP over DCN:
`jax.distributed.initialize` forms the process group, each process
compresses its contiguous chunk range with its local chips (or host codec),
and the in-order concatenation happens wherever the bytes are collected
(process 0, a filesystem, an object store).

The runtime deliberately exchanges no compressed bytes through collectives:
like pzstd, frames are independent, so the only coordination is the
process_index/process_count split and the final ordered concatenation —
mirroring how zstdmt's flushProduced drains jobs in order
(/root/reference/lib/compress/zstdmt_compress.c).

Tested without a cluster by launching N OS processes against the
`jax.distributed` local service (tests/test_multihost.py), the same shape
a real multi-host slice uses.
"""

from __future__ import annotations

import os

from .pzstd import pzstd_compress, pzstd_decompress


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Join (or start) the jax.distributed process group.

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns
    (process_index, process_count). Safe to call when already initialized
    or when running single-process (returns (0, 1))."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid_env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid_env) if pid_env is not None else None

    if coordinator and num_processes and num_processes > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError:
            pass  # already initialized
        return jax.process_index(), jax.process_count()
    return 0, 1


def compress_my_shard(data: bytes, level: int = 3, checksum: bool = False,
                      chunk_size: int = 1 << 22,
                      process_index: int | None = None,
                      process_count: int | None = None,
                      workers: int = 4) -> bytes:
    """Compress THIS process's contiguous chunk range of `data` into
    standard multi-frame zstd (with pzstd size-hint skippables).

    Every process calls this with the same `data` view (or its own slice
    read from shared storage); concatenating the outputs in process order
    yields one stream any zstd decoder reads."""
    import jax

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return pzstd_compress(data, level=level, checksum=checksum,
                          chunk_size=chunk_size, workers=workers,
                          shard_index=process_index,
                          shard_count=process_count)


def gather_and_concat(shard_bytes: bytes) -> list[bytes] | None:
    """All-gather each process's compressed shard to process 0 over the
    process group (DCN), returning the ordered list there (None elsewhere).

    Uses jax.experimental.multihost_utils broadcast/gather of length-
    prefixed byte buffers; small coordination cost compared to the frames
    themselves, and only needed when the output must land on one host —
    shared filesystems skip this entirely (pzstd writes one file directly).
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return [shard_bytes]
    from jax.experimental import multihost_utils

    # exchange sizes, then pad to the max and gather
    n = np.asarray([len(shard_bytes)], np.int64)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    cap = int(sizes.max())
    buf = np.zeros(cap, np.uint8)
    buf[: len(shard_bytes)] = np.frombuffer(shard_bytes, np.uint8)
    all_bufs = multihost_utils.process_allgather(buf)
    if jax.process_index() != 0:
        return None
    return [all_bufs[i, : int(sizes[i])].tobytes()
            for i in range(jax.process_count())]


def decompress_stream(blob: bytes, workers: int = 4,
                      window_log_max: int = 27) -> bytes:
    """Decode a multi-host-produced stream (plain multi-frame zstd)."""
    return pzstd_decompress(blob, workers=workers,
                            window_log_max=window_log_max)
