#!/usr/bin/env python
"""Benchmark: per-chip encode throughput of the TPU pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline of record: reference zstd -1 single-thread encode on Silesia =
510 MB/s (BASELINE.md, /root/reference/README.md:42-44). Corpus here is a
deterministic silesia-like mix (text + structured + binary), since the real
Silesia corpus is not redistributable in-repo.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _enable_cache():
    from zstd_tpu.runtime import enable_compile_cache
    enable_compile_cache()


def make_corpus(total: int = 32 * 1024 * 1024) -> bytes:
    rng = np.random.default_rng(42)
    words = [b"the", b"of", b"and", b"compression", b"entropy", b"state",
             b"block", b"sequence", b"window", b"offset", b"literal",
             b"frame", b"huffman", b"table", b"stream", b"kernel"]
    chunks = []
    size = 0
    # text-ish third
    text = bytearray()
    while len(text) < total // 3:
        text += words[rng.integers(len(words))] + b" "
        if rng.random() < 0.04:
            text += b"\n"
    chunks.append(bytes(text[: total // 3]))
    # structured third: repetitive records with drifting fields
    rec = bytearray()
    base = rng.integers(0, 256, 64, dtype=np.uint8)
    while len(rec) < total // 3:
        b = base.copy()
        b[rng.integers(0, 64, 4)] = rng.integers(0, 256, 4, dtype=np.uint8)
        rec += b.tobytes()
    chunks.append(bytes(rec[: total // 3]))
    # semi-random third (low-entropy bytes)
    rnd = rng.integers(0, 48, total - 2 * (total // 3), dtype=np.uint8)
    chunks.append(rnd.tobytes())
    return b"".join(chunks)


def main():
    _enable_cache()
    from zstd_tpu import pipeline

    total = int(os.environ.get("BENCH_MB", "32")) * 1024 * 1024
    data = make_corpus(total)

    comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=32)
    # warm-up / compile
    blob = comp.compress(data[: 8 * 1024 * 1024])
    t_best = float("inf")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    for _ in range(reps):
        t0 = time.time()
        blob = comp.compress(data)
        t_best = min(t_best, time.time() - t0)
    mbps = len(data) / t_best / 1e6
    ratio = len(data) / len(blob)

    # integrity spot-check: decode the first frame slice with the oracle
    from zstd_tpu import decompress
    small = comp.compress(data[: 1 * 1024 * 1024])
    assert decompress(small) == data[: 1 * 1024 * 1024], "round-trip failed"

    baseline_mbps = 510.0  # zstd -1 Silesia encode, reference README
    print(json.dumps({
        "metric": "encode_throughput_level1",
        "value": round(mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mbps / baseline_mbps, 3),
        "ratio": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
