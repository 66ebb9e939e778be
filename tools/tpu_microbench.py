#!/usr/bin/env python
"""Stage-level timing of the TPU encode pipeline on the real chip.

The maintained successor of the round-2 probe scratch: every number the
pipeline's design leans on (dispatch floor, gather rate, per-stage ms/MB)
is re-measurable from here. Run with NOTHING else on the host — the axon
relay shares this machine's CPU and concurrent load inflates device
timings 5-20x (PARITY.md measurement rules).

Usage: python tools/tpu_microbench.py [stage ...]
Stages: floor h2d extract v3parts analyze pack e2e   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from zstd_tpu.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_fetch = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))


def sync(x):
    """block_until_ready does not wait on the axon backend; fetching a
    scalar reduction does."""
    return float(_fetch(x if not isinstance(x, (tuple, list, dict))
                        else jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, reps=5):
    """min seconds over reps of dispatch+scalar-fetch (includes ~1 RTT)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    return best


def corpus_mb(mb=1):
    from bigcorpus import big_corpus
    return big_corpus(mb * 1024 * 1024)


def blocks_of(data, bs=128 * 1024, b=8):
    arr = np.frombuffer(data, np.uint8)
    n = bs * b
    blocks = arr[:n].reshape(b, bs).copy()
    lens = np.full(b, bs, np.int32)
    return blocks, lens


def stage_floor():
    one = jnp.zeros(8, jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    sync(f(one))
    t = timeit(lambda: f(one), reps=9)
    log(f"[floor] dispatch+fetch floor: {t*1000:.1f} ms")
    return t


def stage_h2d():
    data = np.random.default_rng(0).integers(0, 255, 4 << 20, dtype=np.uint8)
    put = lambda: jax.device_put(data)
    sync(put())
    t = timeit(put, reps=3)
    log(f"[h2d] 4 MiB host->device: {t*1000:.0f} ms ({4/t:.1f} MB/s)")


def stage_extract(engines=("v3", "pallas")):
    data = corpus_mb(1)
    blocks, lens = blocks_of(data)
    bj, lj = jnp.asarray(blocks), jnp.asarray(lens)
    from zstd_tpu import pipeline
    for eng in engines:
        try:
            f = lambda: pipeline._analyze_jit(bj, lj, 15, 6, 16 * 1024,
                                              engine=eng)[0]
            sync(f())           # compile
            t = timeit(f)
            log(f"[analyze:{eng}] {t*1000:.0f} ms/MB")
        except Exception as e:
            log(f"[analyze:{eng}] failed: {type(e).__name__}: {e}")


def stage_v3parts():
    """Time the v3 sub-stages separately: hash, sort-candidates, capped
    match length, resolve scan."""
    from zstd_tpu.ops import fastmatch as fm
    data = corpus_mb(1)
    blocks, lens = blocks_of(data)
    bj = jnp.asarray(blocks)
    lj = jnp.asarray(lens)

    @jax.jit
    def hash_only(bj, lj):
        def per(b, vl):
            tri, b3, tri3, b6 = fm._tri_arrays(b)
            return fm._hash_f32(tri, tri3, b3, b6, 15, 6)
        return jax.vmap(per)(bj, lj)

    @jax.jit
    def cand_only(bj, lj):
        def per(b, vl):
            tri, b3, tri3, b6 = fm._tri_arrays(b)
            h = fm._hash_f32(tri, tri3, b3, b6, 15, 6)
            return fm._candidates(h, 15, vl)
        return jax.vmap(per)(bj, lj)

    @jax.jit
    def mlen_only(bj, lj):
        def per(b, vl):
            tri, b3, tri3, b6 = fm._tri_arrays(b)
            h = fm._hash_f32(tri, tri3, b3, b6, 15, 6)
            cand = fm._candidates(h, 15, vl)
            return fm._capped_mlen(tri, b3, cand, vl, 0)
        return jax.vmap(per)(bj, lj)

    full = jax.jit(lambda bj, lj: fm.extract_batch_v3(bj, lj, 15, 6,
                                                      16 * 1024)["nb_seq"])
    t_prev = 0.0
    for name, f in (("hash", hash_only), ("hash+sortcand", cand_only),
                    ("hash+cand+mlen", mlen_only), ("v3 full", full)):
        try:
            sync(f(bj, lj))
            t = timeit(lambda: f(bj, lj))
            log(f"[v3:{name}] {t*1000:.0f} ms/MB (delta {1000*(t-t_prev):.0f})")
            t_prev = t
        except Exception as e:
            log(f"[v3:{name}] failed: {type(e).__name__}: {e}")


def stage_pack():
    from zstd_tpu import pipeline
    data = corpus_mb(1)
    comp = pipeline.TpuCompressor(level=1, batch_blocks=8)
    blob = comp.compress(data)       # warm everything
    t0 = time.time()
    comp.compress(data)
    log(f"[pipeline 1MB] {(time.time()-t0)*1000:.0f} ms e2e "
        f"(ratio {len(data)/len(blob):.2f})")


def stage_e2e():
    from zstd_tpu import pipeline
    data = corpus_mb(8)
    comp = pipeline.TpuCompressor(level=1, batch_blocks=8)
    comp.compress(data[: 1 << 20])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        comp.compress(data)
        best = min(best, time.time() - t0)
    log(f"[e2e 8MB] {len(data)/best/1e6:.2f} MB/s")


STAGES = {"floor": stage_floor, "h2d": stage_h2d, "extract": stage_extract,
          "v3parts": stage_v3parts, "pack": stage_pack, "e2e": stage_e2e}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    log(f"devices: {jax.devices()}")
    for nm in names:
        STAGES[nm]()
