#!/usr/bin/env python
"""fullbench analog: per-inner-function microbenchmarks.

Role parity: /root/reference/tests/fullbench.c (times individual hot
functions — histograms, table builds, entropy encode/decode, match
finders — outside the full pipeline, so regressions localize).

Host functions run on this box's CPU; pass --device to also time the
jitted device ops on the default JAX backend (pin JAX_PLATFORMS=cpu for
the virtual backend, or run against the real chip).

Usage: JAX_PLATFORMS=cpu python tools/fullbench.py [--mb 4] [--device]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin latches the platform at interpreter startup and
    # ignores the env var; pin via config before any jnp module constants
    import jax
    jax.config.update("jax_platforms", "cpu")


def bench(name, fn, bytes_processed, reps=5):
    fn()                                    # warm
    t = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        t = min(t, time.time() - t0)
    mbps = bytes_processed / t / 1e6 if t > 0 else float("inf")
    print(f"  {name:<44s} {t * 1e3:9.2f} ms  {mbps:9.1f} MB/s")
    return mbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=4)
    ap.add_argument("--device", action="store_true",
                    help="also bench jitted device ops on the JAX backend")
    ap.add_argument("--skip-host", action="store_true",
                    help="skip the slow host-oracle legs (device focus)")
    args = ap.parse_args()

    from bigcorpus import big_corpus
    n = args.mb * 1024 * 1024
    data = big_corpus(n)
    arr = np.frombuffer(data, dtype=np.uint8)
    print(f"corpus {args.mb} MiB (pinned bigcorpus)")

    print("[entropy primitives]")
    bench("HIST_count (np.bincount)",
          lambda: np.bincount(arr, minlength=256), n)

    from zstd_tpu.format import fse, huffman
    hist = np.bincount(arr, minlength=256).astype(np.int64)
    ms = int(np.nonzero(hist)[0][-1])

    def fse_build():
        norm = fse.normalize_count(hist[: ms + 1], 11, n, ms, False)
        fse.build_ctable(norm, ms, 11)
    bench("FSE normalizeCount+buildCTable", fse_build, n)

    def huf_build():
        huffman.build_huf_ctable(hist, ms, 11)
    bench("HUF buildCTable (height-capped)", huf_build, n)

    print("[xxhash]")
    from zstd_tpu.xxhash64 import xxh64
    bench("XXH64 one-shot", lambda: xxh64(data), n)

    if args.skip_host:
        import zstd_tpu                     # noqa: F401  (device leg needs it)
        if args.device:
            _device_leg(data, args)
        return

    print("[match finders  (host)]")
    from zstd_tpu.format.matchfinder import find_sequences
    bench("fast matchfinder (level-1 class)",
          lambda: find_sequences(arr, 0, min(n, 1 << 20), 0, (1, 4, 8),
                                 hash_log=17, mls=6), min(n, 1 << 20))
    from zstd_tpu.format.opt import find_sequences_opt
    from zstd_tpu.params import get_cparams
    cp9 = get_cparams(9, 1 << 17)
    bench("native DP parser (level-9 class, 128K)",
          lambda: find_sequences_opt(arr, 0, 1 << 17, 0, (1, 4, 8), cp9),
          1 << 17)

    print("[block codec  (host)]")
    import zstd_tpu
    blob3 = zstd_tpu.compress(data, level=3, checksum=False)
    bench("compress level 1", lambda: zstd_tpu.compress(data, level=1), n)
    bench("compress level 3", lambda: zstd_tpu.compress(data, level=3), n)
    bench("decompress (native C, X2 4-stream)",
          lambda: zstd_tpu.decompress(blob3), n)

    if args.device:
        _device_leg(data, args)


def _device_leg(data, args):
    print("[device ops  (jitted, default backend)]")
    import jax.numpy as jnp

    import zstd_tpu
    from zstd_tpu import pipeline

    B, BS = 8, 128 * 1024
    blocks = jnp.asarray(
        np.frombuffer(data[: B * BS], np.uint8).reshape(B, BS))
    lens = jnp.full(B, BS, jnp.int32)

    def run_analyze():
        s, _ = pipeline._analyze_jit(blocks, lens, 17, 6, BS // 8,
                                     engine="v3")
        np.asarray(s)
    bench("program A (extract+stats, B=8x128K)", run_analyze, B * BS)

    from zstd_tpu.device_decoder import device_decompress
    frame1 = zstd_tpu.compress(data[: 1 << 20], level=3, checksum=False)
    bench("device decode (1 MiB ref-style frame)",
          lambda: device_decompress(frame1), 1 << 20)


if __name__ == "__main__":
    main()
