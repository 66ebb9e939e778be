#!/usr/bin/env python
"""paramgrill analog: compression-parameter grid search.

Role parity: /root/reference/tests/paramgrill.c — sweep cParams
combinations on a corpus and report the Pareto frontier of (speed,
ratio), so users can derive custom levels for their data.

Usage:
  JAX_PLATFORMS=cpu python tools/paramgrill.py [--mb 2] [--seconds 60]
  JAX_PLATFORMS=cpu python tools/paramgrill.py --file path/to/corpus

Prints one line per Pareto-optimal parameter set, best-ratio last, as
constructor-ready CParams fields.
"""

import argparse
import dataclasses
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=2)
    ap.add_argument("--file", default=None)
    ap.add_argument("--seconds", type=float, default=120.0,
                    help="overall time budget; the sweep stops when spent")
    args = ap.parse_args()

    if args.file:
        data = open(args.file, "rb").read()
    else:
        from bigcorpus import big_corpus
        data = big_corpus(args.mb * 1024 * 1024)

    from zstd_tpu.format.frame import compress_frame
    from zstd_tpu.params import get_cparams

    base = get_cparams(3, len(data))
    grid = dict(
        window_log=[18, 20, 22],
        hash_log=[14, 16, 18],
        search_log=[1, 3, 5],
        min_match=[3, 4, 6],
        strategy=[1, 2, 5, 7, 9],
    )
    combos = list(itertools.product(*grid.values()))
    print(f"corpus {len(data) >> 20} MiB; {len(combos)} combos, "
          f"budget {args.seconds:.0f}s")

    results = []
    t_start = time.time()
    for vals in combos:
        if time.time() - t_start > args.seconds:
            print(f"[budget spent: evaluated {len(results)}/{len(combos)}]")
            break
        cp = dataclasses.replace(base, **dict(zip(grid.keys(), vals)))
        t0 = time.time()
        try:
            blob = compress_frame(data, cp)
        except Exception as e:
            print(f"  skip {vals}: {type(e).__name__}")
            continue
        dt = time.time() - t0
        results.append((len(data) / dt / 1e6, len(data) / len(blob), cp))

    # Pareto frontier on (speed, ratio)
    results.sort(key=lambda r: (-r[0], -r[1]))
    frontier = []
    best_ratio = 0.0
    for speed, ratio, cp in results:
        if ratio > best_ratio:
            frontier.append((speed, ratio, cp))
            best_ratio = ratio
    print(f"{'MB/s':>8s} {'ratio':>7s}  cparams")
    for speed, ratio, cp in frontier:
        fields = {f.name: getattr(cp, f.name)
                  for f in dataclasses.fields(cp)}
        print(f"{speed:8.2f} {ratio:7.3f}  {fields}")


if __name__ == "__main__":
    main()
