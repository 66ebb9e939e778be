"""Ratio-parity report: our encoder vs the reference binary on the pinned
big corpus (tests/bigcorpus.py), per level — the regression-CSV analog
(/root/reference/tests/regression/results.csv rows for silesia.tar).

Usage: python tools/ratio_report.py [--size BYTES] [--levels 1,3,9,19,22]
Writes a markdown table to stdout; exit code 1 if any level is worse.
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".ref-build", "programs", "zstd")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--levels", default="1,3,9,13,19,22")
    ap.add_argument("--fast", action="store_true", help="include --fast=1,3")
    args = ap.parse_args()

    from tests.bigcorpus import big_corpus
    import zstd_tpu

    data = big_corpus(args.size)
    print(f"corpus: {len(data)} bytes (tests/bigcorpus.py)", file=sys.stderr)

    levels = [int(x) for x in args.levels.split(",")]
    specs = [(lv, [f"-{lv}"]) for lv in levels]
    if args.fast:
        specs = [(-1, ["--fast=1"]), (-3, ["--fast=3"])] + specs

    rows = []
    worse = False
    print("| level | ours (B) | ref (B) | delta | ours MB/s |")
    print("|---|---|---|---|---|")
    for lv, ref_args in specs:
        r = subprocess.run([REF, "-c", *ref_args], input=data,
                           capture_output=True, check=True)
        ref_sz = len(r.stdout)
        t0 = time.time()
        ours = zstd_tpu.compress(data, level=lv)
        dt = time.time() - t0
        # round-trip integrity through the reference decoder
        d = subprocess.run([REF, "-dc"], input=ours, capture_output=True,
                           check=True)
        assert d.stdout == data, f"level {lv}: reference failed to decode ours"
        delta = (len(ours) - ref_sz) / ref_sz
        flag = "" if len(ours) <= ref_sz else "  **WORSE**"
        worse |= len(ours) > ref_sz
        print(f"| {lv} | {len(ours)} | {ref_sz} | {delta:+.3%}{flag} | "
              f"{len(data)/dt/1e6:.1f} |")
        rows.append((lv, len(ours), ref_sz))
    return 1 if worse else 0


if __name__ == "__main__":
    sys.exit(main())
