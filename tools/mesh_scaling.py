#!/usr/bin/env python
"""Virtual-mesh scaling curve for the zstdmt-analog sharded compressor.

Measures bytes/s of parallel/zstdmt.compress_sharded at mesh sizes
1/2/4/8 over an 8 MB input on the CPU backend with
--xla_force_host_platform_device_count=8 (VERDICT r3 #8: the virtual mesh
bounds the collective/halo/stitch overhead, not silicon speed — real-chip
scaling multiplies per-chip compute into the same comms skeleton).

Run: python tools/mesh_scaling.py [MB]
Prints a markdown table + asserts the frame is byte-identical across mesh
sizes (the zstdmt determinism contract).
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU plugin reads the env at interpreter startup (.pth hook), so
# the env var alone is too late — pin through jax.config (see conftest.py)
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from tests.bigcorpus import big_corpus  # noqa: E402
from zstd_tpu.parallel import zstdmt  # noqa: E402


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    data = big_corpus(mb * 1024 * 1024)
    devs = jax.devices()
    assert len(devs) >= 8, f"need 8 virtual devices, got {len(devs)}"
    rows = []
    frames = {}
    for nsh in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:nsh]), ("dp",))
        out = zstdmt.compress_sharded(data, level=1, mesh=mesh)  # warm/compile
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = zstdmt.compress_sharded(data, level=1, mesh=mesh)
            best = min(best, time.time() - t0)
        frames[nsh] = out
        rows.append((nsh, len(data) / best / 1e6))
    base = rows[0][1]
    print("| mesh | MB/s | speedup |")
    print("|---|---|---|")
    for nsh, mbs in rows:
        print(f"| {nsh} | {mbs:.1f} | {mbs / base:.2f}x |")
    sizes = {len(v) for v in frames.values()}
    assert len(sizes) == 1, f"frames differ across mesh sizes: {sizes}"
    assert frames[1] == frames[8], "bytes differ between mesh 1 and 8"
    print(f"\nframe bytes identical across mesh sizes ({sizes.pop()} B)")


if __name__ == "__main__":
    main()
