#!/usr/bin/env python
"""Benchmark: per-chip encode throughput of the TPU pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline of record: reference zstd -1 single-thread encode on Silesia =
510 MB/s (BASELINE.md, /root/reference/README.md:42-44). Corpus is a
deterministic silesia-like mix (text + structured + binary), since the real
Silesia corpus is not redistributable in-repo.

Robustness: the TPU tunnel in this environment intermittently hangs at
process init or first device contact, so the measurement runs in a child
process under a heartbeat watchdog and is retried on hang. Diagnostics go
to stderr; stdout carries exactly the one JSON line.
"""

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))

_INNER = r'''
import json, os, sys, time
sys.path.insert(0, os.environ["ZSTD_TPU_REPO"])
def hb(msg):
    print(f"[hb] {msg}", file=sys.stderr, flush=True)

hb("importing")
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax
hb(f"devices {jax.devices()}")
import numpy as np
from zstd_tpu import pipeline

def make_corpus(total):
    rng = np.random.default_rng(42)
    words = [b"the", b"of", b"and", b"compression", b"entropy", b"state",
             b"block", b"sequence", b"window", b"offset", b"literal",
             b"frame", b"huffman", b"table", b"stream", b"kernel"]
    chunks = []
    text = bytearray()
    while len(text) < total // 3:
        text += words[rng.integers(len(words))] + b" "
        if rng.random() < 0.04:
            text += b"\n"
    chunks.append(bytes(text[: total // 3]))
    rec = bytearray()
    base = rng.integers(0, 256, 64, dtype=np.uint8)
    while len(rec) < total // 3:
        b = base.copy()
        b[rng.integers(0, 64, 4)] = rng.integers(0, 256, 4, dtype=np.uint8)
        rec += b.tobytes()
    chunks.append(bytes(rec[: total // 3]))
    rnd = rng.integers(0, 48, total - 2 * (total // 3), dtype=np.uint8)
    chunks.append(rnd.tobytes())
    return b"".join(chunks)

total = int(os.environ.get("BENCH_MB", "16")) * 1024 * 1024
data = make_corpus(total)
hb(f"corpus {total>>20} MiB")

comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=int(os.environ.get("BENCH_BATCH", "8")))
blob = comp.compress(data[: 1024 * 1024])   # compile + warm
hb(f"warmup done -> {len(blob)}")

from zstd_tpu import decompress
assert decompress(blob) == data[: 1024 * 1024], "round-trip failed"
hb("integrity ok")

t_best = float("inf")
reps = int(os.environ.get("BENCH_REPS", "3"))
for r in range(reps):
    t0 = time.time()
    blob = comp.compress(data)
    t_best = min(t_best, time.time() - t0)
    hb(f"rep {r}: {total/ (time.time()-t0) / 1e6:.2f} MB/s")
mbps = total / t_best / 1e6
ratio = total / len(blob)

# decode throughput (host native path; reference baseline 1580 MB/s)
t_dec = float("inf")
for r in range(reps):
    t0 = time.time()
    out = decompress(blob)
    t_dec = min(t_dec, time.time() - t0)
assert out == data, "decode round-trip failed"
dec_mbps = total / t_dec / 1e6
hb(f"decode: {dec_mbps:.1f} MB/s")

baseline_mbps = 510.0
print(json.dumps({
    "metric": "encode_throughput_level1",
    "value": round(mbps, 2),
    "unit": "MB/s",
    "vs_baseline": round(mbps / baseline_mbps, 4),
    "ratio": round(ratio, 3),
    "decode_mbps": round(dec_mbps, 1),
    "decode_vs_baseline": round(dec_mbps / 1580.0, 4),
}))
'''


def main():
    env = dict(os.environ)
    env["ZSTD_TPU_REPO"] = REPO
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))
    silence_limit = float(os.environ.get("BENCH_HB_TIMEOUT", "1500"))
    for attempt in range(attempts):
        print(f"[bench] attempt {attempt}", file=sys.stderr, flush=True)
        p = subprocess.Popen([sys.executable, "-u", "-c", _INNER],
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                             text=True, env=env)
        last = [time.time()]
        json_line = [None]

        def pump_err():
            for line in p.stderr:
                last[0] = time.time()
                sys.stderr.write(line)
                sys.stderr.flush()

        def pump_out():
            for line in p.stdout:
                last[0] = time.time()
                if line.strip().startswith("{"):
                    json_line[0] = line.strip()

        te = threading.Thread(target=pump_err, daemon=True)
        to = threading.Thread(target=pump_out, daemon=True)
        te.start(); to.start()
        while p.poll() is None:
            if time.time() - last[0] > silence_limit:
                print("[bench] heartbeat timeout; killing child",
                      file=sys.stderr, flush=True)
                p.kill()
                break
            time.sleep(2)
        p.wait()
        te.join(timeout=5); to.join(timeout=5)
        if p.returncode == 0 and json_line[0]:
            print(json_line[0])
            return 0
        time.sleep(5)
    print(json.dumps({
        "metric": "encode_throughput_level1", "value": 0.0, "unit": "MB/s",
        "vs_baseline": 0.0, "error": "tpu tunnel unavailable"}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
