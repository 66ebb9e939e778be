"""End-to-end TPU pipeline probe with the pallas resolve path."""
import sys, time, subprocess
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, numpy as np
tick(f"init {jax.devices()} pallas_path")
from zstd_tpu import pipeline
from tests.conftest import gen_text, REF_ZSTD
data = gen_text(1024*1024, 0)
comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=8)
blob = comp.compress(data)
tick(f"1MB first -> {len(blob)}")
r = subprocess.run([REF_ZSTD, "-dc"], input=blob, capture_output=True)
assert r.stdout == data, "REF DECODE MISMATCH"
tick("reference decode OK")
t0=time.time(); comp.compress(data); tick(f"1MB warm {1/(time.time()-t0):.2f} MB/s")
data8 = gen_text(8*1024*1024, 1)
blob8 = comp.compress(data8)
tick(f"8MB first -> {len(blob8)}")
r = subprocess.run([REF_ZSTD, "-dc"], input=blob8, capture_output=True)
assert r.stdout == data8, "REF DECODE MISMATCH 8MB"
t0=time.time(); comp.compress(data8); dt=time.time()-t0
tick(f"8MB warm {8/dt:.2f} MB/s")
