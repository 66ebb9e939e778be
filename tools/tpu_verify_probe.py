import sys, time, subprocess
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, numpy as np
tick(f"backend={jax.default_backend()}")
from zstd_tpu import pipeline
from tests.conftest import REF_ZSTD, gen_mixed
cases = {
  "incompressible": np.random.default_rng(7).integers(0,256,300000,dtype=np.uint8).tobytes(),
  "rle": b"\x00" * 300000,
  "tiny": b"ab",
  "empty": b"",
  "mixed": gen_mixed(200000, 8, 0.5),
}
comp = pipeline.TpuCompressor(level=1, checksum=True, batch_blocks=8)
for name, data in cases.items():
    blob = comp.compress(data)
    r = subprocess.run([REF_ZSTD, "-dc"], input=blob, capture_output=True)
    ok = r.stdout == data
    tick(f"{name}: {len(data)} -> {len(blob)} ref_decode_ok={ok}")
    assert ok, name
tick("ALL PROBES OK")
