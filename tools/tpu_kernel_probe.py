"""Kernel-only TPU timing: analyze+pack on device, no host round-trips."""
import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.pipeline import _analyze_jit
from tests.conftest import gen_text

B, N = 32, 128*1024
data = gen_text(B*N, 0)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
lens = np.full(B, N, np.int32)
db = jax.device_put(jnp.asarray(blocks))
dl = jax.device_put(jnp.asarray(lens))
tick("h2d done")
stats, resident = _analyze_jit(db, dl, 13, 6, N//4)
jax.block_until_ready(stats)
tick("analyze compiled+run")
t0=time.time()
for _ in range(3):
    stats, resident = _analyze_jit(db, dl, 13, 6, N//4)
    jax.block_until_ready(stats)
dt = (time.time()-t0)/3
tick(f"analyze warm: {B*N/dt/1e6:.1f} MB/s ({dt*1000:.0f} ms/batch)")
