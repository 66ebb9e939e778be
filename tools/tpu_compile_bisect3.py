import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.pipeline import _analyze_jit
N = 128*1024

def timeit(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    tick(f"{name}: compile+run {time.time()-t0:.1f}s")
    return fn, args

for B in (8, 16):
    fn, args = timeit(f"analyze B={B}",
       lambda bb, vv: _analyze_jit(bb, vv, 13, 6, N//4),
       jnp.zeros((B, N), jnp.uint8), jnp.full(B, N, jnp.int32))
    t0=time.time()
    for _ in range(3):
        out = jax.jit(fn)(*args); jax.block_until_ready(out)
    dt=(time.time()-t0)/3
    tick(f"analyze B={B} warm: {B*N/dt/1e6:.1f} MB/s")
