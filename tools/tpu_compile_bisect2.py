import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops.seqextract import extract_block, extract_batch
from zstd_tpu.pipeline import _analyze_jit
N = 128*1024

def timeit(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    tick(f"{name}: compile+run {time.time()-t0:.1f}s")

timeit("extract_batch B=32",
       lambda bb, vv: extract_batch(bb, vv, 13, 6, N//4),
       jnp.zeros((32, N), jnp.uint8), jnp.full(32, N, jnp.int32))
timeit("analyze B=4",
       lambda bb, vv: _analyze_jit(bb, vv, 13, 6, N//4),
       jnp.zeros((4, N), jnp.uint8), jnp.full(4, N, jnp.int32))
timeit("analyze B=32",
       lambda bb, vv: _analyze_jit(bb, vv, 13, 6, N//4),
       jnp.zeros((32, N), jnp.uint8), jnp.full(32, N, jnp.int32))
