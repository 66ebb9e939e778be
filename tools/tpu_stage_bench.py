import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu import pipeline
from zstd_tpu.pipeline import _analyze_jit, _pack_impl
from tests.conftest import gen_text
B, N = 8, 128*1024
data = gen_text(B*N, 0)
blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N))
lens = jnp.full(B, N, jnp.int32)

# run the real pipeline once to warm all programs
comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=8)
comp.compress(data)
tick("pipeline warm")

sync = jax.jit(lambda t: jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.int32)).astype(jnp.int64), t, jnp.int64(0)))

# stage A analyze
t0=time.time()
for _ in range(3):
    stats, resident = _analyze_jit(blocks, lens, 13, 6, N//4, use_pallas=True)
    _ = int(sync((stats,)))
tick(f"analyze warm: {(time.time()-t0)/3*1000:.0f} ms")

# stats fetch
t0=time.time()
for _ in range(3):
    s = np.asarray(_analyze_jit(blocks, lens, 13, 6, N//4, use_pallas=True)[0])
tick(f"analyze+stats fetch: {(time.time()-t0)/3*1000:.0f} ms ({s.nbytes} B)")

# full compress timing breakdown
import cProfile, pstats
t0=time.time(); comp.compress(data); tick(f"e2e warm: {(time.time()-t0)*1000:.0f} ms")
