"""Round-2 probe #5 (QUIESCED): time the v3 analyze program on the chip.

Times _analyze_jit (extract v3 + stats) and the pack program at B=8/16/32,
on realistic mixed data — the numbers that size bench.py.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

def tick(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

tick(f"init {jax.devices()} backend={jax.default_backend()}")
from tests.conftest import gen_text, gen_mixed
from zstd_tpu.pipeline import _analyze_jit

N = 131072
B_MAX = 32
data = gen_text(B_MAX * N // 2, 0) + gen_mixed(B_MAX * N - B_MAX * N // 2, 1)
all_blocks = np.frombuffer(data, np.uint8).reshape(B_MAX, N)
for B in (8, 16, 32):
    blocks = jnp.asarray(all_blocks[:B])
    lens = jnp.full(B, N, jnp.int32)

    for eng in (("v3",) if B < 32 else ("v3", "xla")):
        f = jax.jit(lambda b, v: jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
            _analyze_jit(b, v, 14, 7, N // 4, engine=eng)[0],
            jnp.float32(0)))
        try:
            t0 = time.time()
            _ = float(f(blocks, lens))
            c = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                s = float(f(blocks, lens))
            dt = (time.time() - t0) / 3
            tick(f"analyze[{eng}] B={B}: {dt*1000:.1f} ms "
                 f"({B*N/dt/1e6:.1f} MB/s) [compile {c:.0f}s]")
        except Exception as e:
            tick(f"analyze[{eng}] B={B}: FAILED {type(e).__name__}: "
                 f"{str(e)[:200]}")
tick("done")
