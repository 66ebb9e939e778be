import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match
from zstd_tpu.ops.resolve_pallas import resolve_compact, PAD
from tests.conftest import gen_text
B, N = 8, 128*1024
data = gen_text(B*N, 0)
blocks = np.frombuffer(data, np.uint8).reshape(B, N)
vls = jnp.full(B, N, jnp.int32)

@jax.jit
def propose(bb, vv):
    def one(b, v):
        h = match.hash_positions(b, 13, 6)
        return match.prev_same_bucket(h, v)
    return jax.vmap(one)(bb, vv)

cands = propose(jnp.asarray(blocks), vls)
bp = np.zeros((B, N + PAD), np.int32); bp[:, :N] = blocks
cp = np.full((B, N + PAD), -1, np.int32)
cp[:, :N] = np.asarray(cands)
dbp, dcp = jnp.asarray(bp), jnp.asarray(cp)

@jax.jit
def run(dbp, dcp, vls):
    pos, lens, nb = resolve_compact(dbp, dcp, vls, N // 4)
    return jnp.sum(pos) + jnp.sum(lens) + jnp.sum(nb)

_ = int(run(dbp, dcp, vls))
t0 = time.time()
for _r in range(3):
    s = int(run(dbp, dcp, vls))
dt = (time.time()-t0)/3
tick(f"pallas resolve warm: {dt*1000:.0f} ms/batch ({B*N/dt/1e6:.1f} MB/s) sum={s}")
