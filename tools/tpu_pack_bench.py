import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops.bitpack import pack_bits, pack_bits_gather

rng = np.random.default_rng(0)
B, M = 8, 6*4096+4
vals = jnp.asarray(rng.integers(0, 255, (B, M)).astype(np.int32))
nbs = jnp.asarray(rng.integers(0, 9, (B, M)).astype(np.int32))
OW = (4096*90)//32 + 4

def timed(name, fn):
    f = jax.jit(lambda v, n: jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.int32)), jax.vmap(fn)(v, n), jnp.int32(0)))
    _ = int(f(vals, nbs))
    t0=time.time()
    for _r in range(5): s = int(f(vals, nbs))
    tick(f"{name}: {(time.time()-t0)/5*1000:.1f} ms")

timed("scatter", lambda v, n: pack_bits(v, n, OW))
timed("gather48", lambda v, n: pack_bits_gather(v, n, OW, 48))
timed("gather16", lambda v, n: pack_bits_gather(v, n, OW, 16))

# huffman shape
M2 = 32*1024+1
vals2 = jnp.asarray(rng.integers(0, 255, (B, 4, M2)).astype(np.int32).reshape(B*4, M2))
nbs2 = jnp.asarray(rng.integers(1, 9, (B, 4, M2)).astype(np.int32).reshape(B*4, M2))
OW2 = (32768*12)//32+4
def timed2(name, fn):
    f = jax.jit(lambda v, n: jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.int32)), jax.vmap(fn)(v, n), jnp.int32(0)))
    _ = int(f(vals2, nbs2))
    t0=time.time()
    for _r in range(5): s = int(f(vals2, nbs2))
    tick(f"{name}: {(time.time()-t0)/5*1000:.1f} ms")
timed2("huf scatter", lambda v, n: pack_bits(v, n, OW2))
timed2("huf gather33", lambda v, n: pack_bits_gather(v, n, OW2, 33))
