import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops.fse_enc import fse_pack_batch, STATE_TABLE_PAD, SYM_PAD
from zstd_tpu.ops.huffman_enc import huf_pack_4x_batch
B = 8
rng = np.random.default_rng(0)
for CAP in (4096, 16384):
    OW = CAP + 8
    args = [jnp.asarray(rng.integers(0, 30, (B, CAP)).astype(np.int32)) for _ in range(3)]
    extras = [jnp.asarray(rng.integers(0, 100, (B, CAP)).astype(np.int32)) for _ in range(3)]
    nb = jnp.full(B, CAP-5, jnp.int32)
    sts = jnp.asarray(rng.integers(0, 512, (B,3,STATE_TABLE_PAD)).astype(np.int32))
    dns = jnp.asarray(rng.integers(0, 1<<18, (B,3,SYM_PAD)).astype(np.int32))
    dfs = jnp.asarray(rng.integers(0, 100, (B,3,SYM_PAD)).astype(np.int32))
    tls = jnp.full((B,3), 9, jnp.int32)
    f = jax.jit(lambda *a: jnp.sum(fse_pack_batch(*a, CAP, OW)[0].astype(jnp.int32)))
    allargs = (*args, *extras, nb, sts, dns, dfs, tls)
    _ = int(f(*allargs))
    t0=time.time()
    for _r in range(3): s = int(f(*allargs))
    tick(f"fse_pack cap={CAP}: {(time.time()-t0)/3*1000:.0f} ms")
# huffman pack
L = 131072; seg = (L+3)//4; OWH = (seg*10)//32+4
lits = jnp.asarray(rng.integers(0, 256, (B, L)).astype(np.uint8))
nbl = jnp.full(B, L-100, jnp.int32)
nbt = jnp.asarray(rng.integers(1, 12, (B, 256)).astype(np.int32))
val = jnp.asarray(rng.integers(0, 2048, (B, 256)).astype(np.int32))
g = jax.jit(lambda *a: jnp.sum(huf_pack_4x_batch(*a, seg, OWH)[0].astype(jnp.int32)))
_ = int(g(lits, nbl, nbt, val))
t0=time.time()
for _r in range(3): s = int(g(lits, nbl, nbt, val))
tick(f"huf_pack: {(time.time()-t0)/3*1000:.0f} ms")
