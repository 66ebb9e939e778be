import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
B, N = 8, 131072
rng = np.random.default_rng(0)
lits = jnp.asarray(rng.integers(0, 256, (B, N)).astype(np.uint8))
nbl = jnp.full(B, N-1000, jnp.int32)

def v_einsum(lit_row, nb_lit):
    j = jnp.arange(N, dtype=jnp.int32)
    seg = jnp.maximum((nb_lit + 3) // 4, 1)
    stream = jnp.clip(j // seg, 0, 3)
    lv = (j < nb_lit).astype(jnp.float32)
    so = (stream[:, None] == jnp.arange(4)[None, :]).astype(jnp.float32)
    lo = (lit_row.astype(jnp.int32)[:, None] == jnp.arange(256)[None, :]).astype(jnp.float32)
    return jnp.einsum("ns,nv->sv", so * lv[:, None], lo,
                      preferred_element_type=jnp.float32).astype(jnp.int32)

def v_scatter(lit_row, nb_lit):
    j = jnp.arange(N, dtype=jnp.int32)
    seg = jnp.maximum((nb_lit + 3) // 4, 1)
    stream = jnp.clip(j // seg, 0, 3)
    lv = (j < nb_lit).astype(jnp.int32)
    return jnp.zeros((4, 256), jnp.int32).at[stream, lit_row.astype(jnp.int32)].add(lv)

def v_onehot_sum(lit_row, nb_lit):
    # per stream: mask + one-hot compare reduced in chunks to bound memory
    j = jnp.arange(N, dtype=jnp.int32)
    seg = jnp.maximum((nb_lit + 3) // 4, 1)
    stream = jnp.clip(j // seg, 0, 3)
    lv = j < nb_lit
    li = lit_row.astype(jnp.int32)
    out = []
    for s in range(4):
        m = (stream == s) & lv
        oh = (li[:, None] == jnp.arange(256)[None, :]) & m[:, None]
        out.append(jnp.sum(oh.astype(jnp.int32), axis=0))
    return jnp.stack(out)

for name, fn in (("einsum", v_einsum), ("scatter", v_scatter), ("onehot_sum", v_onehot_sum)):
    f = jax.jit(lambda l, n, fn=fn: jnp.sum(jax.vmap(fn)(l, n)))
    _ = int(f(lits, nbl))
    t0=time.time()
    for _r in range(5): s = int(f(lits, nbl))
    tick(f"{name}: {(time.time()-t0)/5*1000:.1f} ms sum={s}")
