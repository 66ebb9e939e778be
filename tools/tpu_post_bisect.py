import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match
from zstd_tpu.ops.resolve_pallas import PAD, resolve_compact
from tests.conftest import gen_text
B, N = 8, 131072
data = gen_text(B*N, 0)
blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N))
vls = jnp.full(B, N, jnp.int32)
CAP = N//4

def base(bb, vv):
    def one(b, v):
        w32 = match.words_at(b)
        h = match.hash_positions(b, 13, 6, w32)
        return match.prev_same_bucket(h, v)
    cands = jax.vmap(one)(bb, vv)
    bp = jnp.pad(bb.astype(jnp.int32), ((0,0),(0,PAD)))
    cp = jnp.pad(cands, ((0,0),(0,PAD)), constant_values=-1)
    pos, lens, nb = resolve_compact(bp, cp, vv, CAP)
    return cands, pos, lens, nb

def post_var(which):
    def post(block, v, cands_row, pos, ln, nb):
        k = jnp.arange(CAP, dtype=jnp.int32)
        valid = k < nb
        posq = jnp.where(valid, pos, 0)
        cnd = cands_row[posq]
        out = [posq, cnd]
        if which in ("ext", "all"):
            j = jnp.arange(16, dtype=jnp.int32)
            ia = posq[:, None] - 1 - j[None, :]
            ib = jnp.maximum(cnd, 0)[:, None] - 1 - j[None, :]
            okr = (ia >= 0) & (ib >= 0) & valid[:, None]
            eq = (block[jnp.maximum(ia, 0)] == block[jnp.maximum(ib, 0)]) & okr
            ext = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
            out.append(ext)
        if which in ("ss", "all"):
            cum = jnp.cumsum(jnp.where(valid, ln, 0)) - jnp.where(valid, ln, 0)
            r = jnp.arange(N, dtype=jnp.int32)
            g = jnp.clip(jnp.searchsorted(cum, r, side="right") - 1, 0, CAP - 1)
            out.append(jnp.where(r < nb, cum[g], 0))
        return out
    return post

for which in ("none", "ext", "ss", "all"):
    p = post_var(which)
    def full(bb, vv, p=p):
        cands, pos, lens, nb = base(bb, vv)
        return jax.vmap(lambda b, v, c, po, l, m: p(b, v, c, po, l, m))(bb, vv, cands, pos, lens, nb)
    f = jax.jit(lambda b, v, full=full: jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.int32)), full(b, v), jnp.int32(0)))
    _ = int(f(blocks, vls))
    t0=time.time()
    for _r in range(3): s = int(f(blocks, vls))
    tick(f"{which}: {(time.time()-t0)/3*1000:.0f} ms")
