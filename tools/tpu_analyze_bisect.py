import sys, time
sys.path.insert(0, ".")
def tick(m): print(m, flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match
from zstd_tpu.ops.seqextract import _post_resolve
from zstd_tpu.ops.resolve_pallas import PAD, resolve_compact
from zstd_tpu.ops.codes import seq_codes_block
from tests.conftest import gen_text
B, N = 8, 131072
data = gen_text(B*N, 0)
blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N))
vls = jnp.full(B, N, jnp.int32)
CAP = N//4

def propose(bb, vv):
    def one(b, v):
        w32 = match.words_at(b)
        h = match.hash_positions(b, 13, 6, w32)
        return match.prev_same_bucket(h, v)
    return jax.vmap(one)(bb, vv)

def upto_resolve(bb, vv):
    cands = propose(bb, vv)
    bp = jnp.pad(bb.astype(jnp.int32), ((0,0),(0,PAD)))
    cp = jnp.pad(cands, ((0,0),(0,PAD)), constant_values=-1)
    return resolve_compact(bp, cp, vv, CAP), cands

def upto_post(bb, vv):
    (pos, lens, nb), cands = upto_resolve(bb, vv)
    return jax.vmap(lambda b, v, c, p, l, m: _post_resolve(b, v, c, p, l, m, CAP))(bb, vv, cands, pos, lens, nb)

def upto_lits(bb, vv):
    res = upto_post(bb, vv)
    lits = jnp.take_along_axis(bb, res["lit_idx"], axis=1)
    return res, lits

def upto_codes(bb, vv):
    res, lits = upto_lits(bb, vv)
    codes = jax.vmap(lambda l, o, m, n: seq_codes_block(l, o, m, n))(res["ll"], res["off"], res["ml"], res["nb_seq"])
    return res, lits, codes

for name, fn in (("propose", propose), ("`+resolve", lambda b,v: upto_resolve(b,v)[0]),
                 ("+post", upto_post), ("+lits", upto_lits), ("+codes", upto_codes)):
    f = jax.jit(lambda b, v, fn=fn: jax.tree.reduce(lambda a, x: a + jnp.sum(x.astype(jnp.int32)), fn(b, v), jnp.int32(0)))
    _ = int(f(blocks, vls))
    t0=time.time()
    for _r in range(3): s = int(f(blocks, vls))
    tick(f"{name}: {(time.time()-t0)/3*1000:.0f} ms")
