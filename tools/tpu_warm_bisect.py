import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match
from tests.conftest import gen_text
N = 128*1024; B = 8
data = gen_text(B*N, 0)
blocks = jax.device_put(jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N)))
vls = jax.device_put(jnp.full(B, N, jnp.int32))

def warm(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args); jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    tick(f"{name}: {dt*1000:.0f} ms warm")

warm("words+hash", lambda bb: jax.vmap(lambda b: match.hash_positions(b, 13, 6))(bb), blocks)
warm("prev_bucket", lambda bb, vv: jax.vmap(lambda b, v: match.prev_same_bucket(match.hash_positions(b, 13, 6), v))(bb, vv), blocks, vls)
def _ml(b, v):
    w32 = match.words_at(b)
    h = match.hash_positions(b, 13, 6, w32)
    c = match.prev_same_bucket(h, v)
    return match.match_lengths(b, c, v, w32)
warm("match_lengths", lambda bb, vv: jax.vmap(_ml)(bb, vv), blocks, vls)
def _gr(b, v):
    ml = _ml(b, v)
    return match.greedy_resolve(ml, v, 17)
warm("greedy_resolve", lambda bb, vv: jax.vmap(_gr)(bb, vv), blocks, vls)
from zstd_tpu.ops.seqextract import extract_block
warm("extract_block full", lambda bb, vv: jax.vmap(lambda b, v: extract_block(b, v, 13, 6, N//4))(bb, vv), blocks, vls)
