import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match

N = 128*1024
block = jnp.zeros(N, jnp.uint8)
vl = jnp.int32(N)

def timeit(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    tick(f"{name}: compile+run {time.time()-t0:.1f}s")

timeit("words_at", match.words_at, block)
timeit("hash", lambda b: match.hash_positions(b, 13, 6), block)
timeit("prev_same_bucket(argsort)", lambda b, v: match.prev_same_bucket(match.hash_positions(b, 13, 6), v), block, vl)
timeit("match_lengths", lambda b, v: match.match_lengths(b, match.prev_same_bucket(match.hash_positions(b, 13, 6), v), v), block, vl)
timeit("greedy_resolve", lambda b, v: match.greedy_resolve(
    match.match_lengths(b, match.prev_same_bucket(match.hash_positions(b, 13, 6), v), v), v, 17), block, vl)
from zstd_tpu.ops.seqextract import extract_block
timeit("extract_block", lambda b, v: extract_block(b, v, 13, 6, N//4), block, vl)
timeit("extract_batch B=4", lambda bb, vv: jax.vmap(lambda b, v: extract_block(b, v, 13, 6, N//4))(bb, vv),
       jnp.zeros((4, N), jnp.uint8), jnp.full(4, N, jnp.int32))
