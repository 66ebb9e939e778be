"""Compile-bisect the v3 extract stages on the TPU: find which construct
wedges the remote compiler. Each stage compiles cumulatively at B=8."""
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
import zstd_tpu.ops.fastmatch as fm

N = 131072
B = int(os.environ.get("PROBE_B", "8"))
rng = np.random.default_rng(0)
base = rng.integers(0, 64, N // 4, dtype=np.uint8)
blocks = jnp.asarray(np.tile(base, (B, 4)))
lens = jnp.full(B, N, jnp.int32)
tick("data ready")


def run(name, fn):
    f = jax.jit(lambda b, v: jax.tree.reduce(
        lambda a, x: a + jnp.sum(x.astype(jnp.float32)), fn(b, v),
        jnp.float32(0)))
    t0 = time.time()
    try:
        s = float(f(blocks, lens))
        c = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            s = float(f(blocks, lens))
        dt = (time.time() - t0) / 3
        tick(f"{name}: {dt*1000:.1f} ms ({B*N/dt/1e6:.1f} MB/s) [c{c:.0f}s]")
    except Exception as e:
        tick(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


HL, MLS, CAP = 14, 7, N // 4

def s1(b, v):
    def per(blk, vl):
        tri, b3, tri3, b6 = fm._tri_arrays(blk)
        return fm._hash_f32(tri, tri3, b3, b6, HL, MLS)
    return jax.vmap(per)(b, v)
run("s1 tri+hash", s1)

def s2(b, v):
    def per(blk, vl):
        tri, b3, tri3, b6 = fm._tri_arrays(blk)
        h = fm._hash_f32(tri, tri3, b3, b6, HL, MLS)
        return fm._candidates(h, HL, vl)
    return jax.vmap(per)(b, v)
run("s2 +cand", s2)

def s3(b, v):
    def per(blk, vl):
        tri, b3, tri3, b6 = fm._tri_arrays(blk)
        h = fm._hash_f32(tri, tri3, b3, b6, HL, MLS)
        cand = fm._candidates(h, HL, vl)
        return fm._capped_mlen(tri, b3, cand, vl, jnp.int32(0))
    return jax.vmap(per)(b, v)
run("s3 +mlen", s3)

def s4(b, v):
    def per(blk, vl):
        tri, b3, tri3, b6 = fm._tri_arrays(blk)
        h = fm._hash_f32(tri, tri3, b3, b6, HL, MLS)
        cand = fm._candidates(h, HL, vl)
        mlen = fm._capped_mlen(tri, b3, cand, vl, jnp.int32(0))
        nxt = fm._next_matchable(mlen)
        return fm._resolve(mlen, nxt)
    return jax.vmap(per)(b, v)
run("s4 +resolve", s4)

def s5(b, v):
    def per(blk, vl):
        tri, b3, tri3, b6 = fm._tri_arrays(blk)
        h = fm._hash_f32(tri, tri3, b3, b6, HL, MLS)
        cand = fm._candidates(h, HL, vl)
        mlen = fm._capped_mlen(tri, b3, cand, vl, jnp.int32(0))
        nxt = fm._next_matchable(mlen)
        yp, yl = fm._resolve(mlen, nxt)
        return fm._compact(yp, yl, cand, CAP, N)
    return jax.vmap(per)(b, v)
run("s5 +compact", s5)

def s6(b, v):
    return fm.extract_batch_v3(b, v, HL, MLS, CAP)
run("s6 full extract", s6)

from zstd_tpu.pipeline import _analyze_jit
def s7(b, v):
    return _analyze_jit(b, v, HL, MLS, CAP, engine="v3")[0]
run("s7 analyze+stats", s7)
tick("done")
