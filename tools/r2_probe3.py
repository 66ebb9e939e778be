"""Round-2 probe #3: device roofline + fixed-overhead scaling.

Probes 1/2 showed every XLA pass over [8,128K] int32 costs 20-80 ms —
~100x below any v5e roofline. This probe separates:
  (a) real hardware rates: MXU matmul FLOPs, elementwise f32/int32
      bandwidth measured with K chained passes inside ONE jit,
  (b) per-dispatch + per-op fixed overheads vs batch size,
  (c) gather rate scaling with batch,
  (d) Pallas kernel dispatch cost vs the same op in XLA.
The results size the round-2 encoder (how many passes fit in the
10 ms/MB budget for 100 MB/s).
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
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=4, work=None, unit="MB"):
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a),
        jnp.float32(0)))
    try:
        t0 = time.time()
        _ = float(f(*args))
        c = time.time() - t0
        t0 = time.time()
        outs = [f(*args) for _ in range(reps)]
        s = sum(float(o) for o in outs)
        dt = (time.time() - t0) / reps
        rate = (work / dt / 1e6) if work else 0
        tick(f"{name}: {dt*1000:.2f} ms  ({rate:.0f} {unit}/s)  [compile {c:.0f}s, s={s:.3g}]")
        return dt
    except Exception as e:
        tick(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


# ---- 1. MXU: bf16 + f32 matmul ------------------------------------------
a16 = jnp.asarray(rng.random((2048, 2048)), jnp.bfloat16)
def mm_bf16(a):
    x = a
    for _ in range(8):
        x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))
timeit("matmul bf16 2048^3 x8", mm_bf16, a16, work=8 * 2 * 2048**3, unit="MFLOP")

a32 = jnp.asarray(rng.random((2048, 2048)), jnp.float32)
def mm_f32(a):
    x = a
    for _ in range(4):
        x = jnp.dot(x, a, preferred_element_type=jnp.float32)
    return jnp.sum(x)
timeit("matmul f32 2048^3 x4", mm_f32, a32, work=4 * 2 * 2048**3, unit="MFLOP")

# ---- 2. bandwidth: chained elementwise, 32MB f32 --------------------------
big_f = jnp.asarray(rng.random((64, 131072)), jnp.float32)   # 32 MB
def chain_f32(x):
    for _ in range(16):
        x = x * 1.000001 + 0.5
    return x
timeit("f32 fma x16 (32MB)", chain_f32, big_f, work=16 * 2 * big_f.size * 4)

big_i = jnp.asarray(rng.integers(0, 1 << 30, (64, 131072), np.int32))
def chain_i32_add(x):
    for _ in range(16):
        x = x + 12345
    return x
timeit("i32 add x16 (32MB)", chain_i32_add, big_i, work=16 * big_i.size * 4)

def chain_i32_mul(x):
    for _ in range(16):
        x = x * jnp.int32(-1640531527) + 1
    return x
timeit("i32 mul x16 (32MB)", chain_i32_mul, big_i, work=16 * big_i.size * 4)

def chain_u32_shift(x):
    y = x.astype(jnp.uint32)
    for _ in range(16):
        y = (y >> 5) ^ (y << 3) ^ y
    return y.astype(jnp.int32)
timeit("u32 shift/xor x16 (32MB)", chain_u32_shift, big_i,
       work=16 * big_i.size * 4)

# ---- 3. fixed overhead: one fused pass at different batch -----------------
def one_pass(x):
    return (x * jnp.int32(-1640531527) + 7) ^ (x >> 9)

for B in (8, 32, 128):
    xb = jnp.asarray(rng.integers(0, 1 << 30, (B, 131072), np.int32))
    timeit(f"1pass i32 B={B}", one_pass, xb, work=B * 131072 * 4)

# ---- 4. gather rate vs batch ---------------------------------------------
for B in (8, 64):
    tb = jnp.asarray(rng.integers(0, 1 << 20, (B, 131072), np.int32))
    ib = jnp.asarray(rng.integers(0, 131072, (B, 131072), np.int32))
    def gat(t, i):
        return jax.vmap(lambda a, j: a[j])(t, i)
    timeit(f"gather NxN B={B}", gat, tb, ib, work=B * 131072, unit="Melem")

# ---- 5. scan step cost vs batch (fse-chain shaped) ------------------------
for B in (8, 64):
    st = jnp.zeros((B, 8), jnp.int32)
    tbl = jnp.asarray(rng.integers(0, 512, (B, 512), np.int32))
    sym = jnp.asarray(rng.integers(0, 512, (B, 4096), np.int32))
    def fse_chain(s0, t, sy):
        def body(c, i):
            idx = jnp.clip(c[:, :1] + i, 0, 511)
            g = jnp.take_along_axis(t, idx, axis=1)
            c = (c + g) & 511
            return c, None
        out, _ = jax.lax.scan(body, s0, jnp.arange(4096, dtype=jnp.int32))
        return out
    timeit(f"scan4096 gather-step B={B}", fse_chain, st, tbl, sym,
           work=4096, unit="kstep")

# ---- 6. Pallas minimal elementwise --------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def pk(x_ref, o_ref):
    x = x_ref[...]
    for _ in range(16):
        x = (x * jnp.int32(-1640531527) + 7) ^ (x >> 9)
    o_ref[...] = x

def pallas_chain(x):
    return pl.pallas_call(
        pk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x8 = jnp.asarray(rng.integers(0, 1 << 30, (8, 131072), np.int32))
timeit("pallas 16pass i32 [8,128K]", pallas_chain, x8,
       work=16 * x8.size * 4)
x64 = jnp.asarray(rng.integers(0, 1 << 30, (64, 131072), np.int32))
timeit("pallas 16pass i32 [64,128K]", pallas_chain, x64,
       work=16 * x64.size * 4)

def chain16_xla(x):
    for _ in range(16):
        x = (x * jnp.int32(-1640531527) + 7) ^ (x >> 9)
    return x
timeit("xla 16pass i32 [8,128K]", chain16_xla, x8, work=16 * x8.size * 4)
timeit("xla 16pass i32 [64,128K]", chain16_xla, x64, work=16 * x64.size * 4)

# ---- 7. dispatch floor: trivial program ----------------------------------
tiny = jnp.zeros((8, 128), jnp.float32)
timeit("dispatch floor (tiny)", lambda x: x + 1, tiny, reps=8)

# ---- 8. h2d/d2h through tunnel -------------------------------------------
host_buf = np.asarray(rng.integers(0, 255, 4 * 1024 * 1024, np.uint8))
t0 = time.time()
dev = jax.device_put(host_buf)
_ = float(jnp.sum(dev.astype(jnp.float32)))
tick(f"h2d 4MB: {time.time()-t0:.2f}s")
t0 = time.time()
back = np.asarray(dev)
tick(f"d2h 4MB: {time.time()-t0:.2f}s")

tick("done")
