import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
tick(f"init {jax.devices()}")

def kern(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2 + 1

@jax.jit
def f(x):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.arange(1024, dtype=jnp.int32).reshape(8, 128)
y = f(x)
print("pallas ok:", np.asarray(y)[0, :3], flush=True)
tick("done")

# serial scalar loop kernel prototype: greedy commit scan
N = 1024
def resolve_kern(len_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def cond(state):
        return state < N
    def body(ip):
        l = len_ref[0, ip]
        take = l >= 4
        @pl.when(take)
        def _():
            out_ref[0, ip] = 1
        return ip + jnp.where(take, l, 1)
    jax.lax.while_loop(cond, body, jnp.int32(0))

@jax.jit
def resolve(lens):
    return pl.pallas_call(
        resolve_kern,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(lens)

lens = np.zeros((1, N), np.int32)
lens[0, 10] = 8; lens[0, 12] = 100; lens[0, 20] = 5
out = np.asarray(resolve(jnp.asarray(lens)))
print("resolve committed at:", np.nonzero(out[0])[0], flush=True)
tick("resolve kernel ok")
