"""Stage-level wall profile of TpuCompressor on the chip (QUIESCED).

Separates: h2d staging, analyze dispatch+sync, stats d2h, planB host work,
pack dispatch+sync, outbuf d2h, finalize host work — the data that decides
where bench time actually goes.
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

tick(f"init {jax.devices()}")
from zstd_tpu import pipeline
from zstd_tpu.params import get_cparams

B = int(os.environ.get("PROF_B", "16"))
N = 131072
rng = np.random.default_rng(42)
words = [b"the", b"of", b"and", b"compression", b"entropy", b"state",
         b"block", b"sequence", b"window", b"offset", b"literal"]
text = bytearray()
while len(text) < B * N:
    text += words[rng.integers(len(words))] + b" "
data = bytes(text[: B * N])
arr = np.frombuffer(data, np.uint8).reshape(B, N)
lens = np.full(B, N, np.int32)
cparams = get_cparams(1, B * N)
tick(f"data ready B={B}")


def sync(x):
    return float(jnp.sum(jnp.asarray(x[0] if isinstance(x, tuple) else x)
                         .astype(jnp.float32)[:1, :1]))


comp = pipeline.TpuCompressor(level=1, checksum=False, batch_blocks=B)

# warm all compiles via one full compress
t0 = time.time()
blob = comp.compress(data)
tick(f"warm compress: {time.time()-t0:.1f}s -> {len(blob)}")

for rep in range(2):
    t0 = time.time()
    bd = jnp.asarray(arr)
    ld = jnp.asarray(lens)
    _ = sync(bd)
    t1 = time.time()
    stats, resident = pipeline._analyze_jit(
        bd, ld, cparams.hash_log, 7, N // 8, engine="v3")
    _ = sync(stats)
    t2 = time.time()
    stats_h = np.asarray(stats)
    t3 = time.time()
    stageA = {0: (lens, stats, resident)}
    stageB = {}
    comp._planB(0, stageA, stageB, N, cparams)
    plans, outbuf, sizes, raw_lits, ow_fse, ow_huf, any_raw = stageB[0]
    _ = sync(outbuf)
    t4 = time.time()
    out_h = np.asarray(outbuf)
    sizes_h = np.asarray(sizes)
    t5 = time.time()
    payloads = comp._finalize(0, {0: None},
                              {0: (plans, outbuf, sizes, raw_lits, ow_fse,
                                   ow_huf, any_raw)},
                              arr.reshape(-1), [(0, B)], N, cparams)
    t6 = time.time()
    tick(f"rep{rep}: h2d={t1-t0:.3f} analyze={t2-t1:.3f} statsd2h={t3-t2:.3f} "
         f"planB+pack={t4-t3:.3f} outd2h={t5-t4:.3f} finalize={t6-t5:.3f} "
         f"total={t6-t0:.3f}  outbuf={out_h.nbytes>>20}MiB")
tick("done")
