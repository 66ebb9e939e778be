import sys, time
sys.path.insert(0, ".")
t00 = time.time()
def tick(m): print(f"{time.time()-t00:7.1f}s {m}", flush=True)
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
tick(f"init {jax.devices()}")
from zstd_tpu.ops import match
from zstd_tpu.ops.resolve_pallas import resolve_compact, PAD
from tests.conftest import gen_text, gen_mixed

def ref_resolve(block, vl, hash_log=13, mls=6):
    """Serial numpy reference with the kernel's commit rule."""
    full = block
    h = np.asarray(match.hash_positions(jnp.asarray(block), hash_log, mls))
    cand = np.asarray(match.prev_same_bucket(jnp.asarray(h), jnp.int32(vl)))
    pos_out, len_out = [], []
    ip = 0
    while ip < vl - 8:
        c = cand[ip]
        l = 0
        if c >= 0:
            lim = vl - ip
            while l < lim and full[ip + l] == full[c + l]:
                l += 1
        if l >= 4:
            pos_out.append(ip); len_out.append(l); ip += l
        else:
            ip += 1
    return np.array(pos_out), np.array(len_out), cand

N = 8192
for seed, gen in ((0, gen_text), (1, gen_text), (2, lambda n, s: gen_mixed(n, s, 0.5))):
    data = gen(N, seed)
    block = np.frombuffer(data, np.uint8).astype(np.int32)
    vl = N
    rp, rl, cand = ref_resolve(block, vl)
    bp = np.zeros((1, N + PAD), np.int32); bp[0, :N] = block
    cp = np.full((1, N + PAD), -1, np.int32); cp[0, :N] = cand
    pos, lens, nb = resolve_compact(jnp.asarray(bp), jnp.asarray(cp),
                                    jnp.asarray(np.array([vl], np.int32)), N // 4)
    nb = int(nb[0]); pos = np.asarray(pos[0][:nb]); lens = np.asarray(lens[0][:nb])
    ok = (nb == len(rp)) and (pos == rp).all() and (lens == rl).all()
    tick(f"seed {seed}: nb={nb} ref={len(rp)} match={ok}")
    assert ok, (pos[:10], rp[:10], lens[:10], rl[:10])
tick("ALL OK")
