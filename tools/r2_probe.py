"""Round-2 primitive cost probe on the real TPU.

Times the building blocks of the planned chunked-lockstep resolve so the
redesign is grounded in measured costs, not guesses:
  - dense gathers (c-side window compares for capped match lengths)
  - argsort-based prev_same_bucket vs chunked scatter-max table build
  - a lockstep chunked resolve prototype (scan + while variants)
  - seqstore compaction via scatter-add
  - the round-1 paths (extract_batch XLA / extract_batch_pallas) for scale

Run:  timeout 2400 python tools/r2_probe.py 2>&1 | tee /tmp/r2_probe.log
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

from tests.conftest import gen_text, gen_mixed
from zstd_tpu.ops.match import words_at, hash_positions, prev_same_bucket

B, N = int(os.environ.get("PROBE_B","8")), int(os.environ.get("PROBE_N", str(128*1024)))
HASH_LOG = 13
data = gen_text(B * N // 2, 0) + gen_mixed(B * N - B * N // 2, 1)
blocks_np = np.frombuffer(data, np.uint8).reshape(B, N)
blocks = jnp.asarray(blocks_np)
lens = jnp.full(B, N, jnp.int32)
tick("data staged")


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.int32)), fn(*a), jnp.int32(0)))
    try:
        t0 = time.time()
        _ = int(f(*args))
        tick(f"{name}: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(reps):
            s = int(f(*args))
        dt = (time.time() - t0) / reps
        mbps = B * N / dt / 1e6
        tick(f"{name}: {dt*1000:.2f} ms  ({mbps:.0f} MB/s equiv)  [sum={s}]")
        return dt
    except Exception as e:
        tick(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


# ---- shared precomputes --------------------------------------------------
def precompute(blocks):
    def per(b):
        w32 = words_at(b)
        h = hash_positions(b, HASH_LOG, 6, w32)
        return w32, h
    return jax.vmap(per)(blocks)

timeit("precompute(words+hash)", precompute, blocks)

w32_all, h_all = jax.jit(precompute)(blocks)
w32_all = jax.block_until_ready(w32_all)

# ---- candidate table: argsort vs chunked scatter-max ---------------------
def cand_sort(h):
    return jax.vmap(lambda hh: prev_same_bucket(hh, jnp.int32(N)))(h)

timeit("cand argsort", cand_sort, h_all)

def cand_chunked(h, chunk=4096):
    T = 1 << HASH_LOG
    def per(hh):
        pos = jnp.arange(N, dtype=jnp.int32)
        def body(t, carry):
            table, cand = carry
            hs = jax.lax.dynamic_slice(hh, (t * chunk,), (chunk,)).astype(jnp.int32)
            ps = jax.lax.dynamic_slice(pos, (t * chunk,), (chunk,))
            c = table[hs]
            cand = jax.lax.dynamic_update_slice(cand, c, (t * chunk,))
            table = table.at[hs].max(ps, mode="drop")
            return table, cand
        table0 = jnp.full(T, -1, jnp.int32)
        cand0 = jnp.full(N, -1, jnp.int32)
        _, cand = jax.lax.fori_loop(0, N // chunk, body, (table0, cand0))
        return cand
    return jax.vmap(per)(h)

timeit("cand chunked-4k", cand_chunked, h_all)

cands = jax.block_until_ready(jax.jit(cand_sort)(h_all))

# ---- capped match length (dense, c-side gathers only) --------------------
def mlen_cap(w32, cand, cap_words=16):
    def per(w, c0):
        has = c0 >= 0
        c = jnp.maximum(c0, 0)
        run = jnp.zeros(N, jnp.int32)
        still = has
        wp = jnp.concatenate([w, jnp.zeros(4 * cap_words, jnp.uint32)])
        for k in range(cap_words):
            wa = jax.lax.dynamic_slice(wp, (4 * k,), (N,))
            wb = w[jnp.minimum(c + 4 * k, N - 1)]
            x = wa ^ wb
            lowbit = x & (jnp.uint32(0) - x)
            ctz = 31 - jax.lax.clz(lowbit.astype(jnp.int32))
            eqb = jnp.where(x == 0, 4, ctz >> 3)
            run = run + jnp.where(still, eqb, 0)
            still = still & (x == 0)
        return jnp.where(has, run, 0)
    return jax.vmap(per)(w32, cand)

timeit("mlen cap64 (16 gathers)", mlen_cap, w32_all, cands)

def mlen_cap4(w32, cand):
    return mlen_cap(w32, cand, cap_words=1)

timeit("mlen cap4 (1 gather)", mlen_cap4, w32_all, cands)

mlen64 = jax.block_until_ready(jax.jit(lambda w, c: mlen_cap(w, c))(w32_all, cands))

# ---- nxt jump table -------------------------------------------------------
def nxt_scan(mlen):
    def per(m):
        pos = jnp.arange(N, dtype=jnp.int32)
        cand_pos = jnp.where(m >= 4, pos, jnp.int32(2 * N))
        return jax.lax.associative_scan(jnp.minimum, cand_pos, reverse=True)
    return jax.vmap(per)(mlen)

timeit("nxt reverse-min-scan", nxt_scan, mlen64)
nxt = jax.block_until_ready(jax.jit(nxt_scan)(mlen64))

# ---- lockstep resolve prototype -------------------------------------------
CHUNK = 1024
L = N // CHUNK
S = CHUNK // 4

def lockstep_scan(mlen, nxta):
    def per(m, nx):
        base = jnp.arange(L, dtype=jnp.int32) * CHUNK
        end = base + CHUNK
        ip0 = jnp.minimum(nx[base], end)
        def step(carry, _):
            ip = carry
            ipc = jnp.minimum(ip, N - 1)
            l = jnp.minimum(m[ipc], end - ip)
            take = (ip < end) & (l >= 4)
            nxt_ip = nx[jnp.minimum(ip + jnp.maximum(l, 1), N - 1)]
            ip2 = jnp.where(take, jnp.minimum(nxt_ip, end), end)
            ip2 = jnp.where(ip < end, ip2, ip)
            return ip2, (jnp.where(take, ip, -1), jnp.where(take, l, 0))
        _, (yp, yl) = jax.lax.scan(step, ip0, None, length=S)
        return yp, yl
    return jax.vmap(per)(mlen, nxta)

timeit("lockstep scan S=256", lockstep_scan, mlen64, nxt)

def lockstep_while(mlen, nxta):
    # batched over B inside one program; early exit when all lanes done
    base = jnp.arange(L, dtype=jnp.int32) * CHUNK
    end = base + CHUNK
    ip0 = jnp.minimum(nxt_gather(nxta, jnp.broadcast_to(base, (B, L))), end)
    yp0 = jnp.full((B, L, S), -1, jnp.int32)
    yl0 = jnp.zeros((B, L, S), jnp.int32)
    def cond(st):
        ip, t, yp, yl = st
        return (t < S) & jnp.any(ip < end)
    def body(st):
        ip, t, yp, yl = st
        ipc = jnp.minimum(ip, N - 1)
        l = jnp.minimum(take_gather(mlen, ipc), end - ip)
        take = (ip < end) & (l >= 4)
        nxt_ip = take_gather(nxta, jnp.minimum(ip + jnp.maximum(l, 1), N - 1))
        ip2 = jnp.where(take, jnp.minimum(nxt_ip, end), end)
        ip2 = jnp.where(ip < end, ip2, ip)
        yp = jax.lax.dynamic_update_index_in_dim(
            yp, jnp.where(take, ip, -1), t, axis=2) if False else \
            yp.at[:, :, t].set(jnp.where(take, ip, -1), mode="drop")
        yl = yl.at[:, :, t].set(jnp.where(take, l, 0), mode="drop")
        return ip2, t + 1, yp, yl
    ip, t, yp, yl = jax.lax.while_loop(cond, body, (ip0, jnp.int32(0), yp0, yl0))
    return yp, yl, t

def take_gather(arr, idx):
    return jax.vmap(lambda a, i: a[i])(arr, idx)

def nxt_gather(arr, idx):
    return jax.vmap(lambda a, i: a[i])(arr, idx)

timeit("lockstep while early-exit", lockstep_while, mlen64, nxt)

# ---- compaction -----------------------------------------------------------
SEQ_CAP = N // 4

def compact(yp, yl):
    def per(p, l):
        p = p.reshape(-1)  # [L*S] position order
        l = l.reshape(-1)
        valid = l > 0
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        idx = jnp.where(valid, rank, SEQ_CAP)
        op = jnp.zeros(SEQ_CAP + 1, jnp.int32).at[idx].add(p, mode="drop")
        ol = jnp.zeros(SEQ_CAP + 1, jnp.int32).at[idx].add(l, mode="drop")
        return op[:SEQ_CAP], ol[:SEQ_CAP], jnp.sum(valid.astype(jnp.int32))
    return jax.vmap(per)(yp, yl)

yp_, yl_ = jax.jit(lockstep_scan)(mlen64, nxt)
yp_ = jax.block_until_ready(yp_)
timeit("compaction scatter-add 32k", compact, yp_, yl_)

# ---- literal gather build -------------------------------------------------
def lit_gather(yp, yl, blocks):
    def per(p, l, blk):
        cov = jnp.zeros(N + 1, jnp.int32)
        lc = l.reshape(-1)
        pc = jnp.where(lc > 0, p.reshape(-1), N)
        cov = cov.at[pc].add(jnp.where(lc > 0, 1, 0), mode="drop")
        cov = cov.at[jnp.minimum(pc + lc, N)].add(jnp.where(lc > 0, -1, 0), mode="drop")
        covered = jnp.cumsum(cov[:N]) > 0
        is_lit = ~covered
        lr = jnp.cumsum(is_lit.astype(jnp.int32)) - 1
        pos = jnp.arange(N, jnp.int32)
        li = jnp.zeros(N, jnp.int32).at[jnp.where(is_lit, lr, N - 1)].max(pos, mode="drop")
        return blk[li], jnp.sum(is_lit.astype(jnp.int32))
    return jax.vmap(per)(yp, yl, blocks)

timeit("literal mask+gather", lit_gather, yp_, yl_, blocks)

# ---- round-1 paths for scale ---------------------------------------------
from zstd_tpu.ops.seqextract import extract_batch, extract_batch_pallas

def r1_xla(b, v):
    r = extract_batch(b, v, HASH_LOG, 6, SEQ_CAP)
    return r["nb_seq"], r["nb_lit"]

timeit("round1 extract_batch XLA", r1_xla, blocks, lens, reps=1)

def r1_pallas(b, v):
    r = extract_batch_pallas(b, v, HASH_LOG, 6, SEQ_CAP)
    return r["nb_seq"], r["nb_lit"]

timeit("round1 extract_batch_pallas", r1_pallas, blocks, lens, reps=1)

tick("done")
