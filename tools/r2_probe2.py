"""Round-2 probe #2: rates of the gather-free primitive set.

Probe #1 showed TPU gathers run at ~90M elem/s (scalar-bound) and each
dispatch+fetch costs ~33 ms through the tunnel. The redesign therefore
leans on MXU one-hot matmuls, shifted-window selects, scatter-adds, and
associative scans. This probe measures each candidate primitive plus the
round-1 pack kernels, so the new encoder/decoder are sized from data.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from zstd_tpu.runtime import enable_compile_cache
enable_compile_cache()
import jax
if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
import functools

def tick(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

tick(f"init {jax.devices()} backend={jax.default_backend()}")

B, N = 8, 128 * 1024
TOT = B * N
rng = np.random.default_rng(0)


def timeit(name, fn, *args, reps=5, denom=None):
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a),
        jnp.float32(0)))
    try:
        t0 = time.time()
        _ = float(f(*args))
        tick(f"{name}: compile+run {time.time()-t0:.1f}s")
        # batch dispatches to amortize the ~33ms tunnel RTT
        t0 = time.time()
        outs = [f(*args) for _ in range(reps)]
        s = sum(float(o) for o in outs)
        dt = (time.time() - t0) / reps
        d = denom or TOT
        tick(f"{name}: {dt*1000:.2f} ms  ({d/dt/1e6:.0f} M/s)  [s={s:.3g}]")
        return dt
    except Exception as e:
        tick(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


idx512 = jnp.asarray(rng.integers(0, 512, (B, N), np.int32))
idx2k = jnp.asarray(rng.integers(0, 2048, (B, N), np.int32))
tbl512 = jnp.asarray(rng.integers(0, 1 << 15, 512, np.int32).astype(np.float32))
tbl2k = jnp.asarray(rng.integers(0, 1 << 15, 2048, np.int32).astype(np.float32))
vals = jnp.asarray(rng.integers(0, 1 << 15, (B, N), np.int32))
nextd = jnp.asarray(rng.integers(1, 12, (B, N), np.int32))

# 1. one-hot matmul LUT, table 512 and 2048
def ohlut(idx, tbl):
    T = tbl.shape[0]
    def per(ix):
        oh = (ix[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
        return oh.astype(jnp.float32) @ tbl
    return jax.vmap(per)(idx)

timeit("ohlut T=512", ohlut, idx512, tbl512)
timeit("ohlut T=2048", ohlut, idx2k, tbl2k)

# 1b. one-hot LUT in bf16
def ohlut_bf16(idx, tbl):
    T = tbl.shape[0]
    def per(ix):
        oh = (ix[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
        return (oh.astype(jnp.bfloat16) @ tbl.astype(jnp.bfloat16))
    return jax.vmap(per)(idx)

timeit("ohlut T=2048 bf16", ohlut_bf16, idx2k, tbl2k)

# 2. shifted-window select: next2[i] = next[i + d[i]] for d in [1,11]
def winsel(nextd):
    def per(nd):
        ndp = jnp.concatenate([nd, jnp.zeros(16, jnp.int32)])
        acc = jnp.zeros(N, jnp.int32)
        for d in range(1, 12):
            acc = acc + jnp.where(nd == d, jax.lax.dynamic_slice(ndp, (d,), (N,)), 0)
        return acc
    return jax.vmap(per)(nextd)

timeit("winsel w=11", winsel, nextd)

# 3. scatter-add rates
sc_idx = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
sc_idx32k = jnp.asarray(rng.integers(0, 32768, (B, N), np.int32))

def scadd_big(idx, v):
    def per(ix, vv):
        return jnp.zeros(N, jnp.int32).at[ix].add(vv, mode="drop")
    return jax.vmap(per)(idx, v)

timeit("scatter-add N->N", scadd_big, sc_idx, vals)

def scadd_small(idx, v):
    def per(ix, vv):
        return jnp.zeros(32768, jnp.int32).at[ix].add(vv, mode="drop")
    return jax.vmap(per)(idx, v)

timeit("scatter-add N->32k", scadd_small, sc_idx32k, vals)

# sorted-index scatter-add (bitpack pattern: indices are monotone)
sc_sorted = jnp.asarray(np.sort(rng.integers(0, N, (B, N), np.int32), axis=1))
timeit("scatter-add sorted N->N", scadd_big, sc_sorted, vals)

# 4. cumsum / associative scan over N
def cs(v):
    return jax.vmap(jnp.cumsum)(v)

timeit("cumsum N", cs, vals)

# 5. lax.scan step overhead: 1024 steps, tiny body on [B,512]
st0 = jnp.zeros((B, 512), jnp.int32)
def scan_tiny(x):
    def body(c, _):
        c = (c * 3 + 1) & 1023
        c = c + jnp.roll(c, 1, axis=1)
        return c, None
    out, _ = jax.lax.scan(body, x, None, length=1024)
    return out

timeit("scan 1024 steps tiny body", scan_tiny, st0, denom=1024)

# 5b. scan with one small gather per step ([B,1024] from [B,N])
gidx0 = jnp.asarray(rng.integers(0, N, (B, 1024), np.int32))
def scan_gather(v, g0):
    def body(c, _):
        g = jax.vmap(lambda a, i: a[i])(v, c)
        c = (c + g) % N
        return c, None
    out, _ = jax.lax.scan(body, g0, None, length=256)
    return out

timeit("scan 256 steps w/ [8x1k] gather", scan_gather, vals, gidx0, denom=256*8*1024)

# 6. batched small matmul chain: [S,11,11] associative matmul scan
S = TOT // 16
mats = jnp.asarray((rng.random((S, 11, 11)) < 0.09).astype(np.float32))
def matscan(m):
    return jax.lax.associative_scan(lambda a, b: jnp.einsum("sij,sjk->sik", a, b), m)

timeit("assoc matmul scan 11x11 x65k", matscan, mats, denom=S)

# 7. batched tiny matmul FSM: [S,1,27]@[S,27,27] x 16 steps
S2 = TOT // 16
fsm_t = jnp.asarray((rng.random((S2, 27, 27)) < 0.1).astype(np.float32))
fsm_s = jnp.asarray(rng.random((S2, 1, 27)).astype(np.float32))
def fsm(st, tr):
    for _ in range(16):
        st = jnp.einsum("sij,sjk->sik", st, tr)
    return st

timeit("batched FSM 16x [65k,1,27]@[27,27]", fsm, fsm_s, fsm_t)

# 8. chunked one-hot table rounds (the match-finder core):
#    32 rounds, each: [B,4096] idx -> one-hot [B,4096,T] @ [B,T,6]
T_HASH = 4096
CH = 4096
h_all = jnp.asarray(rng.integers(0, T_HASH, (B, N), np.int32))
w_all = jnp.asarray(rng.integers(0, 1 << 15, (B, N), np.int32).astype(np.float32))
def table_rounds(h, w):
    pos = jnp.arange(N, dtype=jnp.int32)
    def body(t, carry):
        tbl, out = carry   # tbl [B,T,2]: pos, content
        hs = jax.lax.dynamic_slice(h, (0, t * CH), (B, CH))
        ws = jax.lax.dynamic_slice(w, (0, t * CH), (B, CH))
        ps = jax.lax.dynamic_slice(pos, (t * CH,), (CH,)).astype(jnp.float32)
        oh = (hs[:, :, None] == jnp.arange(T_HASH, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.float32)
        cand = jnp.einsum("bct,btv->bcv", oh, tbl)
        out = jax.lax.dynamic_update_slice(out, cand, (0, t * CH, 0))
        # update: winner pos per bucket (max), then its content
        posb = oh * ps[None, :, None]            # [B,CH,T]
        win = jnp.max(posb, axis=1)              # [B,T]
        is_win = (posb == win[:, None, :]) & (oh > 0)
        cont = jnp.einsum("bct,bc->bt", is_win.astype(jnp.float32), ws)
        newt = jnp.stack([jnp.maximum(tbl[:, :, 0], win), cont], axis=-1)
        upd = jnp.any(oh > 0, axis=1)
        tbl = jnp.where(upd[:, :, None], newt, tbl)
        return tbl, out
    tbl0 = jnp.zeros((B, T_HASH, 2), jnp.float32)
    out0 = jnp.zeros((B, N, 2), jnp.float32)
    _, out = jax.lax.fori_loop(0, N // CH, body, (tbl0, out0))
    return out

timeit("table-rounds 32x4k T=4096 w=2", table_rounds, h_all, w_all)

# 9. near-window candidate: best same-hash in last 32 positions
def near32(h):
    def per(hh):
        best = jnp.full(N, -1, jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        hp = jnp.concatenate([jnp.full(32, -1, jnp.int32), hh])
        for d in range(1, 33):
            eq = hh == jax.lax.dynamic_slice(hp, (32 - d,), (N,))
            best = jnp.where((best < 0) & eq, pos - d, best)
        return best
    return jax.vmap(per)(h)

timeit("near-window 32 shifts", near32, h_all)

# 10. round-1 pack kernels at current shapes
from zstd_tpu.ops.fse_enc import fse_pack_block, STATE_TABLE_PAD, SYM_PAD
from zstd_tpu.ops.huffman_enc import huf_pack_4x_block

cap = 4096
def fse_pack_probe(llc, mlc, ofc, llx, mlb, ob, st, dn, df):
    def per(a, b, c, d, e, f):
        return fse_pack_block(a, b, c, d, e, f, jnp.int32(cap), st, dn, df,
                              jnp.asarray([9, 8, 9], jnp.int32), cap, cap + 8)[1]
    return jax.vmap(per)(llc, mlc, ofc, llx, mlb, ob)

llc = jnp.asarray(rng.integers(0, 36, (B, cap), np.int32))
mlc = jnp.asarray(rng.integers(0, 53, (B, cap), np.int32))
ofc = jnp.asarray(rng.integers(0, 20, (B, cap), np.int32))
llx = jnp.asarray(rng.integers(0, 64, (B, cap), np.int32))
mlb = jnp.asarray(rng.integers(0, 128, (B, cap), np.int32))
obx = jnp.asarray(rng.integers(4, 1 << 17, (B, cap), np.int32))
st3 = jnp.zeros((3, STATE_TABLE_PAD), jnp.int32)
dn3 = jnp.zeros((3, SYM_PAD), jnp.int32)
df3 = jnp.zeros((3, SYM_PAD), jnp.int32)
timeit("fse_pack cap=4096 (r1)", fse_pack_probe, llc, mlc, ofc, llx, mlb, obx,
       st3, dn3, df3, reps=2, denom=B*cap)

seg = (N + 3) // 4
nb_lut = jnp.asarray(rng.integers(1, 12, (B, 256), np.int32))
val_lut = jnp.asarray(rng.integers(0, 2048, (B, 256), np.int32))
lits_b = jnp.asarray(rng.integers(0, 256, (B, N), np.int32))
def huf_probe(lit, nl, vl):
    def per(l, n, v):
        return huf_pack_4x_block(l, jnp.int32(N), n, v, seg,
                                 (seg * 10) // 32 + 4, single=jnp.bool_(False))[1]
    return jax.vmap(per)(lit, nl, vl)

timeit("huf_pack_4x N=128k (r1)", huf_probe, lits_b, nb_lut, val_lut, reps=2)

tick("done")
