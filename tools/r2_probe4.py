"""Round-2 probe #4 (run QUIESCED — no concurrent CPU load): B-scaling of
the primitives for the redesigned device match pipeline.

Answers, at B=8 vs B=32 (1 MB vs 4 MB per dispatch):
  - f32/complex64 gather rates (the wall that sizes everything)
  - chunked hash-table build (gather + scatter-max per 4K chunk)
  - f32 tri-byte construction + prime-mod hash (no int mul/shift)
  - lockstep resolve scan (the real body shape)
  - round-1 extract_batch total + its stages (clean baseline)
  - fse_pack / huf_pack (round-1 entropy kernels)
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
N = 131072


def timeit(name, fn, *args, reps=4, work=None, unit="Melem"):
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
        tick(f"{name}: {dt*1000:.2f} ms ({rate:.0f} {unit}/s) [c{c:.0f}s s={s:.3g}]")
        return dt
    except Exception as e:
        tick(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None


for B in (8, 32):
    tot = B * N
    tbl_f = jnp.asarray(rng.random((B, N)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N), np.int32))
    # 1. f32 gather full density
    def gat_f(t, i):
        return jax.vmap(lambda a, j: a[j])(t, i)
    timeit(f"gather f32 B={B}", gat_f, tbl_f, idx, work=tot)
    # 3. int32 gather for reference
    tbl_i = jnp.asarray(rng.integers(0, 1 << 20, (B, N), np.int32))
    timeit(f"gather i32 B={B}", gat_f, tbl_i, idx, work=tot)

# 4. f32 tri/hash construction (no int mul/shift)
for B in (8, 32):
    blocks = jnp.asarray(rng.integers(0, 256, (B, N), np.uint8))
    def tri_hash(blk):
        bf = blk.astype(jnp.float32)
        bp = jnp.pad(bf, ((0, 0), (0, 8)))
        b0 = bp[:, 0:N]; b1 = bp[:, 1:N+1]; b2 = bp[:, 2:N+2]
        b3 = bp[:, 3:N+3]; b4 = bp[:, 4:N+4]; b5 = bp[:, 5:N+5]
        tri = b0 + 256.0 * b1 + 65536.0 * b2
        tri3 = b3 + 256.0 * b4 + 65536.0 * b5
        x = tri * 7919.0 + tri3 * 104729.0
        q = jnp.floor(x / 8191.0)
        h = x - q * 8191.0
        h = jnp.clip(h, 0, 8190).astype(jnp.int32)
        return tri, b3, h
    timeit(f"tri+hash f32 B={B}", tri_hash, blocks, work=B * N)

# 5. chunked table rounds: gather cand + scatter-max, 4K chunks
T_TBL = 8192
for B in (8, 32):
    h_all = jnp.asarray(rng.integers(0, T_TBL, (B, N), np.int32))
    def cand_chunked(h, chunk=4096):
        def per(hh):
            pos = jnp.arange(N, dtype=jnp.int32)
            def body(t, carry):
                table, cand = carry
                hs = jax.lax.dynamic_slice(hh, (t * chunk,), (chunk,))
                ps = jax.lax.dynamic_slice(pos, (t * chunk,), (chunk,))
                c = table[hs]
                cand = jax.lax.dynamic_update_slice(cand, c, (t * chunk,))
                table = table.at[hs].max(ps, mode="drop")
                return table, cand
            table0 = jnp.full(T_TBL, -1, jnp.int32)
            cand0 = jnp.full(N, -1, jnp.int32)
            _, cand = jax.lax.fori_loop(0, N // chunk, body, (table0, cand0))
            return cand
        return jax.vmap(per)(h)
    timeit(f"cand chunked B={B}", cand_chunked, h_all, work=B * N)

    def cand_sort(h):
        def per(hh):
            pos = jnp.arange(N, dtype=jnp.int32)
            order = jnp.argsort(hh, stable=True).astype(jnp.int32)
            hs = hh[order]
            same = hs[1:] == hs[:-1]
            prev = jnp.where(same, order[:-1], -1)
            out = jnp.zeros(N, jnp.int32).at[order[1:]].set(prev)
            return out.at[order[0]].set(-1)
        return jax.vmap(per)(h)
    timeit(f"cand argsort B={B}", cand_sort, h_all, work=B * N)

# 6. lockstep resolve scan: realistic body (cand/mlen/nxt lookups + commit)
for B in (8, 32):
    CH, S = 512, 144
    L = N // CH
    mlen = jnp.asarray(rng.integers(0, 14, (B, N), np.int32))
    nxt = jnp.asarray(
        np.minimum(np.arange(N)[None, :] +
                   rng.integers(1, 9, (B, N)), N).astype(np.int32))
    def resolve(ml, nx):
        base = jnp.arange(L, dtype=jnp.int32) * CH
        end = base + CH
        ip0 = jnp.broadcast_to(base, (B, L))
        def ga(a, i):
            return jax.vmap(lambda r, j: r[j])(a, i)
        def step(carry, _):
            ip = carry
            ipc = jnp.minimum(ip, N - 1)
            l = jnp.minimum(ga(ml, ipc), end[None, :] - ip)
            take = (ip < end[None, :]) & (l >= 4)
            adv = jnp.where(take, jnp.maximum(l, 1), 1)
            nip = ga(nx, jnp.minimum(ip + adv, N - 1))
            ip2 = jnp.where(ip < end[None, :],
                            jnp.minimum(nip, end[None, :]), ip)
            return ip2, (jnp.where(take, ip, -1).astype(jnp.int32),
                         jnp.where(take, l, 0).astype(jnp.int32))
        _, (yp, yl) = jax.lax.scan(step, ip0, None, length=S)
        return yp, yl
    timeit(f"resolve scan S=144 B={B}", resolve, mlen, nxt,
           work=B * N, unit="Mpos")

# 7. round-1 extract_batch baseline, quiesced
from zstd_tpu.ops.seqextract import extract_batch
from tests.conftest import gen_text, gen_mixed
for B in (8,):
    data = gen_text(B * N // 2, 0) + gen_mixed(B * N - B * N // 2, 1)
    blocks = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, N))
    lens = jnp.full(B, N, jnp.int32)
    def r1(b, v):
        r = extract_batch(b, v, 13, 6, N // 4)
        return r["nb_seq"], r["nb_lit"]
    timeit(f"r1 extract_batch B={B}", r1, blocks, lens, reps=2, work=B * N)

# 8. round-1 entropy kernels, quiesced
from zstd_tpu.ops.fse_enc import fse_pack_block, STATE_TABLE_PAD, SYM_PAD
from zstd_tpu.ops.huffman_enc import huf_pack_4x_block
for B in (8, 32):
    cap = 4096
    llc = jnp.asarray(rng.integers(0, 36, (B, cap), np.int32))
    mlc = jnp.asarray(rng.integers(0, 53, (B, cap), np.int32))
    ofc = jnp.asarray(rng.integers(0, 20, (B, cap), np.int32))
    llx = jnp.asarray(rng.integers(0, 64, (B, cap), np.int32))
    mlb = jnp.asarray(rng.integers(0, 128, (B, cap), np.int32))
    obx = jnp.asarray(rng.integers(4, 1 << 17, (B, cap), np.int32))
    st3 = jnp.zeros((3, STATE_TABLE_PAD), jnp.int32)
    dn3 = jnp.zeros((3, SYM_PAD), jnp.int32)
    df3 = jnp.zeros((3, SYM_PAD), jnp.int32)
    def fse_p(a, b2, c, d, e, f):
        def per(u, v, w, x, y, z):
            return fse_pack_block(u, v, w, x, y, z, jnp.int32(cap), st3, dn3,
                                  df3, jnp.asarray([9, 8, 9], jnp.int32),
                                  cap, cap + 8)[1]
        return jax.vmap(per)(a, b2, c, d, e, f)
    timeit(f"fse_pack B={B}", fse_p, llc, mlc, ofc, llx, mlb, obx, reps=2,
           work=B * cap, unit="Mseq")

    seg = (N + 3) // 4
    nb_lut = jnp.asarray(rng.integers(1, 12, (B, 256), np.int32))
    val_lut = jnp.asarray(rng.integers(0, 2048, (B, 256), np.int32))
    lits_b = jnp.asarray(rng.integers(0, 256, (B, N), np.int32))
    def huf_p(lit, nl, vl):
        def per(l, n_, v):
            return huf_pack_4x_block(l, jnp.int32(N), n_, v, seg,
                                     (seg * 10) // 32 + 4,
                                     single=jnp.bool_(False))[1]
        return jax.vmap(per)(lit, nl, vl)
    timeit(f"huf_pack B={B}", huf_p, lits_b, nb_lut, val_lut, reps=2,
           work=B * N)

tick("done")
