"""Device match pipeline v3 — the measured-fast redesign (round 2).

Replaces the round-1 propose/pointer-double/serial-Pallas stack
(ops/match.py greedy_resolve, ops/resolve_pallas.py) for the TPU encode
path. Same role as ZSTD_compressBlock_fast's hot loop
(/root/reference/lib/compress/zstd_fast.c:192), shaped by probe data from
tools/r2_probe*.py on the real chip:

  - int32 multiplies/shifts run ~30x slower than f32 math on this backend,
    so bytes are combined into exact-in-f32 "tri" words (3 bytes) and the
    bucket hash is a prime-mod linear form in f32;
  - gathers amortize to ~230 M elem/s at B=32: the design spends exactly
    5 full-density gather passes (candidate probe + content checks for a
    13-byte capped match length) plus 1 scatter-max (table build);
  - lax.scan steps cost ~microseconds at [B, lanes] width: the greedy
    commit runs as a lockstep scan over 512-byte chunks (2 gathers/step),
    then chain-merge + compaction recover long matches.

Intentional approximations vs the serial reference (ratio, not correctness):
candidates blind to same-bucket predecessors inside the current table
chunk (bounded by chunk size), match lengths quantized to {4,7,10,13}
before chain-merging, matches truncated at 512-byte chunk boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
_ECON_FILTER = _os.environ.get("ZSTD_TPU_NOECON", "") == ""
MIN_EMIT = 4
CAP_MLEN = 19
# contiguous 3-byte verify passes in _capped_mlen: (4, 7, 10, 13, 16) gives
# {4..19} quantization; the shorter default trades cap for 3 fewer gathers
MLEN_PASSES = tuple(
    int(x) for x in _os.environ.get("ZSTD_TPU_MLEN_PASSES",
                                    "4,7,10").split(","))
RESOLVE_CHUNK = 512
RESOLVE_STEPS = 160
TABLE_CHUNK = 2048


def _tri_arrays(block: jax.Array):
    """f32 views: tri[i] = b[i] + 256 b[i+1] + 65536 b[i+2] (exact < 2^24),
    b3[i] = b[i+3]. Built from static shifted slices — no gathers."""
    n = block.shape[0]
    bf = block.astype(jnp.float32)
    bp = jnp.concatenate([bf, jnp.zeros(16, jnp.float32)])
    tri = bp[0:n] + 256.0 * bp[1:n + 1] + 65536.0 * bp[2:n + 2]
    b3 = bp[3:n + 3]
    tri3 = bp[3:n + 3] + 256.0 * bp[4:n + 4] + 65536.0 * bp[5:n + 5]
    b6 = bp[6:n + 6]
    return tri, b3, tri3, b6


def _hash_f32(tri: jax.Array, tri3: jax.Array, b3: jax.Array,
              b6: jax.Array, hash_log: int, mls: int) -> jax.Array:
    """Bucket ids in [0, prime): two-level prime-mod linear form, f32 only.

    Every product stays below 2^24 so the arithmetic is EXACT in f32 (a
    lossy hash here floods the pipeline with fake 4-byte candidates).
    mls <= 4 hashes bytes 0-3, mls 5 adds byte 4, mls >= 6 bytes 4-5."""
    prime = {11: 2039, 12: 4093, 13: 8191, 14: 16381, 15: 32749,
             16: 65521, 17: 131071}.get(hash_log, (1 << hash_log) - 5)

    def mod_p(x):
        q = jnp.floor(x / prime)
        return x - q * prime

    t_lo = tri - jnp.floor(tri / 4096.0) * 4096.0       # 12 bits
    t_hi = jnp.floor(tri / 4096.0)                       # 12 bits
    # first level: products < 2^12 * 1024 = 2^22, sums < 2^24 -> exact
    x = mod_p(t_lo * 739.0 + t_hi * 523.0)
    x = mod_p(x * 31.0 + b3 * 173.0)                    # x < p*31 + 2^16
    if mls >= 5:
        b4 = jnp.floor(tri3 / 256.0) - jnp.floor(tri3 / 65536.0) * 256.0
        x = mod_p(x * 17.0 + b4 * 101.0)
    if mls >= 6:
        b5 = jnp.floor(tri3 / 65536.0)
        x = mod_p(x * 13.0 + b5 * 61.0)
    if mls >= 7:
        x = mod_p(x * 11.0 + b6 * 43.0)
    return jnp.clip(x, 0, prime - 1).astype(jnp.int32)


def _candidates(h: jax.Array, hash_log: int, valid_len) -> jax.Array:
    """prev same-bucket position for every position, exactly, via one
    stable sort (probe data: same cost as the chunked-table variant at
    B=32, with no intra-chunk blind spot). The dense equivalent of a
    fully-updated hash table."""
    n = h.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    hv = jnp.where(pos < valid_len, h, jnp.int32(1 << 30))
    order = jnp.argsort(hv, stable=True).astype(jnp.int32)
    h_sorted = hv[order]
    same = h_sorted[1:] == h_sorted[:-1]
    prev_sorted = jnp.where(same, order[:-1], -1)
    cand = jnp.zeros(n, dtype=jnp.int32).at[order[1:]].set(prev_sorted)
    cand = cand.at[order[0]].set(-1)
    return jnp.where(pos < valid_len, cand, -1)


def _candidates_row(h: jax.Array, hash_log: int, valid_len,
                    width: int) -> jax.Array:
    """Row of the `width` previous same-bucket positions for EVERY
    position — the TPU-native tag-row (ZSTD_RowFindBestMatch's row of
    tagged slots, zstd_lazy.c:986). One stable sort groups each hash
    bucket contiguously with positions ascending, so the k-th previous
    same-bucket candidate is just the sorted array shifted by k: the
    whole row costs one sort + `width` vector compares, no pointer
    chasing. Returns [n, width] candidate positions (-1 = none)."""
    n = h.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    hv = jnp.where(pos < valid_len, h, jnp.int32(1 << 30))
    order = jnp.argsort(hv, stable=True).astype(jnp.int32)
    h_sorted = hv[order]
    cols = []
    for k in range(1, width + 1):
        same = h_sorted[k:] == h_sorted[:-k]
        prevk = jnp.where(same, order[:-k], -1)
        ck = jnp.full(n, -1, jnp.int32).at[order[k:]].set(prevk)
        cols.append(ck)
    cand = jnp.stack(cols, axis=1)
    return jnp.where(pos[:, None] < valid_len, cand, -1)


def _capped_mlen(tri, b3, cand, valid_len, emit_from):
    """int32[n] in {0, 4, 7, 10, ..., 25}: quantized match length vs cand,
    9 gather passes; i-side reads are static shifted views. 25 covers the
    bulk of real matches inline (text averages ~12), so chain-merging is
    only needed for genuinely long matches."""
    n = tri.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    has = cand >= 0
    c = jnp.maximum(cand, 0)

    def sh(a, k):
        return jnp.concatenate([a[k:], jnp.zeros(k, a.dtype)]) if k else a

    tri_c = tri[c]
    b3_c = b3[c]
    run = jnp.where(has & (tri_c == tri) & (b3_c == b3), 4, 0) \
        .astype(jnp.int32)
    still = run > 0
    # each in-loop pass is one full-density gather (~8 ms/MB on the
    # measured chip); MLEN_PASSES trades quantization granularity for
    # gather count — the post-merge exact extension recovers the tail
    for k in MLEN_PASSES:
        eq = tri[jnp.minimum(c + k, n - 1)] == \
            jnp.concatenate([tri[k:], jnp.zeros(k, jnp.float32)])
        still = still & eq
        run = run + jnp.where(still, jnp.int32(3), 0)
    mlen = run
    # economics: a short match at a far offset costs more bits than its
    # literals (the reference's level-1 7-byte hash implicitly enforces
    # this); require length to grow with offset magnitude
    dist = pos - c
    weak = ((mlen < 6) & (dist > 1024)) | ((mlen < 5) & (dist > 64))
    if _ECON_FILTER:
        mlen = jnp.where(weak, 0, mlen)
    # tail margin: never start a match in the last 16 bytes; clamp to end
    mlen = jnp.where(pos < valid_len - 16, mlen, 0)
    mlen = jnp.minimum(mlen, jnp.maximum(valid_len - pos, 0))
    mlen = jnp.where(pos >= emit_from, mlen, 0)
    return mlen


def _next_matchable(mlen: jax.Array) -> jax.Array:
    n = mlen.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    cand_pos = jnp.where(mlen >= MIN_EMIT, pos, jnp.int32(2 * n))
    return jax.lax.associative_scan(jnp.minimum, cand_pos, reverse=True)


def _resolve(mlen: jax.Array, nxt: jax.Array):
    """Lockstep greedy commit over RESOLVE_CHUNK-byte chunks.
    Returns (yp, yl) int32[L*S] in position order (-1 / 0 for empty)."""
    n = mlen.shape[0]
    L = n // RESOLVE_CHUNK
    base = jnp.arange(L, dtype=jnp.int32) * RESOLVE_CHUNK
    end = base + RESOLVE_CHUNK
    ip0 = jnp.minimum(nxt[jnp.minimum(base, n - 1)], end)

    def step(ip, _):
        ipc = jnp.minimum(ip, n - 1)
        l = jnp.minimum(mlen[ipc], end - ip)
        take = (ip < end) & (l >= MIN_EMIT)
        adv = jnp.where(take, l, 1)
        nip = nxt[jnp.minimum(ip + adv, n - 1)]
        ip2 = jnp.where(ip < end, jnp.minimum(nip, end), ip)
        return ip2, (jnp.where(take, ip, -1), jnp.where(take, l, 0))

    _, (yp, yl) = jax.lax.scan(step, ip0, None, length=RESOLVE_STEPS)
    # [S, L] -> lane-major position order [L*S]
    return yp.T.reshape(-1), yl.T.reshape(-1)


def _compact(yp, yl, cand, seq_cap, n):
    """Pre-merge contiguous same-distance commits directly on the lane
    array (last-valid scans give each commit its predecessor), then compact
    group leaders into a [seq_cap] prefix. Merging before compaction keeps
    the loop passes downstream at true sequence density.

    Returns (pos, len, dist, nb)."""
    valid = yl > 0
    dist = jnp.where(valid, yp - cand[jnp.maximum(yp, 0)], 0)
    end = jnp.where(valid, yp + yl, 0)

    # last-valid carry: for each slot, the most recent valid (end, dist)
    # strictly before it
    def lv_op(a, b):
        av, ae, ad = a
        bv, be, bd = b
        return (av | bv, jnp.where(bv, be, ae), jnp.where(bv, bd, ad))

    v_i = valid
    inc = jax.lax.associative_scan(lv_op, (v_i, end, dist))
    # shift right by one slot to get the strict predecessor
    pv = jnp.concatenate([jnp.zeros(1, jnp.bool_), inc[0][:-1]])
    pe = jnp.concatenate([jnp.zeros(1, jnp.int32), inc[1][:-1]])
    pd = jnp.concatenate([jnp.zeros(1, jnp.int32), inc[2][:-1]])

    mergeable = valid & pv & (yp == pe) & (dist == pd)
    is_start = valid & ~mergeable
    group = jax.lax.associative_scan(jnp.add, is_start.astype(jnp.int32)) - 1
    cap = seq_cap
    gidx = jnp.where(valid & (group < cap) & (group >= 0), group, cap)
    glen = jnp.zeros(cap + 1, jnp.int32).at[gidx].add(yl, mode="drop")[:cap]
    gpos = jnp.full(cap + 1, n, jnp.int32).at[gidx].min(yp,
                                                        mode="drop")[:cap]
    gdist = jnp.zeros(cap + 1, jnp.int32).at[gidx].max(dist,
                                                       mode="drop")[:cap]
    nb = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), cap)
    return gpos, glen, gdist, nb


def _rep_rewrite(tri, pos_c, len_c, dist_c, nb, n):
    """Device repcode recovery: when sequence k also fully matches at the
    PREVIOUS sequence's distance, rewrite its distance. Contiguous chains
    then merge into single long matches, and non-contiguous rewrites code
    as rep1 (ops/codes.py stateless rule) — the role of the repcode probe
    in zstd_fast.c:192's hot loop."""
    cap = pos_c.shape[0]
    k = jnp.arange(cap, dtype=jnp.int32)
    vmask = k < nb
    d_prev = jnp.roll(dist_c, 1)
    candidate = vmask & (k > 0) & (d_prev > 0) & (dist_c != d_prev) \
        & (pos_c - d_prev >= 0)

    # verify 3-byte windows until past len (conservative: checks up to
    # 2 bytes beyond the match end); early exit when no lane needs more
    REP_VERIFY_CAP = 30

    def cond(state):
        still, j = state
        return jnp.any(candidate & still & (j < len_c)) & (j < 18)

    def step(state):
        still, j = state
        ia = jnp.minimum(pos_c + j, n - 1)
        ib = jnp.maximum(jnp.minimum(pos_c - d_prev + j, n - 1), 0)
        eq = tri[ia] == tri[ib]
        still = still & (eq | (j >= len_c))
        return still, j + 3

    still, _ = jax.lax.while_loop(cond, step, (candidate, jnp.int32(0)))
    # a sequence longer than the verification cap is never rewritten
    ok = candidate & still & (len_c <= 18)
    return jnp.where(ok, d_prev, dist_c)


def _merge_chains(pos_c, len_c, dist_c, nb, seq_cap, n):
    """Merge contiguous same-distance sequences into single matches."""
    cap = seq_cap
    k = jnp.arange(cap, dtype=jnp.int32)
    prev_end = jnp.roll(pos_c + len_c, 1)
    prev_dist = jnp.roll(dist_c, 1)
    vmask = k < nb
    mergeable = vmask & (k > 0) & (pos_c == prev_end) & (dist_c == prev_dist)
    group = jax.lax.associative_scan(
        jnp.add, (~mergeable).astype(jnp.int32)) - 1
    gidx = jnp.where(vmask, jnp.minimum(group, cap - 1), cap)
    glen = jnp.zeros(cap + 1, jnp.int32).at[gidx].add(len_c,
                                                      mode="drop")[:cap]
    gpos = jnp.full(cap + 1, n, jnp.int32).at[gidx].min(pos_c,
                                                        mode="drop")[:cap]
    gdist = jnp.zeros(cap + 1, jnp.int32).at[gidx].max(dist_c,
                                                       mode="drop")[:cap]
    gnb = jnp.minimum(jnp.sum((~mergeable & vmask).astype(jnp.int32)), cap)
    return gpos, glen, gdist, gnb


def extract_block_v3(block: jax.Array, valid_len, hash_log: int, mls: int,
                     seq_cap: int, emit_from=0, halo_ok=True):
    """extract_block contract (ops/seqextract.py) via the v3 pipeline."""
    n = block.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    emit_from = jnp.asarray(emit_from, jnp.int32)
    halo_ok = jnp.asarray(halo_ok, jnp.bool_)

    tri, b3, tri3, b6 = _tri_arrays(block)
    h = _hash_f32(tri, tri3, b3, b6, hash_log, mls)
    cand = _candidates(h, hash_log, valid_len)
    cand = jnp.where(halo_ok | (cand >= emit_from), cand, -1)
    mlen = _capped_mlen(tri, b3, cand, valid_len, emit_from)
    nxt = _next_matchable(mlen)
    yp, yl = _resolve(mlen, nxt)
    c_pos, c_len, c_dist, c_nb = _compact(yp, yl, cand, seq_cap, n)
    c_dist = _rep_rewrite(tri, c_pos, c_len, c_dist, c_nb, n)
    seq_pos, seq_len, seq_off, nb_seq = _merge_chains(
        c_pos, c_len, c_dist, c_nb, seq_cap, n)
    return _finish_sequences(block, tri, seq_pos, seq_len, seq_off, nb_seq,
                             valid_len, emit_from, seq_cap, n)


def _finish_sequences(block, tri, seq_pos, seq_len, seq_off, nb_seq,
                      valid_len, emit_from, seq_cap, n):
    """Shared epilogue: exact forward/backward extension of merged matches
    plus literal-index derivation (v3 and lazy engines)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    k = jnp.arange(seq_cap, dtype=jnp.int32)
    vmask = k < nb_seq
    next_start = jnp.where(k + 1 < nb_seq, jnp.roll(seq_pos, -1),
                           jnp.minimum(valid_len, n))
    room = jnp.maximum(next_start - (seq_pos + seq_len), 0)
    room = jnp.where(vmask, room, 0)
    bf = block.astype(jnp.int32)

    tri_i = tri  # f32 3-byte windows for fast extension

    def ext3_body(state):
        ln, active, r, _ = state
        ia = jnp.minimum(seq_pos + ln, n - 1)
        ib = jnp.maximum(jnp.minimum(seq_pos - seq_off + ln, n - 1), 0)
        eq = (tri_i[ia] == tri_i[ib]) & active \
            & (ln + 3 <= seq_len + room)
        ln = ln + jnp.where(eq, 3, 0)
        return ln, eq, r + 1, jnp.any(eq) & (r < 6)

    seq_len3, _, _, _ = jax.lax.while_loop(
        lambda s: s[3], ext3_body,
        (seq_len, vmask & (room > 0), jnp.int32(0),
         jnp.any(vmask & (room > 0))))

    def ext1_body(state):
        ln, active, r, _ = state
        ia = jnp.minimum(seq_pos + ln, n - 1)
        ib = jnp.maximum(jnp.minimum(seq_pos - seq_off + ln, n - 1), 0)
        eq = (bf[ia] == bf[ib]) & active & (ln < seq_len + room)
        ln = ln + eq.astype(jnp.int32)
        return ln, eq, r + 1, jnp.any(eq) & (r < 1)

    seq_len2, _, _, _ = jax.lax.while_loop(
        lambda s: s[3], ext1_body,
        (seq_len3, vmask & (room > 0), jnp.int32(0),
         jnp.any(vmask & (room > 0))))
    seq_len = jnp.where(vmask, seq_len2, 0)

    # sparse backward extension: grow starts downward while bytes match and
    # the previous sequence's end is not crossed (offsets unchanged);
    # 3-byte strides first, then a bounded byte-wise tail
    def back3_body(state):
        sp, sl, active, r, _ = state
        prev_end = jnp.where(k == 0, emit_from, jnp.roll(sp + sl, 1))
        ia = jnp.maximum(sp - 3, 0)
        ib = jnp.maximum(sp - seq_off - 3, 0)
        ok = active & (sp - 3 >= prev_end) & (sp - seq_off - 3 >= 0) \
            & (tri[ia] == tri[ib])
        sp = sp - jnp.where(ok, 3, 0)
        sl = sl + jnp.where(ok, 3, 0)
        return sp, sl, ok, r + 1, jnp.any(ok) & (r < 4)

    seq_pos, seq_len, _, _, _ = jax.lax.while_loop(
        lambda s: s[4], back3_body,
        (seq_pos, seq_len, vmask, jnp.int32(0), jnp.any(vmask)))

    def back1_body(state):
        sp, sl, active, r, _ = state
        prev_end = jnp.where(k == 0, emit_from, jnp.roll(sp + sl, 1))
        ia = jnp.maximum(sp - 1, 0)
        ib = jnp.maximum(sp - seq_off - 1, 0)
        ok = active & (sp > prev_end) & (sp - seq_off > 0) \
            & (bf[ia] == bf[ib])
        sp = sp - ok.astype(jnp.int32)
        sl = sl + ok.astype(jnp.int32)
        return sp, sl, ok, r + 1, jnp.any(ok) & (r < 1)

    seq_pos, seq_len, _, _, _ = jax.lax.while_loop(
        lambda s: s[4], back1_body,
        (seq_pos, seq_len, vmask, jnp.int32(0), jnp.any(vmask)))
    seq_len = jnp.where(vmask, seq_len, 0)

    # literal-length derivation + coverage
    prev_match_end = jnp.where(
        k == 0, emit_from, jnp.roll(seq_pos + seq_len, 1))
    prev_match_end = jnp.where(k < nb_seq, prev_match_end, 0)
    ll = jnp.where(vmask, seq_pos - prev_match_end, 0)
    ml = jnp.where(vmask, seq_len, 0)
    off = jnp.where(vmask, seq_off, 0)

    covered_delta = jnp.zeros(n + 1, jnp.int32)
    covered_delta = covered_delta.at[
        jnp.where(vmask, seq_pos, n)].add(1, mode="drop")
    covered_delta = covered_delta.at[
        jnp.where(vmask, seq_pos + seq_len, n)].add(-1, mode="drop")
    covered = jax.lax.associative_scan(jnp.add, covered_delta[:n]) > 0
    is_lit = (~covered) & (pos >= emit_from) & (pos < valid_len)
    nb_lit = jnp.sum(is_lit.astype(jnp.int32))
    lit_rank = jax.lax.associative_scan(jnp.add,
                                        is_lit.astype(jnp.int32)) - 1
    lit_idx = jnp.full(n, n - 1, dtype=jnp.int32)
    lit_idx = lit_idx.at[jnp.where(is_lit, lit_rank, n)].set(pos,
                                                             mode="drop")
    return {
        "nb_seq": nb_seq,
        "ll": ll,
        "off": off,
        "ml": ml,
        "lit_idx": lit_idx,
        "nb_lit": nb_lit,
        "overflow": nb_seq >= seq_cap,
    }


def _capped_mlen_at(tri, b3, cand, valid_len, emit_from, passes):
    """Quantized match length vs an arbitrary candidate array (no economics
    filter — the lazy selector compares candidates on raw length)."""
    n = tri.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    has = cand >= 0
    c = jnp.maximum(cand, 0)
    run = jnp.where(has & (tri[c] == tri) & (b3[c] == b3), 4, 0) \
        .astype(jnp.int32)
    still = run > 0
    for k in passes:
        eq = tri[jnp.minimum(c + k, n - 1)] == \
            jnp.concatenate([tri[k:], jnp.zeros(k, jnp.float32)])
        still = still & eq
        run = run + jnp.where(still, jnp.int32(3), 0)
    mlen = run
    mlen = jnp.where(pos < valid_len - 16, mlen, 0)
    mlen = jnp.minimum(mlen, jnp.maximum(valid_len - pos, 0))
    mlen = jnp.where(pos >= emit_from, mlen, 0)
    return mlen


# lazy engine: deeper quantization ladder (cap 28) — long matches resolve
# inline instead of through chain-merging
LAZY_PASSES = (4, 7, 10, 13, 16, 19)


def extract_block_lazy(block: jax.Array, valid_len, hash_log: int, mls: int,
                       seq_cap: int, depth: int = 3, emit_from=0,
                       halo_ok=True):
    """Device engine for the lazy strategy band (levels 5-12).

    Role of the reference's row-based lazy matcher
    (/root/reference/lib/compress/zstd_lazy.c:784-1087 — SIMD tag rows,
    1-2 position lookahead): where that code compares a row of hash tags
    per position with one SSE2/NEON op, this walks `depth` links of the
    exact sort-derived candidate chain (ops/fastmatch._candidates), scoring
    every (position, candidate) pair in parallel on the VPU — candidate
    depth replaces the row, and lookahead becomes an elementwise deferral:
    a position whose successor has a strictly longer match contributes no
    commit, so the greedy lockstep resolve naturally takes the later,
    longer match (ZSTD_compressBlock_lazy_generic's `if (ml2 > matchLength)
    continue` rephrased data-parallel).
    """
    n = block.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    emit_from = jnp.asarray(emit_from, jnp.int32)
    halo_ok = jnp.asarray(halo_ok, jnp.bool_)

    tri, b3, tri3, b6 = _tri_arrays(block)
    h = _hash_f32(tri, tri3, b3, b6, hash_log, mls)
    # row of previous same-bucket candidates (the tag-row analog): depth
    # rows on the mls hash + 2 on a pure 4-byte hash (the long-hash rows
    # are blind to 4-5 byte matches whose continuation differs — the host
    # parse gets ~40% of its sequences from exactly these short matches)
    rows1 = _candidates_row(h, hash_log, valid_len, max(depth, 1))
    h4 = _hash_f32(tri, tri3, b3, b6, hash_log, 4)
    rows4 = _candidates_row(h4, hash_log, valid_len, 2)
    ef_ok = lambda c: jnp.where(halo_ok | (c >= emit_from), c, -1)

    # selection is by approximate bit GAIN, not raw length: saved literal
    # bits minus the sequence's code cost (~8/bit literal, ~10 bit fixed
    # + log2(dist) offset bits) — the lazy analog of the DP's price
    # model, elementwise
    def gain_of(ml, cd):
        d = jnp.maximum((pos - cd).astype(jnp.float32), 1.0)
        cost = 8.0 + jnp.ceil(jnp.log2(d + 1.0))
        g = 7.5 * ml.astype(jnp.float32) - cost
        return jnp.where((ml >= 4) & (cd >= 0), g, -1e9)

    best_gain = jnp.full(n, -1e9, jnp.float32)
    best_len = jnp.zeros(n, jnp.int32)
    best_cand = jnp.full(n, -1, jnp.int32)

    def consider(cand, state):
        best_gain, best_len, best_cand = state
        ml = _capped_mlen_at(tri, b3, cand, valid_len, emit_from,
                             LAZY_PASSES)
        g = gain_of(ml, cand)
        take = g > best_gain          # nearer candidate wins ties
        return (jnp.where(take, g, best_gain),
                jnp.where(take, ml, best_len),
                jnp.where(take, cand, best_cand))

    st = (best_gain, best_len, best_cand)
    for k in range(rows1.shape[1]):
        st = consider(ef_ok(rows1[:, k]), st)
    for k in range(rows4.shape[1]):
        st = consider(ef_ok(rows4[:, k]), st)
    best_gain, best_len, best_cand = st

    mlen = jnp.where(best_gain > 0.0, best_len, 0)
    cand = best_cand

    # lazy deferral: if a match starting 1 or 2 bytes later gains more than
    # this one plus the stepped-over literals (~7.5 bit each), emit
    # literals here instead; chained deferrals give lazy2+ behavior
    g1 = jnp.concatenate([best_gain[1:], jnp.full(1, -1e9, jnp.float32)])
    g2 = jnp.concatenate([best_gain[2:], jnp.full(2, -1e9, jnp.float32)])
    defer = (g1 > best_gain + 7.5) | (g2 > best_gain + 15.0)
    mlen = jnp.where(defer, 0, mlen)

    nxt = _next_matchable(mlen)
    yp, yl = _resolve(mlen, nxt)
    c_pos, c_len, c_dist, c_nb = _compact(yp, yl, cand, seq_cap, n)
    c_dist = _rep_rewrite(tri, c_pos, c_len, c_dist, c_nb, n)
    seq_pos, seq_len, seq_off, nb_seq = _merge_chains(
        c_pos, c_len, c_dist, c_nb, seq_cap, n)
    return _finish_sequences(block, tri, seq_pos, seq_len, seq_off, nb_seq,
                             valid_len, emit_from, seq_cap, n)


def extract_batch_lazy(blocks: jax.Array, valid_lens: jax.Array,
                       hash_log: int, mls: int, seq_cap: int,
                       depth: int = 3, emit_from=None, halo_ok=None):
    if emit_from is None:
        fn = jax.vmap(lambda b, v: extract_block_lazy(
            b, v, hash_log, mls, seq_cap, depth=depth))
        return fn(blocks, valid_lens)
    fn = jax.vmap(lambda b, v, e, ho: extract_block_lazy(
        b, v, hash_log, mls, seq_cap, depth=depth, emit_from=e, halo_ok=ho))
    return fn(blocks, valid_lens, emit_from, halo_ok)


def extract_batch_v3(blocks: jax.Array, valid_lens: jax.Array,
                     hash_log: int, mls: int, seq_cap: int,
                     emit_from=None, halo_ok=None):
    if emit_from is None:
        fn = jax.vmap(
            lambda b, v: extract_block_v3(b, v, hash_log, mls, seq_cap))
        return fn(blocks, valid_lens)
    fn = jax.vmap(lambda b, v, e, ho: extract_block_v3(
        b, v, hash_log, mls, seq_cap, emit_from=e, halo_ok=ho))
    return fn(blocks, valid_lens, emit_from, halo_ok)
