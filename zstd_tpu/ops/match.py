"""Batched match finding on device: propose (parallel) + resolve (log-parallel).

TPU-native replacement for the reference's serial per-position loop
(/root/reference/lib/compress/zstd_fast.c:192). Decomposition:

1. `hash_positions`  — vectorized rolling hash of every position (VPU).
2. `prev_same_bucket` — most recent earlier position in the same hash bucket,
   via one batched sort (the dense equivalent of a fully-updated hash table).
3. `match_lengths`   — forward match length for every (pos, candidate) pair by
   iterative chunk compares (gathers).
4. `greedy_resolve`  — the greedy left-to-right commit computed WITHOUT a
   serial scan: next[i] = i + (take ? len : 1) forms a functional graph; the
   committed set is the orbit of 0, found by pointer doubling in ceil(log2 n)
   rounds of gathers + scatters.

The host oracle (zstd_tpu.format.matchfinder with tpu_semantics) implements
the same algorithm serially; seqstores must match exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MIN_MATCH_EMIT = 4  # we only emit matches >= 4 (repcode-free resolve)

_P1 = np.uint32(2654435761)
_P2 = np.uint32(2246822519)


def words_at(block: jax.Array) -> jax.Array:
    """uint32[n]: little-endian 4-byte word starting at every byte position
    (positions past the end read zeros). One shifted-add construction, no
    gathers; the word array then serves all match comparisons 4 bytes at a
    time."""
    n = block.shape[0]
    b = block.astype(jnp.uint32)
    zero = jnp.zeros(3, dtype=jnp.uint32)
    bp = jnp.concatenate([b, zero])
    w = (bp[0:n]
         | (bp[1:n + 1] << np.uint32(8))
         | (bp[2:n + 2] << np.uint32(16))
         | (bp[3:n + 3] << np.uint32(24)))
    return w


def hash_positions(block: jax.Array, hash_log: int, mls: int,
                   w32: jax.Array | None = None) -> jax.Array:
    """block: uint8[n]. Returns uint32[n] bucket ids (hash of mls bytes).

    Uses two u32 lane loads (bytes 0-3 and 4-7 masked to mls) mixed with
    Knuth/xxh32 primes — u32-only so it runs without x64 mode.
    """
    n = block.shape[0]
    if w32 is None:
        w32 = words_at(block)
    lo = w32
    hi = jnp.concatenate([w32[4:], jnp.zeros(4, dtype=jnp.uint32)])
    keep = max(0, min(mls, 8) - 4)
    if keep == 0:
        hi = jnp.zeros_like(hi)
    elif keep < 4:
        hi = hi & np.uint32((1 << (8 * keep)) - 1)
    h = lo * _P1 ^ hi * _P2
    return h >> np.uint32(32 - hash_log)


def prev_same_bucket(h: jax.Array, valid_len: jax.Array) -> jax.Array:
    """int32[n]: largest j < i with h[j] == h[i] (both < valid_len), else -1."""
    n = h.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    # push invalid tail positions into a reserved bucket
    hv = jnp.where(pos < valid_len, h, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(hv, stable=True).astype(jnp.int32)
    h_sorted = hv[order]
    same = h_sorted[1:] == h_sorted[:-1]
    prev_sorted = jnp.where(same, order[:-1], -1)
    prev = jnp.zeros(n, dtype=jnp.int32).at[order[1:]].set(prev_sorted)
    prev = prev.at[order[0]].set(-1)
    return jnp.where(pos < valid_len, prev, -1)


def _ctz_bytes(x: jax.Array) -> jax.Array:
    """Per-element: number of matching low BYTES implied by xor value x
    (4 when x == 0)."""
    lowbit = x & (jnp.uint32(0) - x)
    ctz = 31 - jax.lax.clz(lowbit.astype(jnp.int32)).astype(jnp.int32)
    return jnp.where(x == 0, 4, ctz >> 3).astype(jnp.int32)


def _clz_bytes(x: jax.Array) -> jax.Array:
    """Per-element: number of matching high BYTES implied by xor value x."""
    clz = jax.lax.clz(x.astype(jnp.int32)).astype(jnp.int32)
    return jnp.where(x == 0, 4, clz >> 3).astype(jnp.int32)


def match_lengths(block: jax.Array, cand: jax.Array, valid_len: jax.Array,
                  w32: jax.Array | None = None,
                  max_rounds: int = 255, chunk_words: int = 8) -> jax.Array:
    """int32[n] forward match length between pos i and cand[i] (0 if cand<0
    or first 4 bytes differ). Word-at-a-time compares via the words_at view;
    capped at valid_len - i and 4 + 4*chunk_words*max_rounds."""
    n = block.shape[0]
    if w32 is None:
        w32 = words_at(block)
    pos = jnp.arange(n, dtype=jnp.int32)
    limit = jnp.maximum(valid_len - pos, 0)
    has_cand = cand >= 0
    c = jnp.maximum(cand, 0)

    def word_run(a_off, b_off):
        """Matching byte count over chunk_words u32 windows (byte-granular)."""
        run = jnp.zeros(n, dtype=jnp.int32)
        still = jnp.ones(n, dtype=jnp.bool_)
        for k in range(chunk_words):
            wa = w32[jnp.minimum(a_off + 4 * k, n - 1)]
            wb = w32[jnp.minimum(b_off + 4 * k, n - 1)]
            x = wa ^ wb
            eqb = _ctz_bytes(x)
            run = run + jnp.where(still, eqb, 0)
            still = still & (x == 0)
        return run

    matched = has_cand & (w32 == w32[c])
    mlen = jnp.where(matched, 4, 0).astype(jnp.int32)
    active = matched
    chunk = 4 * chunk_words

    def body(state):
        mlen, active, rounds, _ = state
        run = word_run(pos + mlen, c + mlen)
        run = jnp.where(active, run, 0)
        mlen = mlen + run
        rounds = rounds + 1
        active = active & (run == chunk) & (rounds < max_rounds)
        return mlen, active, rounds, jnp.any(active)

    mlen, _, _, _ = jax.lax.while_loop(
        lambda s: s[3], body, (mlen, active, jnp.int32(0), jnp.any(active)))
    mlen = jnp.minimum(mlen, limit)
    return jnp.where(matched, mlen, 0)


def backward_extension(block: jax.Array, cand: jax.Array,
                       max_back: int = 16,
                       w32: jax.Array | None = None) -> jax.Array:
    """int32[n]: how far (pos, cand) match extends backwards (bounded).
    Word-at-a-time: compare the 4 bytes ENDING at each boundary and count
    matching high bytes."""
    n = block.shape[0]
    if w32 is None:
        w32 = words_at(block)
    pos = jnp.arange(n, dtype=jnp.int32)
    c = jnp.maximum(cand, 0)
    ext = jnp.zeros(n, dtype=jnp.int32)
    still = cand >= 0
    for k in range(max_back // 4):
        back = 4 * (k + 1)
        ia = pos - back
        ib = c - back
        ok_range = still & (ia >= 0) & (ib >= 0)
        wa = w32[jnp.maximum(ia, 0)]
        wb = w32[jnp.maximum(ib, 0)]
        x = wa ^ wb
        eqb = jnp.where(ok_range, _clz_bytes(x), 0)
        ext = ext + jnp.where(still, eqb, 0)
        still = ok_range & (x == 0)
    return ext


def greedy_resolve(take_len: jax.Array, valid_len: jax.Array,
                   n_log2: int) -> jax.Array:
    """Committed-position mask of the greedy scan, via pointer doubling.

    take_len[i]: match length the greedy would take at i (0 => advance 1).
    Returns bool[n] mask of positions the scan visits AND takes a match at.
    """
    n = take_len.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    take = take_len >= MIN_MATCH_EMIT
    step = jnp.where(take, take_len, 1)
    nxt = jnp.minimum(pos + step, n)  # n == terminal sink

    # reachable-from-0 via pointer doubling over the functional graph
    reach = jnp.zeros(n + 1, dtype=jnp.bool_).at[0].set(True)
    # derive from input so the carry is axis-varying under shard_map
    reach = reach | (take_len[0] < 0)
    jump = jnp.concatenate([nxt, jnp.array([n], dtype=jnp.int32)])
    jump = jump + (take_len[0] & 0)

    def body(_, state):
        reach, jump = state
        targets = jump  # where each node goes after 2^k steps
        add = jnp.zeros(n + 1, dtype=jnp.bool_).at[targets].max(reach)
        reach = reach | add
        jump = jump[jump]
        return reach, jump

    reach, _ = jax.lax.fori_loop(0, n_log2 + 1, body, (reach, jump))
    visited = reach[:n] & (pos < valid_len)
    return visited & take


def find_matches_block(block: jax.Array, valid_len: jax.Array,
                       hash_log: int, mls: int, emit_from=0,
                       halo_ok=True) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full propose+resolve for one (padded) block.

    Positions below `emit_from` are window context (halo): they are hashed
    and may be candidates, but never commit matches. With halo_ok False,
    candidates below emit_from are banned too (fabricated halo).

    Returns (committed mask bool[n], match_len int32[n], cand int32[n]).
    Sequence extraction (mask -> compacted seqstore) happens in the caller.
    """
    n = block.shape[0]
    # positions too close to the end never start a match (tail literal margin)
    margin = 8
    emit_from = jnp.asarray(emit_from, jnp.int32)
    halo_ok = jnp.asarray(halo_ok, jnp.bool_)
    w32 = words_at(block)
    h = hash_positions(block, hash_log, mls, w32)
    cand = prev_same_bucket(h, valid_len)
    cand = jnp.where(halo_ok | (cand >= emit_from), cand, -1)
    mlen = match_lengths(block, cand, valid_len, w32)
    pos = jnp.arange(n, dtype=jnp.int32)
    mlen = jnp.where((pos < valid_len - margin) & (pos >= emit_from), mlen, 0)
    n_log2 = max(1, int(np.ceil(np.log2(max(n, 2)))))
    committed = greedy_resolve(mlen, valid_len, n_log2)
    return committed, mlen, cand
