"""Device decode kernels: batched Huffman literal decode + sequence
execution.

Role parity: the hot halves of the reference decoder —
HUF_decompress4X/1X inner loops (/root/reference/lib/decompress/huf_decompress.c:329,
the asm loop huf_decompress_amd64.S) and ZSTD_execSequence
(/root/reference/lib/decompress/zstd_decompress_block.c:1001) — rebuilt as
batched XLA programs:

  - Huffman: the backward bitstream is expanded once into per-bit-position
    11-bit window values (static shifted f32 adds, exact), then a lockstep
    scan walks all streams of all blocks in parallel, one table-gather per
    symbol per lane. 4-stream blocks give 4B lanes.
  - execSequence: every output byte's source is computed positionally
    (literal rank or match source index; overlapping matches use the
    periodic-source rewrite so self-overlap never chains), then match
    bytes resolve by wavefront gather rounds — depth is the match-to-match
    dependency depth, not byte count.

Host keeps frame/section parsing and the (tiny, byte-serial) FSE sequence
decode, mirroring how the reference keeps orchestration in C around its
vector inner loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_TLOG = 11
EXEC_ROUNDS = 26


def _bits_lsb(stream_bytes: jax.Array) -> jax.Array:
    """uint8[m] -> f32[8m]: bit j of the stream (LSB-first within bytes)."""
    bf = stream_bytes.astype(jnp.float32)
    outs = []
    for k in range(8):
        outs.append(jnp.floor(bf / float(1 << k)) % 2.0)
    return jnp.stack(outs, axis=1).reshape(-1)


def huf_window_values(stream_bytes: jax.Array, tlog: int = MAX_TLOG
                      ) -> jax.Array:
    """f32[8m + tlog]: win[p] = value of bits [p-tlog, p) (zero-padded below),
    i.e. the table index the backward reader would use at bit position p."""
    bits = _bits_lsb(stream_bytes)
    padded = jnp.concatenate([jnp.zeros(tlog, jnp.float32), bits])
    n = padded.shape[0]
    win = jnp.zeros(n - tlog + 1, jnp.float32)
    for t in range(tlog):
        win = win + padded[t : t + n - tlog + 1] * float(1 << t)
    return win  # index p reads bits [p-tlog, p) of the unpadded stream


def huf_decode_streams(wins: jax.Array, start_bits: jax.Array,
                       n_syms: jax.Array, sym_lut: jax.Array,
                       len_lut: jax.Array, max_syms: int) -> jax.Array:
    """Decode many streams in lockstep.

    wins:      f32[L, W]  per-lane window values (huf_window_values)
    start_bits:i32[L]     initial bit position (useful bits in the stream)
    n_syms:    i32[L]     symbols to decode per lane
    sym_lut:   i32[L, 2048], len_lut: i32[L, 2048]  per-lane decode LUT
    Returns (uint8[L, max_syms] decoded symbols (garbage past n_syms),
    i32[L] final bit position — exactly 0 for a well-formed stream; a
    negative value means the stream under-ran (corruption the caller must
    surface, since the window gather itself clamps instead of trapping).
    """

    def step(carry, i):
        pos = carry
        idx = jnp.take_along_axis(
            wins, jnp.clip(pos, 0, wins.shape[1] - 1)[:, None],
            axis=1)[:, 0].astype(jnp.int32)
        sym = jnp.take_along_axis(sym_lut, idx[:, None], axis=1)[:, 0]
        ln = jnp.take_along_axis(len_lut, idx[:, None], axis=1)[:, 0]
        active = i < n_syms
        pos = jnp.where(active, pos - ln, pos)
        return pos, sym.astype(jnp.uint8)

    # unroll: the per-step compute is a few tiny gathers, so loop overhead
    # dominates; unrolling amortizes it across 8 symbols per iteration
    final_pos, syms = jax.lax.scan(step, start_bits,
                                   jnp.arange(max_syms, dtype=jnp.int32),
                                   unroll=8)
    return syms.T, final_pos  # [L, max_syms], [L]


def assemble_pool(syms: jax.Array, seg_start: jax.Array, seg_lane: jax.Array,
                  seg_src: jax.Array, seg_is_dev: jax.Array,
                  host_lits: jax.Array, npad: int) -> jax.Array:
    """Build the frame-global literal pool ON DEVICE from the Huffman lanes
    plus host-supplied raw/RLE literal bytes, so decoded literals never
    cross the link. Segments are pool spans in increasing start order:
    dev segments read lane `seg_lane`'s symbols, host segments read
    `host_lits[seg_src + within]`. Starts equal to `npad` are padding
    (dropped by the scatter)."""
    S = seg_start.shape[0]
    pos = jnp.arange(npad, dtype=jnp.int32)
    marker = jnp.full(npad, -1, jnp.int32).at[seg_start].max(
        jnp.arange(S, dtype=jnp.int32), mode="drop")
    seg = jax.lax.associative_scan(jnp.maximum, marker)
    seg = jnp.clip(seg, 0, S - 1)
    within = pos - seg_start[seg]
    msyms = syms.shape[1]
    flat = seg_lane[seg] * msyms + jnp.clip(within, 0, msyms - 1)
    dev_val = syms.reshape(-1)[jnp.clip(flat, 0, syms.size - 1)]
    hv = host_lits[jnp.clip(seg_src[seg] + within, 0,
                            host_lits.shape[0] - 1)]
    return jnp.where(seg_is_dev[seg], dev_val, hv)


@functools.partial(jax.jit, static_argnames=("max_syms", "n"))
def fused_frame_decode(sb, start_bits, n_syms, n_lanes, lut_sym, lut_len,
                       lane_tab, seg_start, seg_lane, seg_src, seg_is_dev,
                       host_lits, nb_lit, lls, mls, offs, nb_seq, out_len,
                       max_syms: int, n: int):
    """One-dispatch frame decode: batched Huffman literal decode for every
    stream of every block, device-side literal-pool assembly, and the
    frame-global sequence executor — fused so the only d2h is the output
    (or just the ok scalar for device-resident consumers).

    Role parity: the whole of the reference's per-block decode loop
    (/root/reference/lib/decompress/zstd_decompress.c:2385 decompressFrame ->
    huf_decompress.c 4X loops -> zstd_decompress_block.c:1001 execSequence)
    as a single XLA program per frame.

    Returns (out uint8[n], ok bool, final_pos i32[L]). `ok` already folds
    in the Huffman over-read check (every active lane's backward stream
    must end exactly at bit 0)."""
    wins = jax.vmap(huf_window_values)(sb)
    sym_lut = lut_sym[lane_tab].astype(jnp.int32)
    len_lut = lut_len[lane_tab].astype(jnp.int32)
    syms, final = huf_decode_streams(wins, start_bits, n_syms,
                                     sym_lut, len_lut, max_syms)
    pool = assemble_pool(syms, seg_start, seg_lane, seg_src, seg_is_dev,
                         host_lits, n)
    out, ok = exec_sequences(pool, nb_lit, lls, mls, offs, nb_seq,
                             out_len, n, jnp.zeros(1, jnp.uint8),
                             jnp.int32(0))
    lane_active = jnp.arange(sb.shape[0], dtype=jnp.int32) < n_lanes
    hufok = jnp.all(jnp.where(lane_active, final == 0, True))
    return out, ok & hufok, final


def exec_sequences(lits: jax.Array, nb_lit, ll: jax.Array, ml: jax.Array,
                   off: jax.Array, nb_seq, out_len, n: int,
                   history: jax.Array, hist_len):
    """Execute one block's sequences against device-resident literals.

    lits:    uint8[n]  decoded literal bytes (prefix nb_lit valid)
    ll/ml/off: i32[seq_cap]  litLength / matchLength / ABSOLUTE offset
    history: uint8[h]  previous frame bytes this block may reference
    Returns (out uint8[n], ok bool) — ok False when dependency depth
    exceeded EXEC_ROUNDS (caller falls back to host).
    """
    seq_cap = ll.shape[0]
    k = jnp.arange(seq_cap, dtype=jnp.int32)
    vmask = k < nb_seq
    llv = jnp.where(vmask, ll, 0)
    mlv = jnp.where(vmask, ml, 0)
    # per-sequence output start offsets
    span = llv + mlv
    seq_end = jax.lax.associative_scan(jnp.add, span)
    seq_start = seq_end - span
    match_start = seq_start + llv          # where the match part begins
    pos = jnp.arange(n, dtype=jnp.int32)

    # literal placement: a position is a literal iff not covered by a match
    cov = jnp.zeros(n + 1, jnp.int32)
    cov = cov.at[jnp.where(vmask & (mlv > 0), match_start, n)].add(
        1, mode="drop")
    cov = cov.at[jnp.where(vmask & (mlv > 0), match_start + mlv, n)].add(
        -1, mode="drop")
    in_match = jax.lax.associative_scan(jnp.add, cov[:n]) > 0
    is_lit = (~in_match) & (pos < out_len)
    lit_rank = jax.lax.associative_scan(jnp.add,
                                        is_lit.astype(jnp.int32)) - 1
    out = jnp.where(is_lit, lits[jnp.clip(lit_rank, 0, n - 1)].astype(
        jnp.int32), 0)

    # match source index per output byte: scatter each match's SEQUENCE
    # INDEX at its start, then a running max gives the covering sequence
    # (a plain start counter would miss zero-match pseudo-sequences)
    marker = jnp.full(n + 1, -1, jnp.int32).at[
        jnp.where(vmask & (mlv > 0), match_start, n)].max(k, mode="drop")
    mid = jax.lax.associative_scan(jnp.maximum, marker[:n])
    mid = jnp.clip(mid, 0, seq_cap - 1)
    m_start = match_start[mid]
    m_off = jnp.where(vmask[mid], off[mid], 1)
    m_off = jnp.maximum(m_off, 1)
    # periodic-source rewrite: j's source = start - off + ((j - start) mod off)
    # which always lands strictly before the match start (self-overlap safe)
    rel = (pos - m_start).astype(jnp.float32)
    offf = m_off.astype(jnp.float32)
    # f32 division may miss the true quotient by one ulp; products stay
    # exact (< 2^24), so one correction pass restores the exact remainder
    q = jnp.floor(rel / offf)
    r = rel - q * offf
    r = jnp.where(r < 0, r + offf, r)
    r = jnp.where(r >= offf, r - offf, r)
    src = m_start - m_off + r.astype(jnp.int32)
    src = jnp.where(in_match, src, pos)

    # sources below 0 read the history window (resolved immediately):
    # `history` holds the last h bytes before this block, so block-relative
    # source s (< 0) lives at history[h + s]
    h = history.shape[0]

    # pointer-doubling resolution: every position's ultimate source is a
    # literal (or history) position; chains collapse in log2 rounds
    # regardless of match nesting depth (the wavefront alternative is
    # unbounded on real data)
    ptr = jnp.where(in_match, src, pos)   # negatives = history terminals

    def dbl_body(state):
        ptr, r, _ = state
        nxt = jnp.take(ptr, jnp.clip(ptr, 0, n - 1))
        nxt = jnp.where(ptr < 0, ptr, nxt)
        changed = jnp.any(nxt != ptr)
        return nxt, r + 1, changed & (r < EXEC_ROUNDS)

    ptr, _, _ = jax.lax.while_loop(
        lambda s: s[2], dbl_body,
        (ptr, jnp.int32(0), jnp.any(in_match)))
    ok = jnp.all((ptr == jnp.where(
        ptr < 0, ptr, jnp.take(ptr, jnp.clip(ptr, 0, n - 1))))
        | (pos >= out_len))

    base = out  # literal values already placed at terminal positions
    resolved_vals = jnp.take(base, jnp.clip(ptr, 0, n - 1))
    hist_vals = history[jnp.clip(h + jnp.minimum(ptr, -1), 0, h - 1)] \
        .astype(jnp.int32)
    out = jnp.where(ptr < 0, hist_vals,
                    jnp.where(in_match, resolved_vals, out))
    return out.astype(jnp.uint8), ok
