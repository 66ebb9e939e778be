"""Compacting the committed-match mask into a fixed-capacity SoA seqstore,
and gathering literals — all on device with static shapes.

Output layout per block (capacity SEQ_CAP = n//4):
  seq_pos[s], seq_len[s], seq_off[s]  — committed matches in position order
  nb_seq                               — number of valid entries
  lit_mask / literal gather indices    — bytes not covered by any match

Corresponds to the reference's seqStore fill (ZSTD_storeSeq,
/root/reference/lib/compress/zstd_compress_internal.h:671) but produced by
parallel compaction instead of serial appends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .match import backward_extension, find_matches_block


def extract_block(block: jax.Array, valid_len: jax.Array, hash_log: int,
                  mls: int, seq_cap: int, emit_from=0, halo_ok=True):
    """Run match finding + compaction for one padded block.

    `emit_from`: positions below it are window context only (zstdmt overlap
    halo, /root/reference/lib/compress/zstdmt_compress.c:588): they may serve
    as match *candidates* but never emit sequences or literals. `halo_ok`
    False additionally bans candidates inside [0, emit_from) — used for the
    very first block, whose halo rows are fabricated zeros.

    Returns dict of device arrays:
      nb_seq: int32 scalar
      ll, off, ml: int32[seq_cap]   (litLength, raw offset, matchLength)
      lit_idx: int32[n]  gather indices for literal bytes (padded with n-1)
      nb_lit: int32 scalar
    """
    n = block.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    emit_from = jnp.asarray(emit_from, jnp.int32)
    committed, mlen, cand = find_matches_block(
        block, valid_len, hash_log, mls,
        emit_from=emit_from, halo_ok=halo_ok)

    # --- backward extension of committed matches ---------------------------
    back = backward_extension(block, cand)
    # prev committed end: for each committed position p with length l, the
    # next committed position p' must not extend back past p + l.
    take_len = jnp.where(committed, mlen, 0)
    # end of the match covering/preceding each position, as running max
    ends = jnp.where(committed, pos + take_len, 0)
    prev_end_incl = jax.lax.associative_scan(jnp.maximum, ends)  # inclusive
    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), prev_end_incl[:-1]])
    prev_end = jnp.maximum(prev_end, emit_from)  # never extend into the halo
    ext = jnp.minimum(back, jnp.maximum(pos - prev_end, 0))
    ext = jnp.where(committed, ext, 0)

    start = pos - ext                     # extended match start
    length = take_len + ext               # extended match length
    offset = pos - cand                   # unchanged by extension

    # --- compact committed entries -----------------------------------------
    seq_rank = jnp.cumsum(committed.astype(jnp.int32)) - 1
    nb_seq = jnp.sum(committed.astype(jnp.int32))
    idx = jnp.where(committed, seq_rank, seq_cap)  # overflow slot dropped
    seq_start = jnp.zeros(seq_cap + 1, jnp.int32).at[idx].set(start, mode="drop")
    seq_len = jnp.zeros(seq_cap + 1, jnp.int32).at[idx].set(length, mode="drop")
    seq_off = jnp.zeros(seq_cap + 1, jnp.int32).at[idx].set(
        jnp.where(committed, offset, 0), mode="drop")
    seq_start = seq_start[:seq_cap]
    seq_len = seq_len[:seq_cap]
    seq_off = seq_off[:seq_cap]

    # literal lengths: gap between previous match end and this match start
    s_rank = jnp.arange(seq_cap, dtype=jnp.int32)
    prev_match_end = jnp.where(
        s_rank == 0, emit_from,
        jnp.roll(seq_start + seq_len, 1))
    ll = seq_start - prev_match_end
    valid_seq = s_rank < nb_seq
    ll = jnp.where(valid_seq, ll, 0)
    ml = jnp.where(valid_seq, seq_len, 0)
    off = jnp.where(valid_seq, seq_off, 0)

    # --- literal byte gather -------------------------------------------------
    covered_delta = jnp.zeros(n + 1, jnp.int32)
    covered_delta = covered_delta.at[start].add(
        jnp.where(committed, 1, 0), mode="drop")
    covered_delta = covered_delta.at[start + length].add(
        jnp.where(committed, -1, 0), mode="drop")
    covered = jnp.cumsum(covered_delta[:n]) > 0
    is_lit = (~covered) & (pos >= emit_from) & (pos < valid_len)
    nb_lit = jnp.sum(is_lit.astype(jnp.int32))
    lit_rank = jnp.cumsum(is_lit.astype(jnp.int32)) - 1
    lit_idx = jnp.full(n, n - 1, dtype=jnp.int32)
    lit_idx = lit_idx.at[jnp.where(is_lit, lit_rank, n)].set(pos, mode="drop")

    return {
        "nb_seq": nb_seq,
        "ll": ll,
        "off": off,
        "ml": ml,
        "lit_idx": lit_idx,
        "nb_lit": nb_lit,
        "overflow": nb_seq > seq_cap,
    }


def extract_batch(blocks: jax.Array, valid_lens: jax.Array, hash_log: int,
                  mls: int, seq_cap: int, emit_from=None, halo_ok=None):
    """vmapped extract over B blocks: blocks uint8[B, n]. Optional per-block
    emit_from[B] / halo_ok[B] for window-halo context (see extract_block)."""
    if emit_from is None:
        fn = jax.vmap(
            lambda b, v: extract_block(b, v, hash_log, mls, seq_cap))
        return fn(blocks, valid_lens)
    fn = jax.vmap(lambda b, v, e, ho: extract_block(
        b, v, hash_log, mls, seq_cap, emit_from=e, halo_ok=ho))
    return fn(blocks, valid_lens, emit_from, halo_ok)


def extract_batch_pallas(blocks: jax.Array, valid_lens: jax.Array,
                         hash_log: int, mls: int, seq_cap: int,
                         interpret: bool = False):
    """TPU path: XLA propose + Pallas serial full-seqstore kernel.

    Returns the extract_batch contract plus "lits" (uint8[B, n]) — the
    literal bytes already compacted on device (no lit_idx gather needed)."""
    from .match import hash_positions, prev_same_bucket, words_at
    from .resolve_pallas import PAD, extract_compact

    n = blocks.shape[1]

    def prop(b, v):
        w32 = words_at(b)
        h = hash_positions(b, hash_log, mls, w32)
        return prev_same_bucket(h, v)

    cands = jax.vmap(prop)(blocks, valid_lens)

    def next_possible(b, cand):
        """nxt[i] = smallest j >= i whose candidate matches 4 bytes — the
        serial scan jumps between these instead of stepping bytewise through
        unmatchable (e.g. incompressible) regions. Equivalent commit order:
        positions without a 4-byte match can never satisfy l >= 4."""
        from .match import words_at
        w32 = words_at(b)
        ok = (cand >= 0) & (w32 == w32[jnp.maximum(cand, 0)])
        pos = jnp.arange(n, dtype=jnp.int32)
        big = jnp.int32(n + PAD)
        cand_pos = jnp.where(ok, pos, big)
        return jax.lax.associative_scan(jnp.minimum, cand_pos, reverse=True)

    nxt = jax.vmap(next_possible)(blocks, cands)
    bp = jnp.pad(blocks.astype(jnp.int32), ((0, 0), (0, PAD)))
    cp = jnp.pad(cands, ((0, 0), (0, PAD)), constant_values=-1)
    xp = jnp.pad(nxt, ((0, 0), (0, PAD)), constant_values=n + PAD)
    ll, off, ml, lits, nb, nb_lit = extract_compact(bp, cp, xp, valid_lens,
                                                    seq_cap,
                                                    interpret=interpret)
    return {
        "nb_seq": nb,
        "ll": ll,
        "off": off,
        "ml": ml,
        "lits": lits[:, :n].astype(jnp.uint8),
        "nb_lit": nb_lit,
        "overflow": nb >= seq_cap,
    }
