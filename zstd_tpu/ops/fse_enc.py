"""Device 3-state interleaved FSE sequence encoding.

TPU analog of ZSTD_encodeSequences_body
(/root/reference/lib/compress/zstd_compress_sequences.c:291): a lax.scan walks
sequences last-to-first carrying the three FSE states (the inherently serial
chain), emitting (value, nbits) fields; ops.bitpack packs them in parallel.
Across B blocks the scan is vmapped: B independent lanes.

Field order per written block (forward write order; mirrors the reference):
  prologue (last sequence):  LL extra, ML extra, OF extra
  per seq i = n-2..0:        OF state, ML state, LL state, LLx, MLx, OFx
  epilogue:                  ML flush, OF flush, LL flush, sentinel(1,1)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LL_BITS, ML_BITS
from .bitpack import pack_bits

# Table slot order inside the stacked table arrays.
T_LL, T_OF, T_ML = 0, 1, 2
STATE_TABLE_PAD = 512  # 2^max(LLFSELog, MLFSELog)
SYM_PAD = 64

_LL_BITS_J = jnp.asarray(LL_BITS, dtype=jnp.int32)
_ML_BITS_J = jnp.asarray(ML_BITS, dtype=jnp.int32)


def _init_state(state_table, delta_nb, delta_fs, sym):
    d = delta_nb[sym]
    nb_out = (d + (1 << 15)) >> 16
    v = (nb_out << 16) - d
    return state_table[(v >> nb_out) + delta_fs[sym]]


def _encode_state(state_table, delta_nb, delta_fs, state, sym):
    """Returns (emitted_value, emitted_nbits, new_state)."""
    nb_out = (state + delta_nb[sym]) >> 16
    new_state = state_table[(state >> nb_out) + delta_fs[sym]]
    return state, nb_out, new_state


def fse_pack_block(llc, mlc, ofc, ll_x, ml_x, of_x, nb_seq,
                   state_tables, delta_nbs, delta_fss, tlogs,
                   cap: int, out_words: int):
    """One block. codes/extras i32[cap]; tables i32[3, ...]; tlogs i32[3].

    Returns (words u32[out_words], total_bits i32, overflow bool)."""

    def step(carry, k):
        s_ll, s_of, s_ml = carry
        # padding steps run FIRST (i >= nb_seq): their zero-width fields all
        # sit at offset 0, where the gather-packer's searchsorted naturally
        # skips them; real fields follow in last-to-first sequence order.
        i = cap - 1 - k
        ii = jnp.clip(i, 0, cap - 1)
        lc, mc, oc = llc[ii], mlc[ii], ofc[ii]
        llb = _LL_BITS_J[jnp.clip(lc, 0, 35)]
        mlb = _ML_BITS_J[jnp.clip(mc, 0, 52)]

        is_init = i == nb_seq - 1
        valid = i < nb_seq

        # state-bit emissions (only for k >= 1)
        of_v, of_n, s_of2 = _encode_state(state_tables[T_OF], delta_nbs[T_OF],
                                          delta_fss[T_OF], s_of, oc)
        ml_v, ml_n, s_ml2 = _encode_state(state_tables[T_ML], delta_nbs[T_ML],
                                          delta_fss[T_ML], s_ml, mc)
        ll_v, ll_n, s_ll2 = _encode_state(state_tables[T_LL], delta_nbs[T_LL],
                                          delta_fss[T_LL], s_ll, lc)

        # init-state values (k == 0)
        s_ml_init = _init_state(state_tables[T_ML], delta_nbs[T_ML],
                                delta_fss[T_ML], mc)
        s_of_init = _init_state(state_tables[T_OF], delta_nbs[T_OF],
                                delta_fss[T_OF], oc)
        s_ll_init = _init_state(state_tables[T_LL], delta_nbs[T_LL],
                                delta_fss[T_LL], lc)

        emit_states = valid & ~is_init
        ns_ll = jnp.where(is_init, s_ll_init, jnp.where(emit_states, s_ll2, s_ll))
        ns_of = jnp.where(is_init, s_of_init, jnp.where(emit_states, s_of2, s_of))
        ns_ml = jnp.where(is_init, s_ml_init, jnp.where(emit_states, s_ml2, s_ml))

        z = jnp.int32(0)
        values = jnp.stack([
            jnp.where(emit_states, of_v, z),
            jnp.where(emit_states, ml_v, z),
            jnp.where(emit_states, ll_v, z),
            jnp.where(valid, ll_x[ii], z),
            jnp.where(valid, ml_x[ii], z),
            jnp.where(valid, of_x[ii], z),
        ])
        nbits = jnp.stack([
            jnp.where(emit_states, of_n, z),
            jnp.where(emit_states, ml_n, z),
            jnp.where(emit_states, ll_n, z),
            jnp.where(valid, llb, z),
            jnp.where(valid, mlb, z),
            jnp.where(valid, oc, z),
        ])
        return (ns_ll, ns_of, ns_ml), (values, nbits)

    init = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (s_ll, s_of, s_ml), (vals, nbs) = jax.lax.scan(
        step, init, jnp.arange(cap, dtype=jnp.int32))

    has_seq = nb_seq > 0
    z = jnp.int32(0)
    one = jnp.int32(1)
    tail_vals = jnp.stack([
        jnp.where(has_seq, s_ml, z),
        jnp.where(has_seq, s_of, z),
        jnp.where(has_seq, s_ll, z),
        one,
    ])
    tail_nbs = jnp.stack([
        jnp.where(has_seq, tlogs[T_ML], z),
        jnp.where(has_seq, tlogs[T_OF], z),
        jnp.where(has_seq, tlogs[T_LL], z),
        one,
    ])
    values = jnp.concatenate([vals.reshape(-1), tail_vals])
    nbits = jnp.concatenate([nbs.reshape(-1), tail_nbs])
    words, bits = pack_bits(values, nbits, out_words)
    return words, bits, jnp.bool_(False)


@functools.partial(jax.jit, static_argnames=("cap", "out_words"))
def fse_pack_batch(llc, mlc, ofc, ll_x, ml_x, of_x, nb_seqs,
                   state_tables, delta_nbs, delta_fss, tlogs,
                   cap, out_words):
    """Batched over B blocks. codes/extras i32[B, cap]; tables i32[B, 3, ...]."""
    return jax.vmap(
        lambda a, b, c, d, e, f, g, h, i, j, k: fse_pack_block(
            a, b, c, d, e, f, g, h, i, j, k, cap, out_words)
    )(llc, mlc, ofc, ll_x, ml_x, of_x, nb_seqs,
      state_tables, delta_nbs, delta_fss, tlogs)
