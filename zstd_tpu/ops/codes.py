"""Device-side sequence code conversion, repcode assignment, and histograms.

Moves ZSTD_seqToCodes (/root/reference/lib/compress/zstd_compress.c:2683) and
the repcode selection onto the device so only histograms (a few KB) ever
cross the host link. The repcode rule is the stateless intra-block one proved
in pipeline._assign_repcodes_vec: off_base=1 iff litLength>0 and the offset
equals the previous sequence's offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (MAX_LL_CODE, MAX_ML_CODE, MAX_OFF_CODE,
                         _LL_CODE_TABLE, _ML_CODE_TABLE)

_LLT = jnp.asarray(_LL_CODE_TABLE, dtype=jnp.int32)
_MLT = jnp.asarray(_ML_CODE_TABLE, dtype=jnp.int32)


def _highbit(x: jax.Array) -> jax.Array:
    return 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))


def seq_codes_block(ll: jax.Array, off: jax.Array, ml: jax.Array,
                    nb_seq: jax.Array):
    """ll/off/ml i32[cap] (match length incl. MINMATCH), nb_seq scalar.

    Returns dict with off_base, codes, extras, per-code histograms, and the
    last sequence's codes.
    """
    cap = ll.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    valid = idx < nb_seq

    prev_off = jnp.roll(off, 1)
    is_rep1 = (idx > 0) & valid & (ll > 0) & (off == prev_off)
    ob = jnp.where(is_rep1, 1, off + 3)
    ob = jnp.where(valid, ob, 1)

    mlb = jnp.maximum(ml - 3, 0)
    llc = jnp.where(ll > 63, 19 + _highbit(ll), _LLT[jnp.clip(ll, 0, 63)])
    mlc = jnp.where(mlb > 127, 36 + _highbit(mlb), _MLT[jnp.clip(mlb, 0, 127)])
    ofc = _highbit(ob)
    llc = jnp.where(valid, llc, 0)
    mlc = jnp.where(valid, mlc, 0)
    ofc = jnp.where(valid, ofc, 0)

    # one-hot reductions, not scatter-adds: TPU scatters serialize, while the
    # masked-equality reduce vectorizes on the VPU (SURVEY §2.2 hist row)
    w = valid.astype(jnp.int32)

    def _hist(codes, nbins):
        oh = codes[:, None] == jnp.arange(nbins, dtype=jnp.int32)[None, :]
        return jnp.sum(jnp.where(oh, w[:, None], 0), axis=0)

    ll_hist = _hist(llc, MAX_LL_CODE + 1)
    ml_hist = _hist(mlc, MAX_ML_CODE + 1)
    of_hist = _hist(ofc, MAX_OFF_CODE + 1)

    last = jnp.clip(nb_seq - 1, 0, cap - 1)
    last_codes = jnp.stack([llc[last], ofc[last], mlc[last]])

    return dict(ob=ob, llc=llc, mlc=mlc, ofc=ofc, mlb=mlb,
                ll_hist=ll_hist, ml_hist=ml_hist, of_hist=of_hist,
                last_codes=last_codes)
