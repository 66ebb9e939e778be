"""Optimal-parse strategy (native DP parser; serves levels 3-22).

Thin wrapper over the native DP parser (native/opt.c, loaded via
zstd_tpu.native). Falls back to the deep lazy searcher when the native
library is unavailable. Role parity: /root/reference/lib/compress/zstd_opt.c.
"""

from __future__ import annotations

import numpy as np

from ..constants import MIN_MATCH
from ..native import get_native
from .lazy import find_sequences_lazy
from .sequences import SeqStore


def find_sequences_opt(full: np.ndarray, block_start: int, block_end: int,
                       window_low: int, reps: tuple, cparams,
                       state=None) -> tuple[SeqStore, tuple]:
    nat = get_native()
    if nat is None:
        return find_sequences_lazy(full, block_start, block_end, window_low,
                                   reps, cparams)
    ctx = None
    if state is not None:
        if state.opt_ctx is None:
            state.opt_ctx = nat.opt_ctx()
        ctx = state.opt_ctx
    res = nat.opt_parse(full, window_low, block_start, block_end, reps,
                        cparams.hash_log, cparams.search_log,
                        cparams.min_match, cparams.target_length,
                        cparams.strategy, ctx=ctx)
    if res is None:
        return find_sequences_lazy(full, block_start, block_end, window_low,
                                   reps, cparams)
    ll, ob, mb, new_reps = res
    parts = []
    pos = block_start
    for i in range(len(ll)):
        l = int(ll[i])
        parts.append(full[pos : pos + l].tobytes())
        pos += l + int(mb[i]) + MIN_MATCH
    parts.append(full[pos:block_end].tobytes())
    return SeqStore(ll, ob, mb, b"".join(parts)), new_reps
