"""Pallas TPU kernel: serial greedy match-commit scan ("resolve").

The propose phase (hash + dense candidate table) is embarrassingly parallel
XLA; the greedy left-to-right commit is inherently serial (each commit moves
the scan past the match). On TPU the right tool for a byte-serial, branchy
loop is a Pallas kernel with VMEM-resident data — the same role the
hand-written asm inner loop plays in the reference decoder
(/root/reference/lib/decompress/huf_decompress_amd64.S): the hot serial loop,
done native.

Replaces the scatter-heavy pointer-doubling resolve (ops.match.greedy_resolve)
and the unbounded chunked-compare match_lengths on the TPU path: the kernel
computes match lengths on demand (only at visited positions) with 128-lane
vector compares, and emits the compacted (pos, len) sequence list directly.

VMEM dynamic-access rules (Mosaic): indices must be provably 128-aligned, so
every dynamic read loads an aligned 2*CH window and realigns with a dynamic
pltpu.roll; scalar reads use an aligned load + lane-select reduction; scalar
writes use an aligned read-modify-write with a lane mask.

Commit rule (matches ops.match semantics): at position ip with candidate c,
take iff lcp(ip, c, valid_len - ip) >= 4 and ip < valid_len - 8; advance by
the match length, else by 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 128          # lcp compare vector width (bytes per round)
PAD = 2 * _CH      # caller pads the byte rows by this much


def _resolve_kernel(vl_ref, bytes_ref, cand_ref, pos_ref, len_ref, nb_ref):
    cap = pos_ref.shape[2]
    vl = jnp.sum(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, _CH), 1) == 0,
        vl_ref[0, 0:1, :], 0))

    pos_ref[...] = jnp.zeros_like(pos_ref)
    len_ref[...] = jnp.zeros_like(len_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CH), 1)

    def load_window(ref, idx):
        """(1, _CH) i32 vector of ref[0, idx : idx + _CH] (idx arbitrary)."""
        base = pl.multiple_of((idx // _CH) * _CH, _CH)
        win = ref[0, 0:1, pl.ds(base, 2 * _CH)]
        return pltpu.roll(win, -(idx - base), axis=1)[:, :_CH]

    def load_scalar(ref, idx):
        base = pl.multiple_of((idx // _CH) * _CH, _CH)
        vec = ref[0, 0:1, pl.ds(base, _CH)]
        return jnp.sum(jnp.where(lane == (idx - base), vec, 0))

    def store_scalar(ref, idx, value):
        base = pl.multiple_of((idx // _CH) * _CH, _CH)
        vec = ref[0, 0:1, pl.ds(base, _CH)]
        ref[0, 0:1, pl.ds(base, _CH)] = jnp.where(lane == (idx - base),
                                                  value, vec)

    def lcp(p, c, limit):
        """Common prefix length of bytes at p and c, capped at limit."""
        def cond(st):
            _, done = st
            return jnp.logical_not(done)

        def body(st):
            l, _ = st
            a = load_window(bytes_ref, p + l)
            b = load_window(bytes_ref, c + l)
            neq = a != b
            first = jnp.min(jnp.where(neq, lane, _CH))
            l2 = l + first
            done = (first < _CH) | (l2 >= limit)
            return jnp.minimum(l2, limit), done

        l, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), limit <= 0))
        return l

    limit_pos = vl - 8

    def cond(st):
        ip, k = st
        return (ip < limit_pos) & (k < cap)

    def body(st):
        ip, k = st
        c = load_scalar(cand_ref, ip)
        l = jax.lax.cond(c >= 0,
                         lambda: lcp(ip, c, vl - ip),
                         lambda: jnp.int32(0))
        take = l >= 4

        @pl.when(take)
        def _():
            store_scalar(pos_ref, k, ip)
            store_scalar(len_ref, k, l)

        return (jnp.where(take, ip + l, ip + 1),
                k + take.astype(jnp.int32))

    _, k = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    nb_ref[...] = jnp.full_like(nb_ref, k)


@functools.partial(jax.jit, static_argnames=("cap",))
def resolve_compact(blocks_padded: jax.Array, cands_padded: jax.Array,
                    valid_lens: jax.Array, cap: int):
    """blocks_padded: int32[B, N+PAD] (widened bytes, zero tail);
    cands_padded: int32[B, N+PAD] (candidate index or -1, padded);
    valid_lens: int32[B].

    Returns (seq_pos int32[B, cap], seq_len int32[B, cap], nb int32[B])."""
    B, n_pad = blocks_padded.shape
    vl3 = jnp.broadcast_to(valid_lens.reshape(B, 1, 1).astype(jnp.int32),
                           (B, 1, _CH))
    b3 = blocks_padded.reshape(B, 1, n_pad)
    c3 = cands_padded.reshape(B, 1, n_pad)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, _CH), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _CH), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    pos, lens, nb = pl.pallas_call(
        _resolve_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, _CH), jnp.int32),
        ],
    )(vl3, b3, c3)
    return pos[:, 0], lens[:, 0], nb[:, 0, 0]
