"""Pallas TPU kernel: serial greedy match-commit scan ("resolve").

The propose phase (hash + dense candidate table) is embarrassingly parallel
XLA; the greedy left-to-right commit is inherently serial (each commit moves
the scan past the match). On TPU the right tool for a byte-serial, branchy
loop is a Pallas kernel with VMEM-resident data — the same role the
hand-written asm inner loop plays in the reference decoder
(/root/reference/lib/decompress/huf_decompress_amd64.S): the hot serial loop,
done native.

The kernel emits the COMPLETE seqstore for each block: (litLength, offset,
matchLength) triples, backward-extended matches, and the compacted literal
bytes (copied run-by-run with 128-lane vector blends). This replaces the
scatter/gather-heavy XLA resolve + post-pass entirely; match lengths are
computed on demand (only at visited positions) with 128-lane vector compares.

VMEM dynamic-access rules (Mosaic): indices must be provably 128-aligned, so
every dynamic read loads an aligned window and realigns with a dynamic
pltpu.roll; scalar reads/writes use aligned loads + lane-select blends.

Commit rule (ops.match semantics + host-oracle backward extension): at
position ip with candidate c, take iff lcp(ip, c, vl - ip) >= 4 and
ip < vl - 8; extend backward while prior bytes match (down to the previous
match end); advance past the match, else by 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 128          # compare/copy vector width (bytes)
PAD = 2 * _CH      # caller pads the byte rows by this much


def _extract_kernel(vl_ref, bytes_ref, cand_ref, nxt_ref,
                    ll_ref, off_ref, ml_ref, lit_ref, nb_ref, nblit_ref):
    cap = ll_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _CH), 1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * _CH), 1)
    vl = jnp.sum(jnp.where(lane == 0, vl_ref[0, 0:1, :], 0))

    ll_ref[...] = jnp.zeros_like(ll_ref)
    off_ref[...] = jnp.zeros_like(off_ref)
    ml_ref[...] = jnp.zeros_like(ml_ref)

    def load_window(ref, idx):
        """(1, _CH) i32 of ref[0, 0, idx : idx + _CH] (idx arbitrary)."""
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

    def copy_run(r, src, length):
        """lit_ref[0,0,r:r+length] = bytes_ref[0,0,src:src+length]."""
        def cond(off):
            return off < length

        def body(off):
            chunk = load_window(bytes_ref, src + off)          # (1, _CH)
            dpos = r + off
            dbase = pl.multiple_of((dpos // _CH) * _CH, _CH)
            doff = dpos - dbase
            wide = jnp.concatenate(
                [chunk, jnp.zeros((1, _CH), jnp.int32)], axis=1)
            rolled = pltpu.roll(wide, doff, axis=1)
            win = lit_ref[0, 0:1, pl.ds(dbase, 2 * _CH)]
            nvalid = jnp.minimum(length - off, _CH)
            m = (lane2 >= doff) & (lane2 < doff + nvalid)
            lit_ref[0, 0:1, pl.ds(dbase, 2 * _CH)] = jnp.where(m, rolled, win)
            return off + _CH

        jax.lax.while_loop(cond, body, jnp.int32(0))

    limit_pos = vl - 8

    def cond(st):
        ip, anchor, k, r = st
        return (ip < limit_pos) & (k < cap)

    def body(st):
        ip, anchor, k, r = st
        c = load_scalar(cand_ref, ip)
        l = jax.lax.cond(c >= 0,
                         lambda: lcp(ip, c, vl - ip),
                         lambda: jnp.int32(0))
        take = l >= 4
        # jump table: next position whose candidate matches 4 bytes — skips
        # bytewise stepping through unmatchable regions (output-identical)
        nxt = load_scalar(nxt_ref, jnp.minimum(ip + 1, limit_pos))

        def committed(_):
            d = ip - c
            # backward extension down to the previous match end
            def bcond(s):
                return (s > anchor) & (s > d) & \
                    (load_scalar(bytes_ref, s - 1) ==
                     load_scalar(bytes_ref, s - 1 - d))
            def bbody(s):
                return s - 1
            s = jax.lax.while_loop(bcond, bbody, ip)
            ll = s - anchor
            ml = l + (ip - s)
            copy_run(r, anchor, ll)
            store_scalar(ll_ref, k, ll)
            store_scalar(off_ref, k, d)
            store_scalar(ml_ref, k, ml)
            return (ip + l, ip + l, k + 1, r + ll)

        def skipped(_):
            return (jnp.maximum(nxt, ip + 1), anchor, k, r)

        return jax.lax.cond(take, committed, skipped, None)

    ip, anchor, k, r = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    # trailing literals
    tail = jnp.maximum(vl - anchor, 0)
    copy_run(r, anchor, tail)
    nb_ref[...] = jnp.full_like(nb_ref, k)
    nblit_ref[...] = jnp.full_like(nblit_ref, r + tail)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def extract_compact(blocks_padded: jax.Array, cands_padded: jax.Array,
                    nxt_padded: jax.Array, valid_lens: jax.Array, cap: int,
                    interpret: bool = False):
    """blocks_padded: int32[B, N+PAD] (widened bytes, zero tail);
    cands_padded: int32[B, N+PAD] (candidate index or -1, padded);
    nxt_padded: int32[B, N+PAD] (next 4-byte-match position jump table);
    valid_lens: int32[B].

    Returns (ll, off, ml int32[B, cap], lits int32[B, N+PAD],
             nb int32[B], nb_lit int32[B])."""
    B, n_pad = blocks_padded.shape
    vl3 = jnp.broadcast_to(valid_lens.reshape(B, 1, 1).astype(jnp.int32),
                           (B, 1, _CH))
    b3 = blocks_padded.reshape(B, 1, n_pad)
    c3 = cands_padded.reshape(B, 1, n_pad)
    x3 = nxt_padded.reshape(B, 1, n_pad)

    def spec(width):
        return pl.BlockSpec((1, 1, width), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[spec(_CH), spec(n_pad), spec(n_pad), spec(n_pad)],
        out_specs=[spec(cap), spec(cap), spec(cap), spec(n_pad),
                   spec(_CH), spec(_CH)],
    )
    ll, off, ml, lits, nb, nblit = pl.pallas_call(
        _extract_kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, _CH), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, _CH), jnp.int32),
        ],
    )(vl3, b3, c3, x3)
    return (ll[:, 0], off[:, 0], ml[:, 0], lits[:, 0],
            nb[:, 0, 0], nblit[:, 0, 0])
