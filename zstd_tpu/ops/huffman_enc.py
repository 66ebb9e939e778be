"""Device 4-stream Huffman literal encoding.

The TPU analog of HUF_compress4X_usingCTable
(/root/reference/lib/compress/huf_compress.c:1168): the four streams are four
parallel pack lanes per block; across B blocks that's 4B independent lanes.
Symbols are table-looked-up (gather) and bit-packed with ops.bitpack.

Byte-exact vs format.huffman.huf_encode_4x (differential-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import pack_bits


def _encode_stream_fields(lits, nb_lut, val_lut, start, seg_len, seg_cap):
    """(value, nbits) fields for one stream: symbols encoded last-to-first,
    then the sentinel (1,1), padded with (0,0)."""
    j = jnp.arange(seg_cap + 1, dtype=jnp.int32)
    byte_idx = start + seg_len - 1 - j
    in_seg = j < seg_len
    byte = lits[jnp.clip(byte_idx, 0, lits.shape[0] - 1)]
    values = jnp.where(in_seg, val_lut[byte], 0)
    nbits = jnp.where(in_seg, nb_lut[byte], 0)
    # sentinel at position seg_len
    values = jnp.where(j == seg_len, 1, values)
    nbits = jnp.where(j == seg_len, 1, nbits)
    return values.astype(jnp.int32), nbits.astype(jnp.int32)


def huf_pack_4x_block(lits, nb_lit, nb_lut, val_lut, seg_cap, out_words,
                      single=None):
    """One block: lits u8[L], nb_lit i32, LUTs i32[256].

    single (bool scalar, optional): 1-stream mode — everything goes into
    stream 0 (HUF_compress1X), streams 1-3 emit only their sentinel.
    Returns (words u32[4, out_words], total_bits i32[4], overflow bool)."""
    seg4 = (nb_lit + 3) // 4
    if single is None:
        single = jnp.bool_(False)

    def one(s):
        start = jnp.where(single, 0, s * seg4)
        len4 = jnp.where(s < 3, seg4, nb_lit - 3 * seg4)
        seg_len = jnp.where(single,
                            jnp.where(s == 0, nb_lit, 0),
                            len4)
        v, nb = _encode_stream_fields(lits, nb_lut, val_lut, start, seg_len,
                                      seg_cap)
        return pack_bits(v, nb, out_words)

    words, bits = jax.vmap(one)(jnp.arange(4, dtype=jnp.int32))
    return words, bits, jnp.bool_(False)


@functools.partial(jax.jit, static_argnames=("seg_cap", "out_words"))
def huf_pack_4x_batch(lits, nb_lits, nb_luts, val_luts, seg_cap, out_words):
    """lits u8[B, L], nb_lits i32[B], LUTs i32[B, 256]."""
    return jax.vmap(
        lambda l, n, nb, val: huf_pack_4x_block(l, n, nb, val, seg_cap, out_words)
    )(lits, nb_lits, nb_luts, val_luts)
