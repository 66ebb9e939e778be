"""Parallel backward-bitstream packing on device.

THE shared entropy primitive (SURVEY.md §7.2): given per-field (value, nbits)
in forward write order, produce the packed little-endian bitstream that
format.bitstream.BitWriter would produce serially — via exclusive prefix-sum
of bit widths + split scatter-OR into u32 words. Fields never overlap, so
scatter-add == scatter-or.

Each field must satisfy nbits <= 31 and value < 2^nbits (masking applied).
The caller appends the closing sentinel bit by passing a final (1, 1) field,
mirroring BIT_closeCStream (/root/reference/lib/common/bitstream.h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_bits(values: jax.Array, nbits: jax.Array, out_words: int
              ) -> tuple[jax.Array, jax.Array]:
    """values/nbits: int32[m] (entries with nbits==0 are skipped).

    Returns (words uint32[out_words] little-endian bit container,
             total_bits int32). Caller turns words into bytes with
    ceil(total_bits / 8) length.
    """
    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    mask = (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1)
    v = values & mask

    offs = jnp.cumsum(nbits) - nbits  # exclusive prefix sum
    total_bits = offs[-1] + nbits[-1] if nbits.shape[0] else jnp.int32(0)

    word = (offs >> 5).astype(jnp.int32)
    shift = (offs & 31).astype(jnp.uint32)
    low = v << shift
    # high part: bits spilling into the next word; shift==0 => no spill
    high = jnp.where(shift == 0, jnp.uint32(0),
                     v >> (jnp.uint32(32) - shift))
    active = nbits > 0
    word_lo = jnp.where(active, word, out_words)
    word_hi = jnp.where(active, word + 1, out_words)

    words = jnp.zeros(out_words, dtype=jnp.uint32)
    words = words.at[word_lo].add(low, mode="drop")
    words = words.at[word_hi].add(high, mode="drop")
    return words, total_bits


def pack_bits_gather(values: jax.Array, nbits: jax.Array, out_words: int,
                     k_max: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gather-flavor bitpack: same contract as pack_bits, but assembled
    per-output-word with searchsorted + a K-field OR window instead of
    scatter-adds (TPU scatters serialize; gathers vectorize).

    Returns (words u32[out_words], total_bits i32, overflow bool). overflow
    is True when some word is touched by more than k_max fields (possible
    only with runs of zero-width fields); the caller must fall back then.
    """
    m = values.shape[0]
    values = values.astype(jnp.uint32)
    nbits = nbits.astype(jnp.int32)
    mask = (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1)
    v = values & mask

    offs = jnp.cumsum(nbits) - nbits            # exclusive start bit
    total_bits = jnp.where(m > 0, offs[-1] + nbits[-1], 0).astype(jnp.int32)

    w = jnp.arange(out_words, dtype=jnp.int32)
    bit0 = w * 32
    # last field with off <= bit0 may cross into this word
    f0 = jnp.searchsorted(offs, bit0, side="right").astype(jnp.int32) - 1
    f0 = jnp.maximum(f0, 0)

    acc = jnp.zeros(out_words, dtype=jnp.uint32)
    for k in range(k_max):
        j = jnp.minimum(f0 + k, m - 1)
        off = offs[j]
        nb = nbits[j]
        val = v[j]
        rel = off - bit0                         # may be negative (crossing)
        inside = (off + nb > bit0) & (off < bit0 + 32) & (nb > 0)
        lsh = jnp.clip(rel, 0, 31).astype(jnp.uint32)
        rsh = jnp.clip(-rel, 0, 31).astype(jnp.uint32)
        contrib = jnp.where(rel >= 0, val << lsh, val >> rsh)
        acc = acc | jnp.where(inside, contrib, jnp.uint32(0))

    # overflow detection: fields beginning inside each word (+1 for the
    # crossing field) must fit the K window. Pure zero-width tail padding is
    # excluded; interior zero-width fields are counted conservatively (may
    # force an unnecessary fallback, never a wrong stream).
    f_end = jnp.searchsorted(offs, bit0 + 32, side="left").astype(jnp.int32)
    idx = jnp.arange(m, dtype=jnp.int32)
    last_nz = jnp.max(jnp.where(nbits > 0, idx, -1))
    per_word = jnp.minimum(f_end, last_nz + 1) - jnp.minimum(f0, last_nz + 1)
    overflow = jnp.any(per_word > k_max)
    return acc, total_bits, overflow


def words_to_bytes_np(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side finalization: u32 LE words -> exact byte string."""
    nbytes = (int(total_bits) + 7) // 8
    return words.astype("<u4").tobytes()[:nbytes]


def close_stream_np(words: np.ndarray, total_bits: int) -> bytes:
    """Append the sentinel 1-bit on host (when not packed as a field)."""
    nbytes = (int(total_bits)) // 8
    rem = int(total_bits) & 7
    raw = bytearray(words.astype("<u4").tobytes()[: nbytes + 1])
    if rem == 0:
        if len(raw) == nbytes:
            raw.append(0)
        raw = raw[: nbytes + 1]
        raw[nbytes] = 1
    else:
        raw = raw[: nbytes + 1]
        raw[nbytes] = (raw[nbytes] & ((1 << rem) - 1)) | (1 << rem)
    return bytes(raw)
