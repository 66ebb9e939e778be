"""TPU encoder pipeline: device match-finding + block assembly.

Stage layout (SURVEY.md §7):
  device: per-block match extraction (ops.seqextract) over a batch of
          128 KiB blocks — hash, candidate, match-length, greedy resolve,
          compaction, literal gather. One jitted program, B blocks per call.
  host:   entropy decisions + table builds (tiny, per block) and frame
          assembly (headers, variable-length concatenation).

The entropy bit-packing is progressively moving on-device (ops.bitpack,
ops.huffman_enc, ops.fse_enc); this module always produces format-exact
frames (validated against the reference binary).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import BLOCK_MAX_SIZE, BT_COMPRESSED, BT_RAW, BT_RLE, MIN_MATCH
from .format.block import BlockCState, _min_gain
from .format.frame import write_frame_header
from .format.literals import compress_literals
from .format.matchfinder import update_reps
from .format.sequences import SeqStore, _EmitRawBlock, write_sequences_section
from .params import CParams, get_cparams
from .xxhash64 import content_checksum
from .ops.seqextract import extract_batch


@functools.partial(jax.jit, static_argnames=("hash_log", "mls", "seq_cap"))
def _extract_jit(blocks, valid_lens, hash_log, mls, seq_cap):
    res = extract_batch(blocks, valid_lens, hash_log, mls, seq_cap)
    # gather literal bytes on device too (one dense gather)
    lits = jnp.take_along_axis(blocks, res["lit_idx"], axis=1)
    res["lits"] = lits
    return res


def _assign_repcodes(ll: np.ndarray, off: np.ndarray, reps) -> tuple[np.ndarray, tuple]:
    """Host post-pass: raw offsets -> off_base with repcode reuse, mirroring
    the decoder's update rule so both sides stay in sync."""
    n = len(off)
    ob = np.empty(n, dtype=np.int64)
    r1, r2, r3 = reps
    for i in range(n):
        d = int(off[i])
        l = int(ll[i])
        if l != 0:
            o = 1 if d == r1 else 2 if d == r2 else 3 if d == r3 else d + 3
        else:
            o = 1 if d == r2 else 2 if d == r3 else 3 if (d == r1 - 1 and d > 0) else d + 3
        ob[i] = o
        r1, r2, r3 = update_reps((r1, r2, r3), o, l)
    return ob, (r1, r2, r3)


@dataclasses.dataclass
class TpuCompressor:
    """Batched block compressor. Matching is block-local (window = block) in
    this version; the distributed layer shards batches across devices."""
    level: int = 1
    checksum: bool = False
    batch_blocks: int = 16

    def compress(self, data: bytes) -> bytes:
        n = len(data)
        cparams = get_cparams(self.level, n)
        out = bytearray(write_frame_header(n, cparams.window_log, self.checksum))
        if n == 0:
            out += (1 | (BT_RAW << 1)).to_bytes(3, "little")
            if self.checksum:
                out += content_checksum(b"").to_bytes(4, "little")
            return bytes(out)

        block_size = min(1 << cparams.window_log, BLOCK_MAX_SIZE)
        nb_blocks = (n + block_size - 1) // block_size
        seq_cap = max(block_size // 4, 8)
        hash_log = cparams.hash_log
        mls = min(max(cparams.min_match, 4), 8)

        state = BlockCState()
        payloads: list[tuple[bytes, int]] = []

        for batch_start in range(0, nb_blocks, self.batch_blocks):
            batch_end = min(batch_start + self.batch_blocks, nb_blocks)
            bsz = batch_end - batch_start
            blocks = np.zeros((bsz, block_size), dtype=np.uint8)
            lens = np.zeros(bsz, dtype=np.int32)
            for j, bi in enumerate(range(batch_start, batch_end)):
                s = bi * block_size
                e = min(s + block_size, n)
                blocks[j, : e - s] = np.frombuffer(data[s:e], dtype=np.uint8)
                lens[j] = e - s
            res = jax.device_get(_extract_jit(jnp.asarray(blocks),
                                              jnp.asarray(lens),
                                              hash_log, mls, seq_cap))
            for j, bi in enumerate(range(batch_start, batch_end)):
                blen = int(lens[j])
                src = blocks[j, :blen]
                payload, btype, state = self._encode_block(
                    res, j, src, blen, state, cparams)
                payloads.append((payload, btype, blen))

        for i, (payload, btype, blen) in enumerate(payloads):
            last = i == len(payloads) - 1
            if btype == BT_RLE:
                bh = int(last) | (BT_RLE << 1) | (blen << 3)
            else:
                bh = int(last) | (btype << 1) | (len(payload) << 3)
            out += bh.to_bytes(3, "little")
            out += payload
        if self.checksum:
            out += content_checksum(data).to_bytes(4, "little")
        return bytes(out)

    def _encode_block(self, res, j, src: np.ndarray, blen: int,
                      state: BlockCState, cparams: CParams):
        raw = (src.tobytes(), BT_RAW, state)
        if blen < MIN_MATCH + 1 + 8:
            return raw
        nb_seq = int(res["nb_seq"][j])
        nb_lit = int(res["nb_lit"][j])
        ll = res["ll"][j][:nb_seq].astype(np.int64)
        off = res["off"][j][:nb_seq].astype(np.int64)
        ml = res["ml"][j][:nb_seq].astype(np.int64)
        lits = res["lits"][j][:nb_lit].tobytes()

        ob, new_reps = _assign_repcodes(ll, off, state.reps)
        seqs = SeqStore(ll.astype(np.int32), ob.astype(np.int32),
                        (ml - MIN_MATCH).astype(np.int32), lits)
        strategy = cparams.strategy
        try:
            suspect = (nb_seq == 0) or (nb_lit // max(nb_seq, 1) >= 20)
            lit_section, next_huf = compress_literals(
                lits, state.huf, strategy, disable=False,
                suspect_uncompressible=suspect)
            seq_section, next_fse = write_sequences_section(seqs, state.fse,
                                                            strategy)
        except _EmitRawBlock:
            return raw
        payload = lit_section + seq_section
        if len(payload) >= blen - _min_gain(blen, strategy):
            if blen > 1 and (src == src[0]).all():
                return bytes(src[:1]), BT_RLE, state
            return raw
        return payload, BT_COMPRESSED, BlockCState(next_huf, next_fse, new_reps)


def compress(data: bytes, level: int = 1, checksum: bool = False) -> bytes:
    return TpuCompressor(level=level, checksum=checksum).compress(data)
