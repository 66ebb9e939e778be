"""decodecorpus analog: synthesize random VALID zstd frames directly from
spec building blocks, not by running an encoder.

Role parity: /root/reference/tests/decodecorpus.c — exercise decoder paths
our encoder never emits (treeless literals after a table, RLE sequence
tables, predefined tables with skewed data, 1X vs 4X streams, nbSeq header
boundary encodings, zero-sequence blocks, raw/RLE block mixes). Each
generated frame comes with its expected content, constructed alongside.

Frames are valid by construction: offsets never exceed accumulated history,
block content never exceeds the window/block max, literals budgets match
sequence demands.
"""

from __future__ import annotations

import numpy as np

from zstd_tpu.constants import BT_COMPRESSED, BT_RAW, BT_RLE
from zstd_tpu.format.block import BlockCState
from zstd_tpu.format.frame import write_frame_header
from zstd_tpu.format.literals import compress_literals
from zstd_tpu.format.matchfinder import resolve_offset, update_reps
from zstd_tpu.format.sequences import SeqStore, write_sequences_section
from zstd_tpu.xxhash64 import content_checksum


def _gen_literals(rng, n, flavor):
    if flavor == 0:      # skewed (compressible -> Huffman path)
        return rng.choice(np.frombuffer(b"aaaabbccdef \n", np.uint8),
                          n).astype(np.uint8).tobytes()
    if flavor == 1:      # single byte (RLE literals)
        return bytes([int(rng.integers(0, 256))]) * n
    return rng.integers(0, 256, n, np.uint8).tobytes()  # raw-ish


def _gen_block_seqs(rng, history_len, max_content, reps):
    """Random sequences valid against `history_len` bytes of prior output.
    Returns (SeqStore, content_bytes, new_reps) where content is the block's
    decoded bytes given the existing history."""
    nseq_choices = [0, 1, 2, int(rng.integers(3, 40)),
                    127, 128, int(rng.integers(129, 300))]
    nseq = nseq_choices[int(rng.integers(len(nseq_choices)))]
    flavor = int(rng.integers(0, 3))

    lls = np.zeros(nseq, np.int32)
    obs = np.zeros(nseq, np.int32)
    mbs = np.zeros(nseq, np.int32)
    lit_parts = []
    content = bytearray()
    r = tuple(reps)
    for i in range(nseq):
        ll = int(rng.choice([0, 1, 2, 3, int(rng.integers(0, 70)),
                             int(rng.integers(0, 1 << 10))]))
        if len(content) + history_len == 0 and ll == 0:
            ll = 1  # first sequence needs some history for any offset
        lit = _gen_literals(rng, ll, flavor)
        lit_parts.append(lit)
        content += lit
        hist = history_len + len(content)
        ml = int(rng.choice([3, 4, 5, int(rng.integers(3, 20)),
                             int(rng.integers(3, 130))]))
        # offset: mostly small/repcode-shaped, sometimes deep into history
        kind = int(rng.integers(0, 4))
        if kind == 0 and r[0] <= hist:
            dist = r[0]
        elif kind == 1:
            dist = int(rng.integers(1, min(hist, 64) + 1))
        else:
            dist = int(rng.integers(1, hist + 1))
        ob = _ob_for(dist, ll, r)
        # execute the match against history+content (overlap-safe bytewise)
        start = len(content) - dist
        for k in range(ml):
            src_idx = start + k
            if src_idx >= 0:
                content.append(content[src_idx])
            else:
                content.append(_HISTORY[history_len + src_idx])
        lls[i] = ll
        obs[i] = ob
        mbs[i] = ml - 3
        r = update_reps(r, ob, ll)
        if len(content) >= max_content - (1 << 11):
            nseq = i + 1
            lls, obs, mbs = lls[:nseq], obs[:nseq], mbs[:nseq]
            break
    trailing = int(rng.choice([0, 1, 8, int(rng.integers(0, 400))]))
    lit = _gen_literals(rng, trailing, flavor)
    lit_parts.append(lit)
    content += lit
    seqs = SeqStore(lls, obs, mbs, b"".join(lit_parts))
    return seqs, bytes(content), r


def _ob_for(dist, ll, r):
    if ll != 0:
        if dist == r[0]:
            return 1
        if dist == r[1]:
            return 2
        if dist == r[2]:
            return 3
    else:
        if dist == r[1]:
            return 1
        if dist == r[2]:
            return 2
        if dist == r[0] - 1 and dist > 0:
            return 3
    return dist + 3


_HISTORY = bytearray()  # module-scratch for cross-block match execution


def gen_frame(seed: int) -> tuple[bytes, bytes]:
    """One random valid frame. Returns (frame_bytes, expected_content)."""
    global _HISTORY
    rng = np.random.default_rng(seed)
    checksum = bool(rng.integers(0, 2))
    nblocks = int(rng.integers(1, 6))
    state = BlockCState()
    _HISTORY = bytearray()
    out_blocks = []

    for bi in range(nblocks):
        btype = int(rng.choice([BT_RAW, BT_RLE, BT_COMPRESSED, BT_COMPRESSED,
                                BT_COMPRESSED]))
        if btype == BT_RAW:
            n = int(rng.choice([0, 1, 17, int(rng.integers(0, 4000))]))
            payload = rng.integers(0, 256, n, np.uint8).tobytes()
            out_blocks.append((payload, BT_RAW, n))
            _HISTORY += payload
            continue
        if btype == BT_RLE:
            n = int(rng.integers(1, 3000))
            b = bytes([int(rng.integers(0, 256))])
            out_blocks.append((b, BT_RLE, n))
            _HISTORY += b * n
            continue
        seqs, content, new_reps = _gen_block_seqs(
            rng, len(_HISTORY), 64 * 1024, state.reps)
        suspect = bool(rng.integers(0, 2))
        try:
            lit_section, next_huf = compress_literals(
                seqs.literals, state.huf, int(rng.integers(1, 9)),
                disable=False, suspect_uncompressible=suspect)
            seq_section, next_fse = write_sequences_section(
                seqs, state.fse, int(rng.integers(1, 9)))
        except Exception:
            # some random shapes refuse (e.g. oversized streams): raw block
            payload = content
            out_blocks.append((payload, BT_RAW, len(payload)))
            _HISTORY += content
            continue
        payload = lit_section + seq_section
        if len(payload) >= max(len(content), 1):
            # a bloated compressed block can exceed small frames' window
            # (blockSizeMax); real encoders store raw instead — so do we
            out_blocks.append((content, BT_RAW, len(content)))
            _HISTORY += content
            continue
        out_blocks.append((payload, BT_COMPRESSED, len(content)))
        state = BlockCState(next_huf, next_fse, new_reps)
        _HISTORY += content

    expected = bytes(_HISTORY)
    # window must cover both match reach AND the largest compressed block
    # (decoders enforce cBlockSize <= min(window, 128K))
    max_payload = max((len(p) for p, _, _ in out_blocks), default=0)
    wlog = max(len(expected).bit_length(), max_payload.bit_length(), 10)
    frame = bytearray(write_frame_header(len(expected), wlog, checksum))
    if not out_blocks:
        out_blocks = [(b"", BT_RAW, 0)]
    for i, (payload, btype, clen) in enumerate(out_blocks):
        last = i == len(out_blocks) - 1
        if btype == BT_RLE:
            bh = int(last) | (BT_RLE << 1) | (clen << 3)
        else:
            bh = int(last) | (btype << 1) | (len(payload) << 3)
        frame += bh.to_bytes(3, "little")
        frame += payload
    if checksum:
        frame += content_checksum(expected).to_bytes(4, "little")
    return bytes(frame), expected
