"""TPU encoder pipeline: device match-finding + device entropy packing.

Stage layout (SURVEY.md §7):
  device pass 1: batched match extraction (hash → candidates → lengths →
                 pointer-doubling greedy resolve → compaction), literal
                 gather, and per-stream literal histograms.
  host:          per-block decisions with EXACT sizes (Huffman tree build,
                 FSE table build + NCount headers, raw/RLE gates) — small
                 per-block work.
  device pass 2: Huffman 4-stream literal packing + 3-state FSE sequence
                 packing (ops.huffman_enc / ops.fse_enc).
  host:          frame assembly (headers + concatenation) and checksum.

Cross-block entropy coupling (table repeat modes, carried repcodes) is
intentionally disabled in this path so every block encodes independently —
that is what makes the batch embarrassingly parallel and the multi-chip
sharding exact (SURVEY.md §2.7: zstdmt-analog block sharding). Measured cost
vs the coupled host oracle: < 2% compressed size. All frames remain
format-exact and are validated against the reference binary.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (BLOCK_MAX_SIZE, BT_COMPRESSED, BT_RAW, BT_RLE,
                        LBT_COMPRESSED, LBT_RAW, LBT_RLE, MIN_MATCH)
from .format import huffman
from .format.literals import _min_gain, _min_literals_to_compress, \
    _raw_literals, _rle_literals, HufRepeat
from .format.frame import write_frame_header
from .format.sequences import (FseEntropyState, build_sequences_header,
                               seq_to_codes_np, write_nbseq_header)
from .params import CParams, get_cparams
from .runtime import enable_compile_cache
from .xxhash64 import content_checksum

enable_compile_cache()
from .ops.seqextract import extract_batch
from .ops.fse_enc import STATE_TABLE_PAD, SYM_PAD, fse_pack_batch
from .ops.huffman_enc import huf_pack_4x_batch
from .ops.bitpack import words_to_bytes_np


@functools.partial(jax.jit, static_argnames=("hash_log", "mls", "seq_cap"))
def _extract_jit(blocks, valid_lens, hash_log, mls, seq_cap):
    res = extract_batch(blocks, valid_lens, hash_log, mls, seq_cap)
    lits = jnp.take_along_axis(blocks, res["lit_idx"], axis=1)
    res["lits"] = lits

    n = blocks.shape[1]
    j = jnp.arange(n, dtype=jnp.int32)

    def hists(lit_row, nb_lit):
        seg = jnp.maximum((nb_lit + 3) // 4, 1)
        stream = jnp.clip(j // seg, 0, 3)
        valid = (j < nb_lit).astype(jnp.int32)
        h = jnp.zeros((4, 256), dtype=jnp.int32)
        return h.at[stream, lit_row].add(valid)

    res["lit_hist4"] = jax.vmap(hists)(lits, res["nb_lit"])
    return res


def _assign_repcodes_vec(ll: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Vectorized intra-block repcode assignment.

    Rule: off_base = 1 (repeat-1) iff litLength > 0 and the offset equals the
    previous sequence's offset; otherwise off_base = offset + 3. Under this
    rule the decoder's Repeated_Offset1 before sequence i always equals
    off[i-1], so the assignment is exact and needs no sequential state. The
    first sequence never uses repcodes (no cross-block rep dependence)."""
    ob = off.astype(np.int64) + 3
    if len(off) > 1:
        is_rep1 = (ll[1:] > 0) & (off[1:] == off[:-1])
        ob[1:] = np.where(is_rep1, 1, ob[1:])
    return ob


def _pad_ct(ct) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    st = np.zeros(STATE_TABLE_PAD, dtype=np.int32)
    st[: len(ct.state_table)] = ct.state_table
    dn = np.zeros(SYM_PAD, dtype=np.int32)
    dn[: len(ct.delta_nb_bits)] = ct.delta_nb_bits
    df = np.zeros(SYM_PAD, dtype=np.int32)
    df[: len(ct.delta_find_state)] = ct.delta_find_state
    return st, dn, df, ct.table_log


@dataclasses.dataclass
class _LitPlan:
    kind: str                 # 'raw' | 'rle' | 'host1x' | 'dev4x'
    section: bytes = b""      # complete section for raw/rle/host1x
    tree_desc: bytes = b""    # for dev4x
    stream_sizes: tuple = ()  # exact per-stream sizes for dev4x
    ct: huffman.HufCTable | None = None
    n_lit: int = 0


def _seq_cap_bucket(max_seq: int) -> int:
    for cap in (1024, 4096, 16384, 32768):
        if max_seq <= cap:
            return cap
    return 32768


@dataclasses.dataclass
class TpuCompressor:
    """Batched block compressor: blocks encode independently (block-local
    matching window), batches stream through two device programs."""
    level: int = 1
    checksum: bool = False
    batch_blocks: int = 32

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
        arr = np.frombuffer(data, dtype=np.uint8)

        payloads: list[tuple[bytes, int, int]] = []
        for batch_start in range(0, nb_blocks, self.batch_blocks):
            batch_end = min(batch_start + self.batch_blocks, nb_blocks)
            payloads += self._compress_batch(arr, n, batch_start, batch_end,
                                             block_size, cparams)

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

    # ------------------------------------------------------------------
    def _compress_batch(self, arr, n, batch_start, batch_end, block_size,
                        cparams: CParams):
        bsz = batch_end - batch_start
        seq_cap = max(block_size // 4, 8)
        hash_log = cparams.hash_log
        mls = min(max(cparams.min_match, 4), 8)
        strategy = cparams.strategy

        blocks = np.zeros((bsz, block_size), dtype=np.uint8)
        lens = np.zeros(bsz, dtype=np.int32)
        for j, bi in enumerate(range(batch_start, batch_end)):
            s = bi * block_size
            e = min(s + block_size, n)
            blocks[j, : e - s] = arr[s:e]
            lens[j] = e - s

        res = jax.device_get(_extract_jit(jnp.asarray(blocks),
                                          jnp.asarray(lens),
                                          hash_log, mls, seq_cap))

        # ---- host planning ------------------------------------------------
        plans: list[dict] = []
        max_seq = 1
        for j in range(bsz):
            blen = int(lens[j])
            nb_seq = int(res["nb_seq"][j])
            nb_lit = int(res["nb_lit"][j])
            ll = res["ll"][j][:nb_seq].astype(np.int64)
            off = res["off"][j][:nb_seq].astype(np.int64)
            ml = res["ml"][j][:nb_seq].astype(np.int64)
            lits = res["lits"][j][:nb_lit].tobytes()
            hist4 = res["lit_hist4"][j].astype(np.int64)

            ob = _assign_repcodes_vec(ll, off)
            llc, ofc, mlc = seq_to_codes_np(ll, ob, ml - MIN_MATCH)
            seq_header, fse_state, last_count = build_sequences_header(
                llc, ofc, mlc, nb_seq, FseEntropyState(), strategy) \
                if nb_seq else (write_nbseq_header(0), FseEntropyState(), 0)
            lit_plan = self._plan_literals(lits, nb_lit, hist4, strategy)
            plans.append(dict(
                blen=blen, nb_seq=nb_seq, nb_lit=nb_lit, ll=ll, ob=ob,
                ml=ml, lits=lits, llc=llc, ofc=ofc, mlc=mlc,
                seq_header=seq_header, fse_state=fse_state,
                last_count=last_count, lit_plan=lit_plan))
            max_seq = max(max_seq, nb_seq)

        # ---- device pass 2 -------------------------------------------------
        cap = _seq_cap_bucket(max_seq)
        fse_in = {k: np.zeros((bsz, cap), dtype=np.int32)
                  for k in ("llc", "mlc", "ofc", "llx", "mlx", "ofx")}
        nb_seqs = np.zeros(bsz, dtype=np.int32)
        sts = np.zeros((bsz, 3, STATE_TABLE_PAD), dtype=np.int32)
        dns = np.zeros((bsz, 3, SYM_PAD), dtype=np.int32)
        dfs = np.zeros((bsz, 3, SYM_PAD), dtype=np.int32)
        tls = np.zeros((bsz, 3), dtype=np.int32)
        nb_luts = np.zeros((bsz, 256), dtype=np.int32)
        val_luts = np.zeros((bsz, 256), dtype=np.int32)
        nb_lits_dev = np.zeros(bsz, dtype=np.int32)
        for j, p in enumerate(plans):
            nseq = min(p["nb_seq"], cap)
            if nseq:
                fse_in["llc"][j, :nseq] = p["llc"]
                fse_in["mlc"][j, :nseq] = p["mlc"]
                fse_in["ofc"][j, :nseq] = p["ofc"]
                fse_in["llx"][j, :nseq] = p["ll"]
                fse_in["mlx"][j, :nseq] = p["ml"] - MIN_MATCH
                fse_in["ofx"][j, :nseq] = p["ob"]
                nb_seqs[j] = nseq
                st = p["fse_state"]
                for t, ct in enumerate((st.ct_ll, st.ct_of, st.ct_ml)):
                    s_, d_, f_, tl = _pad_ct(ct)
                    sts[j, t] = s_
                    dns[j, t] = d_
                    dfs[j, t] = f_
                    tls[j, t] = tl
            lp = p["lit_plan"]
            if lp.kind == "dev4x":
                nb_luts[j] = lp.ct.nb_bits
                val_luts[j] = lp.ct.value
                nb_lits_dev[j] = lp.n_lit

        out_w_fse = (cap * 90) // 32 + 4
        seg_cap = (block_size + 3) // 4
        out_w_huf = (seg_cap * 12) // 32 + 4

        fse_words, fse_bits = fse_pack_batch(
            *(jnp.asarray(fse_in[k]) for k in ("llc", "mlc", "ofc", "llx", "mlx", "ofx")),
            jnp.asarray(nb_seqs), jnp.asarray(sts), jnp.asarray(dns),
            jnp.asarray(dfs), jnp.asarray(tls), cap, out_w_fse)
        huf_words, huf_bits = huf_pack_4x_batch(
            jnp.asarray(res["lits"]), jnp.asarray(nb_lits_dev),
            jnp.asarray(nb_luts), jnp.asarray(val_luts), seg_cap, out_w_huf)
        fse_words = np.asarray(fse_words)
        fse_bits = np.asarray(fse_bits)
        huf_words = np.asarray(huf_words)
        huf_bits = np.asarray(huf_bits)

        # ---- host finalization ----------------------------------------------
        results = []
        for j, p in enumerate(plans):
            blen = p["blen"]
            src = blocks[j, :blen]
            raw = (src.tobytes(), BT_RAW, blen)
            if blen < MIN_MATCH + 1 + 8:
                results.append(raw)
                continue
            lp = p["lit_plan"]
            if lp.kind == "dev4x":
                streams = [words_to_bytes_np(huf_words[j, s], int(huf_bits[j, s]))
                           for s in range(4)]
                if tuple(len(s) for s in streams) != lp.stream_sizes:
                    results.append(raw)  # defensive; should not happen
                    continue
                jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
                payload4 = lp.tree_desc + jump + b"".join(streams)
                lit_section = _lit_header(LBT_COMPRESSED, lp.n_lit,
                                          len(payload4), False) + payload4
            else:
                lit_section = lp.section

            if p["nb_seq"]:
                bitstream = words_to_bytes_np(fse_words[j], int(fse_bits[j]))
                if p["last_count"] and (p["last_count"] + len(bitstream)) < 4:
                    results.append(raw)
                    continue
                seq_section = p["seq_header"] + bitstream
            else:
                seq_section = p["seq_header"]

            payload = lit_section + seq_section
            if len(payload) >= blen - _min_gain(blen, strategy):
                if blen > 1 and (src == src[0]).all():
                    results.append((bytes(src[:1]), BT_RLE, blen))
                else:
                    results.append(raw)
                continue
            results.append((payload, BT_COMPRESSED, blen))
        return results

    # ------------------------------------------------------------------
    def _plan_literals(self, lits: bytes, n_lit: int, hist4: np.ndarray,
                       strategy: int) -> _LitPlan:
        if n_lit == 0:
            return _LitPlan("raw", _raw_literals(b""))
        if n_lit < _min_literals_to_compress(strategy, HufRepeat.NONE):
            return _LitPlan("raw", _raw_literals(lits))
        hist = hist4.sum(axis=0)
        largest = int(hist.max())
        if largest == n_lit:
            return _LitPlan("rle", _rle_literals(lits))
        if largest <= (n_lit >> 7) + 4:
            return _LitPlan("raw", _raw_literals(lits))
        max_symbol = int(np.nonzero(hist)[0][-1])
        huff_log = huffman.huf_optimal_table_log(huffman.HUF_TABLELOG_DEFAULT,
                                                 n_lit, max_symbol)
        ct = huffman.build_huf_ctable(hist, max_symbol, huff_log)
        try:
            tree_desc = huffman.write_tree_description(ct)
        except Exception:
            return _LitPlan("raw", _raw_literals(lits))
        if len(tree_desc) + 12 >= n_lit:
            return _LitPlan("raw", _raw_literals(lits))

        min_gain = _min_gain(n_lit, strategy)
        if n_lit < 256:
            payload = huffman.huf_encode_1x(lits, ct)
            c_size = len(tree_desc) + len(payload)
            if c_size >= n_lit - min_gain or c_size >= n_lit - 1:
                return _LitPlan("raw", _raw_literals(lits))
            section = _lit_header(LBT_COMPRESSED, n_lit, c_size, True) \
                + tree_desc + payload
            return _LitPlan("host1x", section)

        if n_lit < 12:
            return _LitPlan("raw", _raw_literals(lits))
        # exact per-stream sizes from per-stream histograms
        nbb = ct.nb_bits.astype(np.int64)
        bits_s = hist4 @ nbb
        sizes = tuple(int((b + 1 + 7) // 8) for b in bits_s)
        if any(s > 65535 for s in sizes[:3]):
            return _LitPlan("raw", _raw_literals(lits))
        c_size = len(tree_desc) + 6 + sum(sizes)
        if c_size >= n_lit - min_gain or c_size >= n_lit - 1:
            return _LitPlan("raw", _raw_literals(lits))
        return _LitPlan("dev4x", tree_desc=tree_desc, stream_sizes=sizes,
                        ct=ct, n_lit=n_lit)


def _lit_header(h_type: int, regen: int, c_size: int, single_stream: bool) -> bytes:
    lh_size = 3 + (regen >= 1024) + (regen >= 16384)
    if lh_size == 3:
        lhc = h_type + ((0 if single_stream else 1) << 2) + (regen << 4) + (c_size << 14)
        return lhc.to_bytes(3, "little")
    if lh_size == 4:
        lhc = h_type + (2 << 2) + (regen << 4) + (c_size << 18)
        return lhc.to_bytes(4, "little")
    lhc = h_type + (3 << 2) + (regen << 4) + ((c_size & 0x3FF) << 22)
    return lhc.to_bytes(4, "little") + bytes([(c_size >> 10) & 0xFF])


def compress(data: bytes, level: int = 1, checksum: bool = False,
             batch_blocks: int = 32) -> bytes:
    return TpuCompressor(level=level, checksum=checksum,
                         batch_blocks=batch_blocks).compress(data)
