"""TPU encoder pipeline v3: device-resident, transfer-minimal.

The host link (PCIe / tunnel) is the scarcest resource, so the pipeline is
structured around it (SURVEY.md §7; the TPU analog of the reference keeping
hot data in L1):

  h2d:   raw input blocks (unavoidable) + per-block entropy tables (~10 KB)
  device program A (analyze): match extraction -> seqstore compaction ->
         repcode assignment -> code conversion -> ALL histograms. Only a
         ~4.6 KB/block stats vector is fetched; the big per-sequence arrays
         stay resident on device.
  host:  entropy planning from histograms alone (exact sizes — per-stream
         literal bit counts come from hist @ nbBits), table builds.
  device program B (pack): FSE + Huffman bit-packing (1 or 4 streams) and
         byte compaction into fixed, left-aligned, zero-padded regions.
  d2h:   one region buffer per batch; content ≈ compressed bytes, padding
         compresses to ~nothing on the link.
  host:  frame assembly (headers + slicing + concatenation, memcpy-class).

Batches are software-pipelined (async dispatch) so device compute overlaps
host planning and link transfers.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (BLOCK_MAX_SIZE, BT_COMPRESSED, BT_RAW, BT_RLE,
                        LBT_COMPRESSED, LBT_RAW, LBT_RLE, LL_BITS, MIN_MATCH,
                        ML_BITS)
from .format import huffman
from .format.literals import (HufRepeat, _min_gain,
                              _min_literals_to_compress)
from .format.frame import write_frame_header
from .format.sequences import (FseEntropyState, _fse_bit_cost,
                               build_sequences_header_from_hists,
                               write_nbseq_header)
from .params import CParams, get_cparams
from .runtime import enable_compile_cache
from .xxhash64 import content_checksum
from .ops.seqextract import extract_batch
from .ops.fse_enc import STATE_TABLE_PAD, SYM_PAD, fse_pack_block
from .ops.huffman_enc import huf_pack_4x_block
from .ops.codes import seq_codes_block

enable_compile_cache()

# ZSTD_TPU_PIPETIME=1: accumulate wall time per pipeline phase (printed by
# tools/tpu_microbench.py); overhead-free when disabled
_PIPETIME = os.environ.get("ZSTD_TPU_PIPETIME", "") == "1"
PHASE_TIMES: dict = collections.defaultdict(float)


class _phase:
    __slots__ = ("name", "t0")

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        if _PIPETIME:
            self.t0 = time.time()

    def __exit__(self, *a):
        if _PIPETIME:
            PHASE_TIMES[self.name] += time.time() - self.t0


@functools.cache
def _engine_kind() -> str:
    """Match-extraction engine, selectable via ZSTD_TPU_ENGINE:
    'v3' (ops/fastmatch — round-2 XLA redesign), 'pallas' (serial-resolve
    kernel), 'xla' (round-1 pointer-doubling path).

    Default is measured-per-backend: on the real chip the VMEM-resident
    serial Pallas kernel currently edges out v3 end-to-end (4.3 vs
    3.6 MB/s through the tunnel, BENCH logs round 2), while on CPU the
    kernel only runs interpreted, so v3 is used there."""
    env = os.environ.get("ZSTD_TPU_ENGINE", "")
    if env in ("v3", "xla", "pallas"):
        return env
    return "pallas" if jax.default_backend() not in ("cpu",) else "v3"

_STATS_LIT_HIST = 0          # [4, 256]
_STATS_LL = 1024             # [36]
_STATS_ML = 1060             # [53]
_STATS_OF = 1113             # [32]
_STATS_TAIL = 1145           # last_codes[3], nb_seq, nb_lit, all_same, first_lit
STATS_LEN = 1152


@functools.partial(jax.jit,
                   static_argnames=("hash_log", "mls", "seq_cap", "engine"))
def _analyze_jit(blocks, valid_lens, hash_log, mls, seq_cap,
                 engine="v3"):
    """Device program A. Returns (stats i32[B, STATS_LEN], resident dict)."""
    if engine == "pallas":
        from .ops.seqextract import extract_batch_pallas
        res = extract_batch_pallas(blocks, valid_lens, hash_log, mls, seq_cap)
        lits = res["lits"]
    elif engine == "lazy":
        # levels 5-12: 8-wide sorted-bucket candidate rows + lazy deferral
        # (zstd_lazy.c row-matcher analog, ops/fastmatch.extract_block_lazy;
        # width via ZSTD_TPU_DEV_ROW_WIDTH)
        from .ops.fastmatch import extract_batch_lazy
        depth = int(os.environ.get("ZSTD_TPU_DEV_ROW_WIDTH", "8"))
        res = extract_batch_lazy(blocks, valid_lens, hash_log, mls, seq_cap,
                                 depth=depth)
        lits = jnp.take_along_axis(blocks, res["lit_idx"], axis=1)
    elif engine == "xla":
        res = extract_batch(blocks, valid_lens, hash_log, mls, seq_cap)
        lits = jnp.take_along_axis(blocks, res["lit_idx"], axis=1)
    else:
        from .ops.fastmatch import extract_batch_v3
        res = extract_batch_v3(blocks, valid_lens, hash_log, mls, seq_cap)
        lits = jnp.take_along_axis(blocks, res["lit_idx"], axis=1)

    n = blocks.shape[1]
    j = jnp.arange(n, dtype=jnp.int32)

    def per_block(block, vlen, lit_row, nb_lit, nb_seq, ll, off, ml):
        codes = seq_codes_block(ll, off, ml, nb_seq)
        seg = jnp.maximum((nb_lit + 3) // 4, 1)
        stream = jnp.clip(j // seg, 0, 3)
        lv = (j < nb_lit).astype(jnp.float32)
        # per-stream byte histogram as an MXU matmul, not a scatter-add (TPU
        # scatters serialize). Nibble-decomposed: a [n,256] one-hot costs
        # ~1 KB/byte of HBM traffic (measured 54 ms/MB); splitting the byte
        # into hi/lo nibbles gives [n,64]x[n,16] bf16 one-hots (~7x less).
        # bf16 {0,1} products are exact and the f32 accumulator is exact
        # below 2^24 >> block size, so counts stay bit-exact.
        litf = lit_row.astype(jnp.float32)
        hi = jnp.floor(litf / 16.0)
        lo = litf - 16.0 * hi
        shf = stream.astype(jnp.float32) * 16.0 + hi
        sh_oh = ((shf[:, None] ==
                  jnp.arange(64, dtype=jnp.float32)[None, :])
                 .astype(jnp.bfloat16) * lv[:, None].astype(jnp.bfloat16))
        lo_oh = (lo[:, None] ==
                 jnp.arange(16, dtype=jnp.float32)[None, :]).astype(jnp.bfloat16)
        lit_hist4 = jnp.einsum("na,nb->ab", sh_oh, lo_oh,
                               preferred_element_type=jnp.float32)
        lit_hist4 = lit_hist4.reshape(4, 256).astype(jnp.int32)
        all_same = jnp.all((block == block[0]) | (j >= vlen))
        stats = jnp.concatenate([
            lit_hist4.reshape(-1),
            codes["ll_hist"], codes["ml_hist"], codes["of_hist"],
            codes["last_codes"],
            jnp.stack([nb_seq, nb_lit, all_same.astype(jnp.int32),
                       lit_row[0].astype(jnp.int32)]),
        ])
        stats = jnp.pad(stats, (0, STATS_LEN - stats.shape[0]))
        return stats, codes["llc"], codes["mlc"], codes["ofc"], codes["ob"], codes["mlb"]

    stats, llc, mlc, ofc, ob, mlb = jax.vmap(per_block)(
        blocks, valid_lens, lits, res["nb_lit"], res["nb_seq"],
        res["ll"], res["off"], res["ml"])
    resident = dict(llc=llc, mlc=mlc, ofc=ofc, ob=ob, mlb=mlb,
                    llx=res["ll"], lits=lits, nb_lit=res["nb_lit"],
                    nb_seq=res["nb_seq"])
    return stats, resident


def _bytes_of_words(words, nbytes_valid, out_len):
    """u32[w] -> u8[out_len], zeroing bytes >= nbytes_valid."""
    raw = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)
    j = jnp.arange(raw.shape[0], dtype=jnp.int32)
    raw = jnp.where(j < nbytes_valid, raw, 0)
    return raw[:out_len]


# host plan for program B travels as ONE i32 array per block (one h2d call
# per batch instead of eight); offsets into the blob:
_PB_ST = 0
_PB_DN = _PB_ST + 3 * STATE_TABLE_PAD
_PB_DF = _PB_DN + 3 * SYM_PAD
_PB_TL = _PB_DF + 3 * SYM_PAD
_PB_NBL = _PB_TL + 3
_PB_VAL = _PB_NBL + 256
_PB_SINGLE = _PB_VAL + 256
_PB_LITRAW = _PB_SINGLE + 1
_PB_HUFUSED = _PB_LITRAW + 1
_PB_BLEN = _PB_HUFUSED + 1
PLAN_LEN = _PB_BLEN + 1


@functools.partial(jax.jit,
                   static_argnames=("cap", "out_w_fse", "seg_cap", "out_w_huf"))
def _pack_impl(llc, mlc, ofc, llx, mlb, ob, nb_seqs, lits, nb_lits,
               plan_blob,
               cap, out_w_fse, seg_cap, out_w_huf):
    n_lit_region = lits.shape[1]

    def per_block(llc_, mlc_, ofc_, llx_, mlb_, ob_, nb_seq, lit_row, nb_lit,
                  pb):
        st = pb[_PB_ST:_PB_DN].reshape(3, STATE_TABLE_PAD)
        dn = pb[_PB_DN:_PB_DF].reshape(3, SYM_PAD)
        df = pb[_PB_DF:_PB_TL].reshape(3, SYM_PAD)
        tl = pb[_PB_TL:_PB_NBL]
        nb_lut = pb[_PB_NBL:_PB_VAL]
        val_lut = pb[_PB_VAL:_PB_SINGLE]
        single = pb[_PB_SINGLE] > 0
        lit_raw = pb[_PB_LITRAW] > 0
        fse_words, fse_bits, _ = fse_pack_block(
            llc_[:cap], mlc_[:cap], ofc_[:cap], llx_[:cap], mlb_[:cap],
            ob_[:cap], jnp.minimum(nb_seq, cap), st, dn, df, tl,
            cap, out_w_fse)
        huf_words, huf_bits, _ = huf_pack_4x_block(
            lit_row, nb_lit, nb_lut, val_lut, seg_cap, out_w_huf,
            single=single)
        fse_nb = (fse_bits + 7) // 8
        huf_nb = (huf_bits + 7) // 8
        # stream buffers are sized for typical densities; a block whose
        # stream overflows its buffer is flagged and stored raw by the host
        overflow = (fse_nb > out_w_fse * 4) | jnp.any(huf_nb > out_w_huf * 4)
        pieces = [_bytes_of_words(fse_words, fse_nb, out_w_fse * 4)]
        for s in range(4):
            pieces.append(_bytes_of_words(huf_words[s], huf_nb[s],
                                          out_w_huf * 4))
        out = jnp.concatenate(pieces)
        j = jnp.arange(n_lit_region, dtype=jnp.int32)
        raw_lits = jnp.where(lit_raw & (j < nb_lit), lit_row,
                             0).astype(jnp.uint8)
        sizes = jnp.concatenate([
            fse_nb.reshape(1), huf_nb,
            overflow.astype(jnp.int32).reshape(1)])
        return out, sizes, raw_lits

    out, sizes, raw_lits = jax.vmap(per_block)(
        llc, mlc, ofc, llx, mlb, ob, nb_seqs, lits, nb_lits, plan_blob)

    # ---- device-side compaction: the padded per-block regions above are
    # ~1.7 MB per 1 MB batch, and the tunnel d2h is the pipeline's scarcest
    # resource — so valid bytes are packed tight ON DEVICE and the host
    # fetches only a prefix of this buffer. Piece order per block:
    # [fse, huf0..huf3, raw_lits]; a zero-size (gated) piece writes its
    # window at the same start as its successor, which overwrites it.
    B = out.shape[0]
    Wf = out_w_fse * 4
    Wh = out_w_huf * 4
    L = n_lit_region
    singles_v = plan_blob[:, _PB_SINGLE] > 0
    lit_raw_v = plan_blob[:, _PB_LITRAW] > 0
    huf_used_v = plan_blob[:, _PB_HUFUSED] > 0
    blens_v = plan_blob[:, _PB_BLEN]
    overflow_v = sizes[:, 5] > 0
    fse_sz = jnp.where(nb_seqs > 0, sizes[:, 0], 0)
    s_idx = jnp.arange(4, dtype=jnp.int32)[None, :]
    huf_gate = huf_used_v[:, None] & ((s_idx == 0) | ~singles_v[:, None])
    huf_sz = jnp.where(huf_gate, sizes[:, 1:5], 0)
    raw_sz = jnp.where(lit_raw_v, nb_lits, 0)
    # pre-gate blocks that cannot compress: host stores them raw/RLE and
    # their stream bytes never cross the link
    est = fse_sz + huf_sz.sum(axis=1) + raw_sz + 16
    zeroed = overflow_v | (est >= blens_v)
    g = (~zeroed).astype(jnp.int32)
    piece_sz = jnp.concatenate(
        [(fse_sz * g)[:, None], huf_sz * g[:, None], (raw_sz * g)[:, None]],
        axis=1)                                   # [B, 6]
    flat_sz = piece_sz.reshape(-1)
    # the [B, 7] sizes table rides at the head of the compact buffer, so
    # ONE d2h prefix fetch carries sizes AND streams (the separate tiny
    # sizes fetch costs a full tunnel round-trip per batch otherwise)
    hdr_len = B * 7 * 4
    dst = jnp.cumsum(flat_sz) - flat_sz + hdr_len  # exclusive starts
    capp = hdr_len + B * (Wf + 4 * Wh + L) + max(Wf, Wh, L) + 8
    buf = jnp.zeros(capp, jnp.uint8)
    sizes2 = jnp.concatenate([sizes, zeroed.astype(jnp.int32)[:, None]],
                             axis=1)              # [B, 7]
    hdr = jax.lax.bitcast_convert_type(sizes2, jnp.uint8).reshape(-1)
    buf = jax.lax.dynamic_update_slice(buf, hdr, (0,))
    pi = 0
    for j in range(B):
        windows = [out[j, 0:Wf]]
        for s in range(4):
            windows.append(out[j, Wf + s * Wh : Wf + (s + 1) * Wh])
        windows.append(raw_lits[j])
        for w in windows:
            buf = jax.lax.dynamic_update_slice(buf, w, (dst[pi],))
            pi += 1
    return buf, sizes2


@functools.lru_cache(maxsize=64)
def _prefix_fetcher(nbytes: int):
    """Tiny cached program: fetch the first nbytes of the compact buffer."""
    return jax.jit(lambda x: jax.lax.dynamic_slice(x, (0,), (nbytes,)))


def _pad_ct(ct) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    st = np.zeros(STATE_TABLE_PAD, dtype=np.int32)
    st[: len(ct.state_table)] = ct.state_table
    dn = np.zeros(SYM_PAD, dtype=np.int32)
    dn[: len(ct.delta_nb_bits)] = ct.delta_nb_bits
    df = np.zeros(SYM_PAD, dtype=np.int32)
    df[: len(ct.delta_find_state)] = ct.delta_find_state
    return st, dn, df, ct.table_log


def _seq_cap_bucket(max_seq: int) -> int:
    for c in (1024, 2048, 4096, 8192, 16384, 32768):
        if max_seq <= c:
            return c
    return 32768


@dataclasses.dataclass
class _LitPlan:
    kind: str                 # 'raw' | 'rle' | 'huf'
    single: bool = False
    tree_desc: bytes = b""
    stream_sizes: tuple = ()  # exact sizes (1 entry if single)
    c_size: int = 0           # tree + (jump) + streams
    ct: "huffman.HufCTable | None" = None
    n_lit: int = 0
    first_byte: int = 0


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


def _raw_lit_header(n: int) -> bytes:
    fl = 1 + (n > 31) + (n > 4095)
    if fl == 1:
        return bytes([LBT_RAW | ((n << 3) & 0xFF)])
    if fl == 2:
        return (LBT_RAW + (1 << 2) + (n << 4)).to_bytes(2, "little")
    return (LBT_RAW + (3 << 2) + (n << 4)).to_bytes(3, "little")


def _rle_lit_section(n: int, byte: int) -> bytes:
    fl = 1 + (n > 31) + (n > 4095)
    if fl == 1:
        hdr = bytes([LBT_RLE + ((n << 3) & 0xFF)])
    elif fl == 2:
        hdr = (LBT_RLE + (1 << 2) + (n << 4)).to_bytes(2, "little")
    else:
        hdr = (LBT_RLE + (3 << 2) + (n << 4)).to_bytes(3, "little")
    return hdr + bytes([byte])


@dataclasses.dataclass
class TpuCompressor:
    """Batched, device-resident block compressor (level 1/2 class)."""
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

        # software pipeline over batches: dispatch A eagerly, then per batch
        # plan + dispatch B, then fetch + assemble (async dispatch overlaps)
        batches = []
        for bs in range(0, nb_blocks, self.batch_blocks):
            be = min(bs + self.batch_blocks, nb_blocks)
            batches.append((bs, be))

        WINDOW = 3
        stageA: dict[int, tuple] = {}
        stageB: dict[int, tuple] = {}
        payloads: list[tuple[bytes, int, int]] = []
        # d2h transfers run on a worker thread so the link overlaps device
        # compute and host planning (the tunnel serializes the MAIN thread's
        # blocking fetches otherwise — measured 1.2 s of an 8 MB run)
        import concurrent.futures
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

        def dispatchA(k):
            with _phase("A:prep+h2d+dispatch"):
                bs, be = batches[k]
                bsz = be - bs
                blocks = np.zeros((bsz, block_size), dtype=np.uint8)
                lens = np.zeros(bsz, dtype=np.int32)
                for j, bi in enumerate(range(bs, be)):
                    s = bi * block_size
                    e = min(s + block_size, n)
                    blocks[j, : e - s] = arr[s:e]
                    lens[j] = e - s
                # strategy >= greedy (levels 5+): the lazy device engine;
                # below that the fast-class engine (measured per backend)
                eng = "lazy" if cparams.strategy >= 3 else _engine_kind()
                if os.environ.get("ZSTD_TPU_ENGINE"):
                    eng = _engine_kind()
                stats, resident = _analyze_jit(
                    jnp.asarray(blocks), jnp.asarray(lens),
                    cparams.hash_log, min(max(cparams.min_match, 4), 8),
                    max(block_size // 8, 8), engine=eng)
                stageA[k] = (lens, pool.submit(np.asarray, stats), resident)

        try:
            for k in range(len(batches)):
                dispatchA(k)
                if k >= WINDOW - 1:
                    self._planB(k - WINDOW + 1, stageA, stageB, block_size,
                                cparams, pool)
                if k >= WINDOW:
                    payloads += self._finalize(k - WINDOW, stageA, stageB,
                                               arr, batches, block_size,
                                               cparams)
            for k in range(max(len(batches) - WINDOW + 1, 0), len(batches)):
                self._planB(k, stageA, stageB, block_size, cparams, pool)
            for k in range(max(len(batches) - WINDOW, 0), len(batches)):
                payloads += self._finalize(k, stageA, stageB, arr, batches,
                                           block_size, cparams)
        finally:
            pool.shutdown(wait=False)

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
    def compress_resident(self, data: bytes) -> int:
        """Device-resident encode: run both device programs (analyze +
        pack) over the whole input with the packed streams left ON DEVICE.
        Only the per-batch stats vectors (needed for host entropy
        planning) and the tiny [B, 7] sizes headers cross the link — the
        compressed stream bytes never do. Returns the total compressed
        payload bytes (sum of device-reported stream sizes).

        This is the encode mirror of device_decompress_resident: the
        steady-state number a PCIe-attached deployment would see from the
        device compute + planning loop, with the output d2h (physically
        capped by this environment's ~20-30 MB/s tunnel) excluded."""
        n = len(data)
        cparams = get_cparams(self.level, n)
        if n == 0:
            return 0
        block_size = min(1 << cparams.window_log, BLOCK_MAX_SIZE)
        nb_blocks = (n + block_size - 1) // block_size
        arr = np.frombuffer(data, dtype=np.uint8)
        batches = [(bs, min(bs + self.batch_blocks, nb_blocks))
                   for bs in range(0, nb_blocks, self.batch_blocks)]

        import concurrent.futures
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        stageA: dict[int, tuple] = {}
        compacts: list = []
        total = 0

        def dispatchA(k):
            bs, be = batches[k]
            bsz = be - bs
            blocks = np.zeros((bsz, block_size), dtype=np.uint8)
            lens = np.zeros(bsz, dtype=np.int32)
            for j, bi in enumerate(range(bs, be)):
                s = bi * block_size
                e = min(s + block_size, n)
                blocks[j, : e - s] = arr[s:e]
                lens[j] = e - s
            eng = "lazy" if cparams.strategy >= 3 else _engine_kind()
            if os.environ.get("ZSTD_TPU_ENGINE"):
                eng = _engine_kind()
            stats, resident = _analyze_jit(
                jnp.asarray(blocks), jnp.asarray(lens),
                cparams.hash_log, min(max(cparams.min_match, 4), 8),
                max(block_size // 8, 8), engine=eng)
            stageA[k] = (lens, pool.submit(np.asarray, stats), resident)

        def planB(k):
            lens, stats_fut, resident = stageA[k]
            stats = stats_fut.result()
            plans, blob, cap, out_w_fse, seg_cap, out_w_huf = \
                self._build_plans(stats, lens, cparams.strategy, block_size)
            r = resident
            compact, sizes = _pack_impl(
                r["llc"], r["mlc"], r["ofc"], r["llx"], r["mlb"], r["ob"],
                r["nb_seq"], r["lits"], r["nb_lit"], jnp.asarray(blob),
                cap, out_w_fse, seg_cap, out_w_huf)
            B = len(plans)
            hdr_d = _prefix_fetcher(B * 7 * 4)(compact)
            compacts.append((plans, compact, hdr_d))
            del stageA[k]

        try:
            WINDOW = 3
            for k in range(len(batches)):
                dispatchA(k)
                if k >= WINDOW - 1:
                    planB(k - WINDOW + 1)
            for k in range(max(len(batches) - WINDOW + 1, 0), len(batches)):
                planB(k)
            for plans, compact, hdr_d in compacts:
                sizes = np.asarray(hdr_d).view(np.int32).reshape(
                    len(plans), 7)
                _, tot = self._region_metas(plans, sizes)
                total += tot
                compact.block_until_ready()
        finally:
            pool.shutdown(wait=False)
        return total

    # ------------------------------------------------------------------
    def device_stage_mbps(self, data: bytes, reps: int = 3) -> float:
        """Device-compute stage rate: the two jitted programs (analyze +
        pack) timed alone with block_until_ready — inputs pre-staged on
        device, host entropy planning and all transfers excluded. This is
        the falsifiable measurement behind the PARITY silicon-rate claim
        (VERDICT r4 item 5): what the device itself sustains when the link
        is not in the loop."""
        n = len(data)
        if n == 0:
            return 0.0
        cparams = get_cparams(self.level, n)
        block_size = min(1 << cparams.window_log, BLOCK_MAX_SIZE)
        nb_blocks = (n + block_size - 1) // block_size
        arr = np.frombuffer(data, dtype=np.uint8)
        batches = [(bs, min(bs + self.batch_blocks, nb_blocks))
                   for bs in range(0, nb_blocks, self.batch_blocks)]
        eng = "lazy" if cparams.strategy >= 3 else _engine_kind()
        if os.environ.get("ZSTD_TPU_ENGINE"):
            eng = _engine_kind()
        mls = min(max(cparams.min_match, 4), 8)
        seq_cap = max(block_size // 8, 8)

        dev_in = []
        for bs, be in batches:
            bsz = be - bs
            blocks = np.zeros((bsz, block_size), dtype=np.uint8)
            lens = np.zeros(bsz, dtype=np.int32)
            for j, bi in enumerate(range(bs, be)):
                s = bi * block_size
                e = min(s + block_size, n)
                blocks[j, : e - s] = arr[s:e]
                lens[j] = e - s
            dev_in.append((jax.device_put(jnp.asarray(blocks)),
                           jax.device_put(jnp.asarray(lens)), lens))

        def run_A():
            outs = [_analyze_jit(b, l, cparams.hash_log, mls, seq_cap,
                                 engine=eng) for b, l, _ in dev_in]
            for stats, _ in outs:
                stats.block_until_ready()
            return outs

        outs = run_A()                       # compile + warm
        tA = float("inf")
        for _ in range(reps):
            t0 = time.time()
            outs = run_A()
            tA = min(tA, time.time() - t0)

        pack_args = []
        for (_, _, lens_np), (stats, resident) in zip(dev_in, outs):
            plans, blob, cap, ow_fse, seg_cap, ow_huf = self._build_plans(
                np.asarray(stats), lens_np, cparams.strategy, block_size)
            pack_args.append((resident, jax.device_put(jnp.asarray(blob)),
                              cap, ow_fse, seg_cap, ow_huf))

        def run_B():
            cs = []
            for r, blob_d, cap, ow_fse, seg_cap, ow_huf in pack_args:
                compact, _ = _pack_impl(
                    r["llc"], r["mlc"], r["ofc"], r["llx"], r["mlb"],
                    r["ob"], r["nb_seq"], r["lits"], r["nb_lit"], blob_d,
                    cap, ow_fse, seg_cap, ow_huf)
                cs.append(compact)
            for compact in cs:
                compact.block_until_ready()

        run_B()                              # compile + warm
        tB = float("inf")
        for _ in range(reps):
            t0 = time.time()
            run_B()
            tB = min(tB, time.time() - t0)
        return n / (tA + tB) / 1e6

    # ------------------------------------------------------------------
    def _build_plans(self, stats, lens, strategy, block_size):
        """Host half of program B: per-block entropy planning from the
        stats vectors alone. Returns (plans, plan blob, pack shape params);
        shared by the single-chip path and the sharded zstdmt pack."""
        bsz = stats.shape[0]
        plans = []
        max_seq = 1
        blob = np.zeros((bsz, PLAN_LEN), dtype=np.int32)
        sts = blob[:, _PB_ST:_PB_DN].reshape(bsz, 3, STATE_TABLE_PAD)
        dns = blob[:, _PB_DN:_PB_DF].reshape(bsz, 3, SYM_PAD)
        dfs = blob[:, _PB_DF:_PB_TL].reshape(bsz, 3, SYM_PAD)
        tls = blob[:, _PB_TL:_PB_NBL]
        nb_luts = blob[:, _PB_NBL:_PB_VAL]
        val_luts = blob[:, _PB_VAL:_PB_SINGLE]
        singles = blob[:, _PB_SINGLE]
        lit_raw = blob[:, _PB_LITRAW]
        huf_used = blob[:, _PB_HUFUSED]
        blens_col = blob[:, _PB_BLEN]

        _t_plan = time.time() if _PIPETIME else 0
        for j in range(bsz):
            row = stats[j]
            lit_hist4 = row[:1024].reshape(4, 256).astype(np.int64)
            ll_hist = row[_STATS_LL:_STATS_LL + 36].astype(np.int64)
            ml_hist = row[_STATS_ML:_STATS_ML + 53].astype(np.int64)
            of_hist = row[_STATS_OF:_STATS_OF + 32].astype(np.int64)
            last_codes = tuple(int(x) for x in row[_STATS_TAIL:_STATS_TAIL + 3])
            nb_seq = int(row[_STATS_TAIL + 3])
            nb_lit = int(row[_STATS_TAIL + 4])
            all_same = bool(row[_STATS_TAIL + 5])
            first_lit = int(row[_STATS_TAIL + 6])
            blen = int(lens[j])

            est_fse = 0
            if nb_seq:
                lc = (last_codes[0], last_codes[1], last_codes[2])
                seq_header, fse_state, last_count = \
                    build_sequences_header_from_hists(
                        ll_hist, of_hist, ml_hist, lc, nb_seq,
                        FseEntropyState(), strategy)
                for t, ct in enumerate((fse_state.ct_ll, fse_state.ct_of,
                                        fse_state.ct_ml)):
                    s_, d_, f_, tl = _pad_ct(ct)
                    sts[j, t] = s_
                    dns[j, t] = d_
                    dfs[j, t] = f_
                    tls[j, t] = tl
                # expected bitstream bytes (sizes the single prefix fetch):
                # per-channel state bits (fractional-accuracy FSE cost) +
                # the exact extra-bit totals from the histograms
                bits = 0
                for ct, hist, xb in (
                        (fse_state.ct_ll, ll_hist, LL_BITS[:36]),
                        (fse_state.ct_ml, ml_hist, ML_BITS[:53]),
                        (fse_state.ct_of, of_hist,
                         np.arange(32, dtype=np.int64))):
                    mx_c = int(np.nonzero(hist)[0][-1])
                    sc = _fse_bit_cost(ct, hist, mx_c)
                    bits += (sc if sc is not None else nb_seq * ct.table_log)
                    bits += int(hist @ xb[: len(hist)])
                    bits += ct.table_log       # init state
                est_fse = (bits >> 3) + 16
            else:
                seq_header, last_count = write_nbseq_header(0), 0

            lp = self._plan_literals(nb_lit, lit_hist4, first_lit, strategy)
            if lp.kind == "huf":
                nb_luts[j] = lp.ct.nb_bits
                val_luts[j] = lp.ct.value
                singles[j] = lp.single
                huf_used[j] = 1
            elif lp.kind == "raw":
                lit_raw[j] = True
            blens_col[j] = blen
            # host-side byte estimate of this block's device pieces, used
            # to size the single compact-prefix fetch (mirrors the device
            # pre-gate: est >= blen is stored raw, so cap at blen)
            if lp.kind == "huf":
                est_lit = sum(lp.stream_sizes)
            elif lp.kind == "raw":
                est_lit = nb_lit
            else:
                est_lit = 0
            plans.append(dict(blen=blen, nb_seq=nb_seq, nb_lit=nb_lit,
                              seq_header=seq_header, last_count=last_count,
                              lit_plan=lp, all_same=all_same,
                              first_lit=first_lit,
                              est=min(est_fse + est_lit, blen + 16)))
            max_seq = max(max_seq, nb_seq)

        cap = _seq_cap_bucket(max_seq)
        # typical-density buffer sizing (overflow -> host raw fallback):
        # ~24 bits/sequence, ~10 bits/literal
        out_w_fse = (cap * 24) // 32 + 16
        seg_cap = (block_size + 3) // 4
        out_w_huf = (seg_cap * 10) // 32 + 4
        if _PIPETIME:
            PHASE_TIMES["B:host-plan"] += time.time() - _t_plan
        return plans, blob, cap, out_w_fse, seg_cap, out_w_huf

    # ------------------------------------------------------------------
    def _planB(self, k, stageA, stageB, block_size, cparams: CParams, pool):
        lens, stats_fut, resident = stageA[k]
        with _phase("B:stats-fetch"):
            stats = stats_fut.result()   # small d2h, pulled by the worker
        plans, blob, cap, out_w_fse, seg_cap, out_w_huf = self._build_plans(
            stats, lens, cparams.strategy, block_size)
        r = resident
        with _phase("B:tables-h2d+dispatch"):
            compact, sizes = _pack_impl(
                r["llc"], r["mlc"], r["ofc"], r["llx"], r["mlb"], r["ob"],
                r["nb_seq"], r["lits"], r["nb_lit"],
                jnp.asarray(blob),
                cap, out_w_fse, seg_cap, out_w_huf)
        del sizes  # rides at the head of `compact`; never fetched alone
        stageB[k] = (plans,
                     pool.submit(self._fetch_regions, plans, compact))
        del stageA[k]

    # ------------------------------------------------------------------
    @staticmethod
    def _region_metas(plans, sizes):
        """Mirror the device-side piece gating into host offsets.
        Returns (metas, total_bytes); `sizes` is the fetched [B, 7] array."""
        metas = []
        off = 0
        for j, p in enumerate(plans):
            lp = p["lit_plan"]
            zeroed = bool(sizes[j, 6])
            fse_sz = int(sizes[j, 0]) if (p["nb_seq"] and not zeroed) else 0
            hs = []
            for t in range(4):
                used = (lp.kind == "huf") and (t == 0 or not lp.single) \
                    and not zeroed
                hs.append(int(sizes[j, 1 + t]) if used else 0)
            raw_sz = p["nb_lit"] if (lp.kind == "raw" and not zeroed) else 0
            entry = dict(fse=(off, fse_sz), zeroed=zeroed)
            off += fse_sz
            hofs = []
            for t in range(4):
                hofs.append((off, hs[t]))
                off += hs[t]
            entry["huf"] = hofs
            entry["raw"] = (off, raw_sz)
            off += raw_sz
            metas.append(entry)
        return metas, off

    @staticmethod
    def _fetch_regions(plans, compact_d):
        """Worker-thread half of finalize: ONE prefix fetch carries the
        [B, 7] sizes header and the streams; the prefix length comes from
        the host-side size estimate (re-fetched bigger if it undershot,
        which the device pre-gate makes rare)."""
        B = len(plans)
        hdr = B * 7 * 4
        est_total = sum(p["est"] for p in plans)
        step = 128 * 1024
        capp = int(compact_d.shape[0])
        nb = min(max(-(-(hdr + est_total) // step) * step, step), capp)
        fetched = np.asarray(_prefix_fetcher(nb)(compact_d))
        sizes = fetched[:hdr].view(np.int32).reshape(B, 7)
        metas, total = TpuCompressor._region_metas(plans, sizes)
        if hdr + total > nb:       # estimate undershot: fetch the real size
            nb = min(-(-(hdr + total) // step) * step, capp)
            fetched = np.asarray(_prefix_fetcher(nb)(compact_d))
        return metas, fetched[hdr : hdr + total]

    # ------------------------------------------------------------------
    def _finalize(self, k, stageA, stageB, arr, batches, block_size,
                  cparams: CParams):
        plans, fut = stageB[k]
        with _phase("C:region-join"):
            metas, compact = fut.result()
        bs, be = batches[k]
        strategy = cparams.strategy
        results = []

        for j, p in enumerate(plans):
            blen = p["blen"]
            s = (bs + j) * block_size
            src = arr[s : s + blen]
            raw = (src.tobytes(), BT_RAW, blen)
            if blen < MIN_MATCH + 1 + 8:
                results.append(raw)
                continue
            m = metas[j]
            if m["zeroed"]:
                # stream-buffer overflow, or the device's size pre-gate says
                # this block cannot beat raw: store raw/RLE, bytes never
                # crossed the link
                if p["all_same"] and blen > 1:
                    results.append((src[:1].tobytes(), BT_RLE, blen))
                else:
                    results.append(raw)
                continue
            lp = p["lit_plan"]
            nb_lit = p["nb_lit"]

            if lp.kind == "huf":
                streams = []
                for t in range(4):
                    o, sz = m["huf"][t]
                    streams.append(compact[o : o + sz].tobytes())
                if lp.single:
                    payload_l = lp.tree_desc + streams[0]
                else:
                    jump = b"".join(len(x).to_bytes(2, "little")
                                    for x in streams[:3])
                    payload_l = lp.tree_desc + jump + b"".join(streams)
                if len(payload_l) != lp.c_size:
                    results.append(raw)  # defensive
                    continue
                lit_section = _lit_header(LBT_COMPRESSED, nb_lit, lp.c_size,
                                          lp.single) + payload_l
            elif lp.kind == "rle":
                lit_section = _rle_lit_section(nb_lit, lp.first_byte)
            else:
                o, sz = m["raw"]
                lit_section = _raw_lit_header(nb_lit) + \
                    compact[o : o + sz].tobytes()

            if p["nb_seq"]:
                o, fse_nb = m["fse"]
                bitstream = compact[o : o + fse_nb].tobytes()
                if p["last_count"] and (p["last_count"] + fse_nb) < 4:
                    results.append(raw)
                    continue
                seq_section = p["seq_header"] + bitstream
            else:
                seq_section = p["seq_header"]

            payload = lit_section + seq_section
            if len(payload) >= blen - _min_gain(blen, strategy):
                if p["all_same"] and blen > 1:
                    results.append((src[:1].tobytes(), BT_RLE, blen))
                else:
                    results.append(raw)
                continue
            results.append((payload, BT_COMPRESSED, blen))
        del stageB[k]
        return results

    # ------------------------------------------------------------------
    def _plan_literals(self, n_lit: int, hist4: np.ndarray, first_lit: int,
                       strategy: int) -> _LitPlan:
        if n_lit == 0:
            return _LitPlan("raw", n_lit=0)
        if n_lit < _min_literals_to_compress(strategy, HufRepeat.NONE):
            return _LitPlan("raw", n_lit=n_lit)
        hist = hist4.sum(axis=0)
        largest = int(hist.max())
        if largest == n_lit:
            return _LitPlan("rle", n_lit=n_lit, first_byte=first_lit)
        if largest <= (n_lit >> 7) + 4:
            return _LitPlan("raw", n_lit=n_lit)
        max_symbol = int(np.nonzero(hist)[0][-1])
        huff_log = huffman.huf_optimal_table_log(huffman.HUF_TABLELOG_DEFAULT,
                                                 n_lit, max_symbol)
        ct = huffman.build_huf_ctable(hist, max_symbol, huff_log)
        try:
            tree_desc = huffman.write_tree_description(ct)
        except Exception:
            return _LitPlan("raw", n_lit=n_lit)
        if len(tree_desc) + 12 >= n_lit:
            return _LitPlan("raw", n_lit=n_lit)

        min_gain = _min_gain(n_lit, strategy)
        nbb = ct.nb_bits.astype(np.int64)
        single = n_lit < 256
        if single:
            bits = int(hist @ nbb)
            size0 = (bits + 1 + 7) // 8
            c_size = len(tree_desc) + size0
            sizes = (size0,)
        else:
            if n_lit < 12:
                return _LitPlan("raw", n_lit=n_lit)
            bits_s = hist4 @ nbb
            sizes = tuple(int((b + 1 + 7) // 8) for b in bits_s)
            if any(x > 65535 for x in sizes[:3]):
                return _LitPlan("raw", n_lit=n_lit)
            c_size = len(tree_desc) + 6 + sum(sizes)
        if c_size >= n_lit - min_gain or c_size >= n_lit - 1:
            return _LitPlan("raw", n_lit=n_lit)
        return _LitPlan("huf", single=single, tree_desc=tree_desc,
                        stream_sizes=sizes, c_size=c_size, ct=ct, n_lit=n_lit)


def compress(data: bytes, level: int = 1, checksum: bool = False,
             batch_blocks: int = 32) -> bytes:
    return TpuCompressor(level=level, checksum=checksum,
                         batch_blocks=batch_blocks).compress(data)
