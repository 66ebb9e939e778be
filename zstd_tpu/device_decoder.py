"""Device decode driver: frames parsed on host, literals + sequence
execution on device.

The TPU analog of the reference decoder's split — C orchestration around
vectorized inner loops (/root/reference/lib/decompress/zstd_decompress.c:951
frame walk; huf_decompress.c + huf_decompress_amd64.S hot loops;
zstd_decompress_block.c:1001 ZSTD_execSequence):

  host:   frame/block headers, literal-section headers, Huffman table
          descriptions, FSE sequence decode + repcode resolution (byte-
          serial, a few KB per block)
  device: batched 4-stream Huffman literal decode (all streams of a block
          group in lockstep) and whole-frame sequence execution
          (ops/decode_dev.py)

Frames of any zstd encoder (including the reference binary) are accepted;
blocks whose execution exceeds the wavefront depth fall back to the host
decoder per frame.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import BLOCK_MAX_SIZE, BT_COMPRESSED, BT_RAW, BT_RLE
from .errors import Corruption, ZstdError, ZstdErrorCode
from .format import literals as litmod
from .format import sequences as sq
from .format import huffman
from .format.frame import is_skippable, parse_frame_header
from .format.matchfinder import resolve_offset, update_reps
from .ops.decode_dev import (MAX_TLOG, exec_sequences, huf_decode_streams,
                             huf_window_values)
from .runtime import enable_compile_cache
from .xxhash64 import xxh64

enable_compile_cache()

_STREAM_CAP = 36 * 1024            # bytes per Huffman stream (4X of 128K)
_GROUP = 16                        # blocks per device Huffman batch


@dataclasses.dataclass
class _LitJob:
    """One compressed-literals stream set for the device batch."""
    block_idx: int
    streams: list  # list[(bytes, regen_len)]
    sym_lut: np.ndarray
    len_lut: np.ndarray


def _expand_lut(dt: huffman.HufDTable) -> tuple[np.ndarray, np.ndarray]:
    """Scale a 2^tlog LUT up to the fixed 2^MAX_TLOG device window."""
    shift = MAX_TLOG - dt.table_log
    idx = np.arange(1 << MAX_TLOG) >> shift
    return dt.symbol[idx].astype(np.int32), dt.length[idx].astype(np.int32)


@functools.partial(jax.jit, static_argnames=("max_syms",))
def _huf_batch(stream_bytes, start_bits, n_syms, sym_luts, len_luts,
               max_syms=_STREAM_CAP):
    wins = jax.vmap(huf_window_values)(stream_bytes)
    return huf_decode_streams(wins, start_bits, n_syms, sym_luts, len_luts,
                              max_syms)


class _DeviceUnsupported(Exception):
    """Block shape the device kernels cannot take; frame falls back to the
    host decoder (module contract: never a user-facing error by itself)."""


def _decode_literals_device(jobs: list[_LitJob]) -> dict[int, bytes]:
    """Batch all compressed-literal streams on device; returns per-block
    literal bytes. All groups are dispatched asynchronously before any
    result is fetched, so device Huffman decode overlaps host work."""
    out: dict[int, bytes] = {}
    lanes = []
    for j in jobs:
        for s_bytes, regen in j.streams:
            lanes.append((j, s_bytes, regen))
    res_parts: dict[int, list] = {j.block_idx: [] for j in jobs}
    pending = []  # (chunk, device result, active mask) — fetched at the end
    for g in range(0, len(lanes), 4 * _GROUP):
        chunk = lanes[g : g + 4 * _GROUP]
        L = 4 * _GROUP  # fixed lane count: one compile for every group
        # symbol/byte caps bucketed to the chunk's actual maxima: the decode
        # scan's step count IS the symbol cap, so a group of small streams
        # must not pay the full 36K-step program (buckets share compiles)
        mx_syms = max(regen for _, _, regen in chunk)
        mx_bytes = max(len(s) for _, s, _ in chunk)
        if mx_bytes > _STREAM_CAP:
            raise _DeviceUnsupported("literal stream exceeds device cap")
        syms_cap = min(_bucket(max(mx_syms, 1024)), _STREAM_CAP)
        if mx_syms > syms_cap:
            raise _DeviceUnsupported("literal stream exceeds device cap")
        byte_cap = min(_bucket(max(mx_bytes, 1024)), _STREAM_CAP)
        sb = np.zeros((L, byte_cap), np.uint8)
        bits = np.zeros(L, np.int32)
        nsy = np.zeros(L, np.int32)
        syl = np.zeros((L, 1 << MAX_TLOG), np.int32)
        lel = np.ones((L, 1 << MAX_TLOG), np.int32)
        for i, (j, s_bytes, regen) in enumerate(chunk):
            if len(s_bytes) == 0:
                raise Corruption("literal stream size out of range")
            sb[i, : len(s_bytes)] = np.frombuffer(s_bytes, np.uint8)
            last = s_bytes[-1]
            if last == 0:
                raise Corruption("huffman stream: missing sentinel")
            bits[i] = 8 * (len(s_bytes) - 1) + (last.bit_length() - 1)
            nsy[i] = regen
            syl[i] = j.sym_lut
            lel[i] = j.len_lut
        pending.append((chunk, _huf_batch(
            jnp.asarray(sb), jnp.asarray(bits), jnp.asarray(nsy),
            jnp.asarray(syl), jnp.asarray(lel), max_syms=syms_cap)))
    for chunk, (dev_syms, dev_final) in pending:
        final = np.asarray(dev_final)
        # a well-formed backward stream ends exactly at bit 0; anything else
        # means over-read (the device gather clamps rather than trapping)
        if np.any(final[: len(chunk)] != 0):
            raise Corruption("huffman stream over-read (device decode)")
        syms = np.asarray(dev_syms)
        for i, (j, s_bytes, regen) in enumerate(chunk):
            res_parts[j.block_idx].append(syms[i, :regen].tobytes())
    for j in jobs:
        out[j.block_idx] = b"".join(res_parts[j.block_idx])
    return out


def _parse_literals_section(payload: bytes, hst: litmod.HufDecodeState):
    """Like decode_literals but WITHOUT running the Huffman streams: returns
    (kind, lit_bytes_or_None, jobs_spec, regen, consumed, next_state).
    kind: 'raw' | 'rle' | 'huf'."""
    # reuse the host parser for header/tree by decoding sizes only: call the
    # existing decoder for raw/rle, but intercept compressed modes
    if not payload:
        raise Corruption("empty block payload")
    b0 = payload[0]
    block_type = b0 & 3
    if block_type in (litmod.LBT_RAW, litmod.LBT_RLE):
        lit, nxt, used = litmod.decode_literals(payload, hst)
        return "raw", lit, None, len(lit), used, nxt
    # compressed / treeless: parse header
    size_format = (b0 >> 2) & 3
    if size_format in (0, 1):
        if len(payload) < 3:
            raise Corruption("literals header truncated")
        h = int.from_bytes(payload[:3], "little")
        regen = (h >> 4) & 0x3FF
        csize = (h >> 14) & 0x3FF
        lh = 3
        single = size_format == 0
    elif size_format == 2:
        h = int.from_bytes(payload[:4], "little")
        regen = (h >> 4) & 0x3FFF
        csize = (h >> 18) & 0x3FFF
        lh = 4
        single = False
    else:
        h = int.from_bytes(payload[:5], "little")
        regen = (h >> 4) & 0x3FFFF
        csize = (h >> 22) & 0x3FFFF
        lh = 5
        single = False
    section = payload[lh : lh + csize]
    if len(section) < csize:
        raise Corruption("literals section truncated")
    if block_type == litmod.LBT_COMPRESSED:
        nb_bits, nsym, tlog, tree_used = huffman.read_tree_description(section)
        dt = huffman.build_huf_dtable(nb_bits, nsym, tlog)
        nxt = litmod.HufDecodeState(dt)
        body = section[tree_used:]
    else:  # treeless: reuse previous table
        if hst.dtable is None:
            raise Corruption("treeless literals without a previous table")
        dt = hst.dtable
        nxt = hst
        body = section
    sym_lut, len_lut = _expand_lut(dt)
    if single:
        streams = [(body, regen)]
    else:
        if len(body) < 6:
            raise Corruption("4-stream literals: missing jump table")
        s1 = int.from_bytes(body[0:2], "little")
        s2 = int.from_bytes(body[2:4], "little")
        s3 = int.from_bytes(body[4:6], "little")
        seg = (regen + 3) // 4
        p = 6
        sizes = [s1, s2, s3, len(body) - 6 - s1 - s2 - s3]
        if sizes[3] <= 0:
            raise Corruption("4-stream literals: bad jump table")
        streams = []
        rem = regen
        for t in range(4):
            ln = min(seg, rem) if t < 3 else rem
            streams.append((body[p : p + sizes[t]], ln))
            rem -= ln
            p += sizes[t]
    return ("huf", None, (streams, sym_lut, len_lut), regen, lh + csize, nxt)


def device_decompress(data: bytes, window_log_max: int = 31) -> bytes:
    """Decode all frames with the device literal/exec kernels. Frames whose
    blocks exceed a device kernel limit fall back to the host decoder
    per frame (module contract above).

    Multi-frame inputs are software-pipelined: every frame's exec program is
    dispatched (async) before any output is fetched, so host parsing of
    frame k+1 and the d2h of frame k overlap device execution."""
    pos = 0
    if len(data) == 0:
        raise ZstdError(ZstdErrorCode.srcSize_wrong, "empty input")
    jobs = []  # ("dev", outj, ok, n, hdr, csum_pos) | ("host", content)
    while pos < len(data):
        if is_skippable(data, pos):
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            pos += 8 + size
            continue
        try:
            outj, ok, n, p, hdr = _device_decode_frame(
                data, pos, window_log_max, resident=True)
            csum_pos = p if hdr.checksum_flag else -1
            if hdr.checksum_flag:
                p += 4
            jobs.append(("dev", outj, ok, n, hdr, csum_pos))
            pos = p
        except _DeviceUnsupported:
            from .format.frame import decompress_frame
            content, pos = decompress_frame(data, pos, window_log_max)
            jobs.append(("host", content))
    out = bytearray()
    for job in jobs:
        if job[0] == "host":
            out += job[1]
            continue
        _, outj, ok, n, hdr, csum_pos = job
        if not bool(ok):
            raise Corruption("device exec: dependency depth exceeded")
        content = np.asarray(outj)[:n].tobytes()
        if hdr.frame_content_size is not None and \
                len(content) != hdr.frame_content_size:
            raise Corruption("decoded size mismatch")
        if csum_pos >= 0:
            stored = int.from_bytes(data[csum_pos : csum_pos + 4], "little")
            if stored != (xxh64(content) & 0xFFFFFFFF):
                raise ZstdError(ZstdErrorCode.checksum_wrong,
                                "content checksum mismatch")
        out += content
    return bytes(out)


@functools.partial(jax.jit, static_argnames=("n",))
def _exec_jit(lits_j, n_lit, lls_j, mls_j, off_j, n_seq, out_len, n,
              hist, hist_len):
    return exec_sequences(lits_j, n_lit, lls_j, mls_j, off_j, n_seq,
                          out_len, n, hist, hist_len)


def _bucket(n: int) -> int:
    """Pad program sizes to coarse buckets so frames of different sizes
    share compiled executables."""
    b = 4096
    while b < n:
        b *= 2
    return b


def device_decompress_resident(data: bytes, window_log_max: int = 31):
    """Decode one frame, leaving the output ON DEVICE (the production shape
    for feeding decompressed bytes straight into a device input pipeline:
    no d2h transfer, no host checksum). Returns (device uint8 array padded
    to a size bucket, content_length, ok_scalar) — callers must check
    `bool(ok_scalar)` after consuming. Multi-frame inputs take the first
    frame only."""
    if is_skippable(data, 0):
        raise ZstdError(ZstdErrorCode.prefix_unknown, "skippable frame")
    outj, ok, n, _end, _hdr = _device_decode_frame(data, 0, window_log_max,
                                                   resident=True)
    return outj, n, ok


def _device_decode_frame(data: bytes, pos: int, window_log_max: int,
                         resident: bool = False):
    hdr = parse_frame_header(data[pos:], window_log_max)
    p = pos + hdr.header_size
    hst = litmod.HufDecodeState()
    fst = sq.FseDecodeState()
    reps = (1, 4, 8)
    # sequence sections decode in C when the native library is present
    # (FSE chain + repcode resolution are byte-serial: native/decode.c
    # zt_decode_sequences); the Python mirror remains the fallback
    from .native import get_native
    nat = get_native()
    nctx = nat.dctx_new() if nat is not None else None

    blocks = []        # (content_len, lits_bytes|None, lit_job, seqs|None)
    jobs: list[_LitJob] = []
    seq_lists = []     # per block: (ll, ml, off_abs) np arrays
    lit_order = []     # per block literal source: bytes or ('dev', idx)
    total_len = 0
    bi = 0
    last = False
    try:
        while not last:
            if p + 3 > len(data):
                raise ZstdError(ZstdErrorCode.srcSize_wrong,
                                "truncated block header")
            bh = int.from_bytes(data[p : p + 3], "little")
            last = bool(bh & 1)
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            p += 3
            if btype == BT_RAW:
                raw = data[p : p + bsize]
                p += bsize
                lit_order.append(raw)
                seq_lists.append(None)
                total_len += bsize
            elif btype == BT_RLE:
                lit_order.append(data[p : p + 1] * bsize)
                seq_lists.append(None)
                p += 1
                total_len += bsize
            elif btype == BT_COMPRESSED:
                payload = data[p : p + bsize]
                p += bsize
                kind, lit, spec, regen, used, hst = _parse_literals_section(
                    payload, hst)
                if kind == "huf":
                    streams, sym_lut, len_lut = spec
                    job = _LitJob(bi, streams, sym_lut, len_lut)
                    jobs.append(job)
                    lit_order.append(("dev", bi))
                else:
                    lit_order.append(lit)
                if nctx is not None:
                    res = nat.decode_sequences(nctx, payload[used:])
                    if res is None:
                        raise Corruption("sequences section decode failed")
                    lls, mls, offs = res
                    nb = len(lls)
                else:
                    nb, fst, c2 = sq.parse_sequences_section(payload[used:], fst)
                    if nb:
                        lls, obs, mls = sq.decode_sequences(
                            payload[used + c2 :], nb, fst)
                        offs = np.zeros(nb, np.int64)
                        r = reps
                        for i in range(nb):
                            d = resolve_offset(r, int(obs[i]), int(lls[i]))
                            offs[i] = d
                            r = update_reps(r, int(obs[i]), int(lls[i]))
                        reps = r
                if nb:
                    span = int(lls.sum() + mls.sum())
                    seq_lists.append((lls.astype(np.int64),
                                      mls.astype(np.int64),
                                      offs.astype(np.int64), regen))
                    total_len += span + (regen - int(lls.sum()))
                else:
                    seq_lists.append(None)
                    total_len += regen
            else:
                raise Corruption("reserved block type")
            bi += 1

    finally:
        if nctx is not None:
            nat.dctx_free(nctx)
    # device literal decode for all huf jobs
    dev_lits = _decode_literals_device(jobs) if jobs else {}

    # assemble the frame-global literal pool and sequence arrays.
    # literal-only spans (raw/RLE blocks, trailing literals of each block)
    # become zero-match pseudo-sequences so every match's global position
    # comes out of one running (ll + ml) prefix sum on device.
    lit_pool = []
    g_ll, g_ml, g_off = [], [], []
    for idx, src in enumerate(lit_order):
        if isinstance(src, tuple):
            lit_bytes = dev_lits[src[1]]
        else:
            lit_bytes = src
        lit_pool.append(lit_bytes)
        sl = seq_lists[idx]
        if sl is None:
            if len(lit_bytes):
                g_ll.append(np.array([len(lit_bytes)], np.int64))
                g_ml.append(np.zeros(1, np.int64))
                g_off.append(np.ones(1, np.int64))
            continue
        lls, mls, offs, regen = sl
        g_ll.append(lls)
        g_ml.append(mls)
        g_off.append(offs)
        trailing = int(regen - lls.sum())
        if trailing:
            g_ll.append(np.array([trailing], np.int64))
            g_ml.append(np.zeros(1, np.int64))
            g_off.append(np.ones(1, np.int64))

    lits_all = np.frombuffer(b"".join(lit_pool), np.uint8)
    n = total_len
    if g_ll:
        ll = np.concatenate(g_ll)
        ml = np.concatenate(g_ml)
        off = np.concatenate(g_off)
    else:
        ll = np.zeros(0, np.int64)
        ml = np.zeros(0, np.int64)
        off = np.zeros(0, np.int64)

    # offset validation BEFORE exec: the device gather clamps out-of-window
    # sources instead of trapping, so a corrupt frame would otherwise decode
    # to silently-wrong bytes (host mirror: block.py 'offset beyond window')
    if len(ml):
        ends = np.cumsum(ll + ml)
        match_start = ends - ml
        win = hdr.window_size or (1 << 62)
        bad = (ml > 0) & ((off > match_start) | (off > win))
        if bool(bad.any()):
            raise Corruption("offset beyond window (device decode)")

    # pad and run the frame-global executor; pure-literal gaps BETWEEN
    # sequence blocks must appear as extra literal runs: encode them by
    # inserting zero-match sequences is unnecessary — uncovered positions
    # consume the literal pool in order, which matches block order.
    # program sizes are bucketed so frames of different sizes share
    # compiled executables.
    npad = _bucket(int(n))
    seq_cap = _bucket(max(len(ll), 1))
    lls_j = jnp.asarray(np.pad(ll, (0, seq_cap - len(ll))).astype(np.int32))
    mls_j = jnp.asarray(np.pad(ml, (0, seq_cap - len(ml))).astype(np.int32))
    off_j = jnp.asarray(np.pad(off, (0, seq_cap - len(off))).astype(np.int32))
    lits_j = jnp.asarray(np.pad(
        lits_all, (0, npad - len(lits_all))))
    outj, ok = _exec_jit(
        lits_j, jnp.int32(len(lits_all)), lls_j, mls_j, off_j,
        jnp.int32(len(ll)), jnp.int32(n), int(npad),
        jnp.zeros(1, jnp.uint8), jnp.int32(0))
    if resident:
        return outj, ok, int(n), p, hdr
    if not bool(ok):
        raise Corruption("device exec: dependency depth exceeded")
    content = np.asarray(outj)[:n].tobytes()

    if hdr.frame_content_size is not None and \
            len(content) != hdr.frame_content_size:
        raise Corruption("decoded size mismatch")
    if hdr.checksum_flag:
        stored = int.from_bytes(data[p : p + 4], "little")
        calc = xxh64(content) & 0xFFFFFFFF
        if stored != calc:
            raise ZstdError(ZstdErrorCode.checksum_wrong,
                            "content checksum mismatch")
        p += 4
    return content, p
