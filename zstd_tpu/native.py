"""ctypes loader for the native host library (native/*.c -> libzstdtpu.so).

The native library carries host-side hot loops that are inherently byte-serial
(checksums, bitstream assembly for foreign-frame decode) — the TPU analog of
the reference keeping its runtime in C while compute lives in kernels.
Builds lazily with `make -C native` if the .so is missing and a compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "zstd_tpu", "_native", "libzstdtpu.so")

_lock = threading.Lock()
_native = None
_tried = False


class _Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.zt_xxh64.restype = ctypes.c_uint64
        lib.zt_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
        lib.zt_xxh64_state_size.restype = ctypes.c_size_t
        lib.zt_xxh64_state_size.argtypes = []
        lib.zt_xxh64_reset.restype = None
        lib.zt_xxh64_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.zt_xxh64_update.restype = None
        lib.zt_xxh64_update.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_size_t]
        lib.zt_xxh64_digest.restype = ctypes.c_uint64
        lib.zt_xxh64_digest.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.zt_opt_parse.restype = ctypes.c_int64
        lib.zt_opt_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.zt_opt_parse_ctx.restype = ctypes.c_int64
        lib.zt_opt_parse_ctx.argtypes = [
            ctypes.c_void_p,
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.zt_opt_ctx_new.restype = ctypes.c_void_p
        lib.zt_opt_ctx_new.argtypes = []
        lib.zt_opt_ctx_free.restype = None
        lib.zt_opt_ctx_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "zt_opt_mcache_new"):
            lib.zt_opt_mcache_new.restype = ctypes.c_void_p
            lib.zt_opt_mcache_new.argtypes = [ctypes.c_int64]
            lib.zt_opt_mcache_free.restype = None
            lib.zt_opt_mcache_free.argtypes = [ctypes.c_void_p]
            lib.zt_opt_ctx_set_mcache.restype = None
            lib.zt_opt_ctx_set_mcache.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int]
        if hasattr(lib, "zt_opt_knob_twopass"):
            lib.zt_opt_knob_twopass.restype = None
            lib.zt_opt_knob_twopass.argtypes = [ctypes.c_int]
        lib.zt_opt_ctx_clone.restype = ctypes.c_int
        lib.zt_opt_ctx_clone.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.zt_opt_ctx_copy_prices.restype = None
        lib.zt_opt_ctx_copy_prices.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p]
        lib.zt_dctx_new.restype = ctypes.c_void_p
        lib.zt_dctx_free.argtypes = [ctypes.c_void_p]
        lib.zt_decompress_block.restype = ctypes.c_int64
        lib.zt_decompress_block.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.zt_decompress_blocks.restype = ctypes.c_int64
        lib.zt_decompress_blocks.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.zt_decode_sequences.restype = ctypes.c_int64
        lib.zt_decode_sequences.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            i32p, i32p, i32p, ctypes.c_int64]
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.zt_fast_parse.restype = ctypes.c_int64
        lib.zt_fast_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
        lib.zt_fast_fill.restype = None
        lib.zt_fast_fill.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            i32p]
        lib.zt_dfast_fill.restype = None
        lib.zt_dfast_fill.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            i32p, i32p]
        lib.zt_huf_encode.restype = ctypes.c_int64
        lib.zt_huf_encode.argtypes = [
            u8p, ctypes.c_int64, i32p, i32p, u8p, ctypes.c_int64]
        lib.zt_dfast_parse.restype = ctypes.c_int64
        lib.zt_dfast_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.zt_fse_compress_2state.restype = ctypes.c_int64
        lib.zt_fse_compress_2state.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, i32p, i64p, i64p,
            u8p, ctypes.c_int64]
        lib.zt_split_points.restype = ctypes.c_int64
        lib.zt_split_points.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p, ctypes.c_int64]
        lib.zt_huf_encode4.restype = ctypes.c_int64
        lib.zt_huf_encode4.argtypes = [
            u8p, ctypes.c_int64, i32p, i32p, u8p, ctypes.c_int64]
        lib.zt_compress_fast_frame.restype = ctypes.c_int64
        lib.zt_compress_fast_frame.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u32p, i32p, u8p, ctypes.c_int64]
        if hasattr(lib, "zt_compress_dp_frame"):
            lib.zt_compress_dp_frame.restype = ctypes.c_int64
            lib.zt_compress_dp_frame.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, u32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int64]
        if hasattr(lib, "zt_compress_row_frame"):
            lib.zt_compress_row_frame.restype = ctypes.c_int64
            lib.zt_compress_row_frame.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, u32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, i32p, u8p, u8p, i32p, ctypes.c_int,
                u8p, ctypes.c_int64]
        lib.zt_fse_build_ctable.restype = ctypes.c_int64
        lib.zt_fse_build_ctable.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, i64p, i64p]
        lib.zt_lazy_fill.restype = None
        lib.zt_lazy_fill.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.zt_lazy_parse.restype = ctypes.c_int64
        lib.zt_lazy_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32p, i32p, i32p, ctypes.c_int]
        lib.zt_lazy_fill_long.restype = None
        lib.zt_lazy_fill_long.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, i32p]
        if hasattr(lib, "zt_lz4_block_compress"):
            lib.zt_lz4_block_compress.restype = ctypes.c_int64
            lib.zt_lz4_block_compress.argtypes = [
                u8p, ctypes.c_int64, u8p, ctypes.c_int64]
            lib.zt_lz4_block_decompress.restype = ctypes.c_int64
            lib.zt_lz4_block_decompress.argtypes = [
                u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64]
            lib.zt_xxh32.restype = ctypes.c_uint32
            lib.zt_xxh32.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]
        lib.zt_row_fill.restype = None
        lib.zt_row_fill.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, u8p, u8p,
            i32p, ctypes.c_int]
        lib.zt_row_parse.restype = ctypes.c_int64
        lib.zt_row_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, i32p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32p, u8p, u8p,
            i32p, ctypes.c_int]
        lib.zt_fse_normalize.restype = ctypes.c_int64
        lib.zt_fse_normalize.argtypes = [
            i64p, ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            i32p]
        lib.zt_fse_write_ncount.restype = ctypes.c_int64
        lib.zt_fse_write_ncount.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int64]
        lib.zt_huf_build_write.restype = ctypes.c_int64
        lib.zt_huf_build_write.argtypes = [
            i64p, ctypes.c_int, ctypes.c_int, i32p, i32p, u8p,
            ctypes.c_int64, i64p]
        lib.zt_encode_sequences.restype = ctypes.c_int64
        lib.zt_encode_sequences.argtypes = [
            ctypes.c_int64, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, i32p, i64p, i64p,
            ctypes.c_int, i32p, i64p, i64p,
            ctypes.c_int, i32p, i64p, i64p,
            u8p, ctypes.c_int64]

    def xxh64(self, data: bytes, seed: int = 0) -> int:
        return self._lib.zt_xxh64(data, len(data), seed)

    def xxh64_state(self) -> ctypes.Array:
        return ctypes.create_string_buffer(self._lib.zt_xxh64_state_size())

    def xxh64_reset(self, state, seed: int = 0) -> None:
        self._lib.zt_xxh64_reset(state, seed)

    def xxh64_update(self, state, data: bytes) -> None:
        self._lib.zt_xxh64_update(state, data, len(data))

    def xxh64_digest(self, state) -> int:
        return self._lib.zt_xxh64_digest(state)

    def dctx_new(self):
        return self._lib.zt_dctx_new()

    def dctx_free(self, ctx) -> None:
        self._lib.zt_dctx_free(ctx)

    def decompress_block(self, ctx, payload: bytes, dst, dst_pos: int,
                         window_low: int, block_max: int) -> int:
        """dst: writable uint8 numpy buffer (whole frame window). Returns
        bytes produced or -1 (caller falls back to the Python decoder)."""
        import ctypes as ct
        import numpy as np
        u8p = ct.POINTER(ct.c_uint8)
        return self._lib.zt_decompress_block(
            ctx, payload, len(payload), dst.ctypes.data_as(u8p), dst_pos,
            len(dst), window_low, block_max)

    def decompress_blocks(self, ctx, src, src_off: int, dst, dst_pos: int,
                          window_size: int, block_max: int):
        """Walk ALL blocks of one frame in C. `src` is the whole input as a
        bytes object read by pointer at src_off (no slice copy). Returns
        (produced, consumed) or None (fall back to the per-block path)."""
        import ctypes as ct
        u8p = ct.POINTER(ct.c_uint8)
        consumed = ct.c_int64(0)
        base = ct.cast(ct.c_char_p(src), ct.c_void_p).value + src_off
        r = self._lib.zt_decompress_blocks(
            ctx, ct.c_void_p(base), len(src) - src_off,
            dst.ctypes.data_as(u8p), dst_pos,
            len(dst), window_size, block_max, ct.byref(consumed))
        if r < 0:
            return None
        return int(r), int(consumed.value)

    def decode_sequences(self, ctx, payload: bytes):
        """Decode one block's sequences section (FSE + repcode resolution in
        C). Returns (ll, ml, off_abs) int32 arrays or None on error."""
        import ctypes as ct
        import numpy as np
        cap = 0x7F00 + 0xFFFF + 16   # spec max nbSeq (RLE tables: 0 bits/seq)
        ll = np.empty(cap, dtype=np.int32)
        ml = np.empty(cap, dtype=np.int32)
        off = np.empty(cap, dtype=np.int32)
        i32p = ct.POINTER(ct.c_int32)
        n = self._lib.zt_decode_sequences(
            ctx, payload, len(payload),
            ll.ctypes.data_as(i32p), ml.ctypes.data_as(i32p),
            off.ctypes.data_as(i32p), cap)
        if n < 0:
            return None
        return ll[:n], ml[:n], off[:n]

    def compress_fast_frame(self, full, start: int, end: int,
                            window_size: int, block_size: int,
                            hash_log: int, accel_log: int, mls: int,
                            step0: int, strategy: int, table):
        """Whole-frame fast-path block loop in C (native/cblock.c): parse,
        entropy-code, and emit every block of [start, end) in one call.
        Returns the concatenated block bytes, or None (fall back to the
        Python loop)."""
        import numpy as np
        n = end - start
        out_cap = n + n // 2 + 4096
        out = np.zeros(out_cap, dtype=np.uint8)
        reps_arr = np.array([1, 4, 8], dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        sz = self._lib.zt_compress_fast_frame(
            full.ctypes.data_as(u8p), start, end, window_size, block_size,
            hash_log, accel_log, mls, step0, strategy,
            reps_arr.ctypes.data_as(u32p), table.ctypes.data_as(i32p),
            out.ctypes.data_as(u8p), out_cap)
        if sz < 0:
            return None
        return out[:sz].tobytes()

    def compress_dp_frame(self, full, start: int, end: int,
                          window_size: int, block_size: int,
                          strategy: int, hash_log: int, search_log: int,
                          min_match: int, target_len: int):
        """Whole-frame shallow-DP block loop in C (native/cblock.c
        zt_compress_dp_frame; levels 10-15 class). Returns concatenated
        block bytes or None."""
        import numpy as np
        if not hasattr(self._lib, "zt_compress_dp_frame"):
            return None
        n = end - start
        out_cap = n + n // 2 + 4096
        out = np.zeros(out_cap, dtype=np.uint8)
        reps_arr = np.array([1, 4, 8], dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        sz = self._lib.zt_compress_dp_frame(
            full.ctypes.data_as(u8p), start, end, window_size, block_size,
            strategy, reps_arr.ctypes.data_as(u32p),
            hash_log, search_log, min_match, target_len,
            out.ctypes.data_as(u8p), out_cap)
        if sz < 0:
            return None
        return out[:sz].tobytes()

    def compress_row_frame(self, full, start: int, end: int,
                           window_size: int, block_size: int,
                           strategy: int, row_log: int, width_log: int,
                           mls: int, max_attempts: int, defer: int,
                           pos_t, tag_t, head_t, tlong, hlog_long: int):
        """Whole-frame ROW-matchfinder block loop in C (native/cblock.c
        zt_compress_row_frame): the levels-3/4 analog of
        compress_fast_frame. Returns concatenated block bytes or None."""
        import numpy as np
        if not hasattr(self._lib, "zt_compress_row_frame"):
            return None
        n = end - start
        out_cap = n + n // 2 + 4096
        out = np.zeros(out_cap, dtype=np.uint8)
        reps_arr = np.array([1, 4, 8], dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        sz = self._lib.zt_compress_row_frame(
            full.ctypes.data_as(u8p), start, end, window_size, block_size,
            strategy, reps_arr.ctypes.data_as(u32p),
            row_log, width_log, mls, max_attempts, defer,
            pos_t.ctypes.data_as(i32p), tag_t.ctypes.data_as(u8p),
            head_t.ctypes.data_as(u8p), tlong.ctypes.data_as(i32p),
            hlog_long, out.ctypes.data_as(u8p), out_cap)
        if sz < 0:
            return None
        return out[:sz].tobytes()

    def fast_parse(self, full, window_low: int, block_start: int,
                   block_end: int, reps: tuple, hash_log: int,
                   accel_log: int, mls: int, step0: int, table):
        """Greedy fast-class parse of one block (zstd_fast.c role).
        `table` is the persistent int32[1<<hash_log] position table (-1
        empty) carried across a frame's blocks. Returns (ll, ob, mb,
        new_reps) or None."""
        import numpy as np
        n = block_end - block_start
        seq_cap = n // 4 + 16
        ll = np.zeros(seq_cap, dtype=np.int32)
        ob = np.zeros(seq_cap, dtype=np.int32)
        mb = np.zeros(seq_cap, dtype=np.int32)
        reps_arr = np.array(reps, dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        nseq = self._lib.zt_fast_parse(
            full.ctypes.data_as(u8p), window_low, block_start, block_end,
            reps_arr.ctypes.data_as(u32p),
            ll.ctypes.data_as(i32p), ob.ctypes.data_as(i32p),
            mb.ctypes.data_as(i32p), seq_cap,
            hash_log, accel_log, mls, step0,
            table.ctypes.data_as(i32p))
        if nseq < 0:
            return None
        return (ll[:nseq], ob[:nseq], mb[:nseq],
                (int(reps_arr[0]), int(reps_arr[1]), int(reps_arr[2])))

    def dfast_parse(self, full, window_low: int, block_start: int,
                    block_end: int, reps: tuple, hlog_long: int,
                    hlog_short: int, accel_log: int, table_long,
                    table_short):
        """Double-fast greedy parse (zstd_double_fast.c role): long 8-byte
        + short 5-byte hash tables, both persistent 2-way buckets."""
        import numpy as np
        n = block_end - block_start
        seq_cap = n // 4 + 16
        ll = np.zeros(seq_cap, dtype=np.int32)
        ob = np.zeros(seq_cap, dtype=np.int32)
        mb = np.zeros(seq_cap, dtype=np.int32)
        reps_arr = np.array(reps, dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        nseq = self._lib.zt_dfast_parse(
            full.ctypes.data_as(u8p), window_low, block_start, block_end,
            reps_arr.ctypes.data_as(u32p),
            ll.ctypes.data_as(i32p), ob.ctypes.data_as(i32p),
            mb.ctypes.data_as(i32p), seq_cap,
            hlog_long, hlog_short, accel_log,
            table_long.ctypes.data_as(i32p),
            table_short.ctypes.data_as(i32p))
        if nseq < 0:
            return None
        return (ll[:nseq], ob[:nseq], mb[:nseq],
                (int(reps_arr[0]), int(reps_arr[1]), int(reps_arr[2])))

    def lazy_parse(self, full, window_low: int, block_start: int,
                   block_end: int, reps: tuple, hash_log: int,
                   chain_log: int, mls: int, depth: int, defer: int,
                   accel_log: int, head, chain, table_long=None,
                   hlog_long: int = 0):
        """Hash-chain lazy parse (zstd_lazy.c greedy/lazy/lazy2 role):
        depth-bounded chain search at every position plus 0-2 step lazy
        deferral. head int32[1<<hash_log] (-1 empty) and chain
        int32[1<<chain_log] persist across a frame's blocks; table_long
        (int32[2<<hlog_long] 2-way buckets) optionally extends reach past
        the chain table's modular horizon (dict prefixes, far window)."""
        return self._lazy_call(full, window_low, block_start, block_end,
                               reps, hash_log, chain_log, mls, depth,
                               defer, accel_log, head, chain, table_long,
                               hlog_long)

    def lazy_fill_long(self, full, start: int, end: int, hlog_long: int,
                       table_long):
        """Index a prefix range into the lazy parser's far-reach long
        table (dict / window-history loading for the 8-byte buckets)."""
        import numpy as np
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.zt_lazy_fill_long(full.ctypes.data_as(u8p), start, end,
                                    hlog_long,
                                    table_long.ctypes.data_as(i32p))

    def fse_compress_2state(self, data: bytes, ct) -> bytes | None:
        """FSE_compress_usingCTable role (2 alternating states); mirrors
        format/fse.py fse_compress_2state byte-exactly."""
        import numpy as np
        n = len(data)
        if n <= 2:
            return b""
        cap = 2 * n + 64
        out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        ln = self._lib.zt_fse_compress_2state(
            ctypes.cast(ctypes.c_char_p(data), u8p), n, ct.table_log,
            ct.state_table.ctypes.data_as(i32p),
            ct.delta_nb_bits.ctypes.data_as(i64p),
            ct.delta_find_state.ctypes.data_as(i64p),
            out.ctypes.data_as(u8p), cap)
        if ln < 0:
            return None
        return out[:ln].tobytes()

    def split_points(self, full, bs: int, be: int, chunk: int,
                     min_seg: int) -> list[int]:
        """Entropy-divergence pre-split (format/frame.py _split_points
        mirror, exact integer arithmetic)."""
        import numpy as np
        cap = max((be - bs) // max(min_seg, 1) + 4, 8)
        out = np.empty(cap, dtype=np.int64)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        k = self._lib.zt_split_points(
            full.ctypes.data_as(u8p), bs, be, chunk, min_seg,
            out.ctypes.data_as(i64p), cap)
        return [int(x) for x in out[:k]]

    def huf_encode4(self, data: bytes, nb, val) -> bytes | None:
        """HUF_compress4X_usingCTable role: jump table + 4 streams in one
        native call."""
        import numpy as np
        n = len(data)
        cap = 2 * n + 256
        out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        ln = self._lib.zt_huf_encode4(
            ctypes.cast(ctypes.c_char_p(data), u8p), n,
            nb.ctypes.data_as(i32p), val.ctypes.data_as(i32p),
            out.ctypes.data_as(u8p), cap)
        if ln < 0:
            return None
        return out[:ln].tobytes()

    def fse_build_ctable(self, norm, max_symbol: int, table_log: int):
        """FSE_buildCTable role; byte-identical layout to the Python
        builder (format/fse.py). Returns (state_table, delta_nb, delta_fs)
        or None on invalid norm."""
        import numpy as np
        state_table = np.empty(1 << table_log, dtype=np.int32)
        delta_nb = np.empty(max_symbol + 1, dtype=np.int64)
        delta_fs = np.empty(max_symbol + 1, dtype=np.int64)
        norm32 = np.ascontiguousarray(norm[: max_symbol + 1],
                                      dtype=np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        rc = self._lib.zt_fse_build_ctable(
            norm32.ctypes.data_as(i32p), max_symbol, table_log,
            state_table.ctypes.data_as(i32p),
            delta_nb.ctypes.data_as(i64p), delta_fs.ctypes.data_as(i64p))
        if rc != 0:
            return None
        return state_table, delta_nb, delta_fs

    def fast_fill(self, full, start: int, end: int, hash_log: int,
                  mls: int, table):
        """Index [start, end) (dictionary/window prefix) into the fast
        2-way bucket table (ZSTD_fillHashTable role)."""
        import numpy as np
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.zt_fast_fill(full.ctypes.data_as(u8p), start, end,
                               hash_log, mls, table.ctypes.data_as(i32p))

    def dfast_fill(self, full, start: int, end: int, hlog_long: int,
                   hlog_short: int, table_long, table_short):
        """Index a prefix into the double-fast long+short tables
        (ZSTD_fillDoubleHashTable role)."""
        import numpy as np
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.zt_dfast_fill(full.ctypes.data_as(u8p), start, end,
                                hlog_long, hlog_short,
                                table_long.ctypes.data_as(i32p),
                                table_short.ctypes.data_as(i32p))

    def lazy_fill(self, full, start: int, end: int, hash_log: int,
                  chain_log: int, mls: int, head, chain):
        """Index [start, end) (dictionary/window prefix) into the lazy
        matchfinder's head+chain tables (dictMatchState-loading role)."""
        import numpy as np
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.zt_lazy_fill(
            full.ctypes.data_as(u8p), start, end, hash_log, chain_log, mls,
            head.ctypes.data_as(i32p), chain.ctypes.data_as(i32p))

    def lz4_block_compress(self, data: bytes):
        """LZ4 block compress (native/lz4.c); None if not compressible."""
        import numpy as np
        n = len(data)
        if n == 0:
            return None
        cap = n + n // 128 + 64
        out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        src = np.frombuffer(data, dtype=np.uint8)
        r = self._lib.zt_lz4_block_compress(
            src.ctypes.data_as(u8p), n, out.ctypes.data_as(u8p), cap)
        if r <= 0:
            return None
        return out[:r].tobytes()

    def lz4_block_decompress(self, data: bytes, cap: int, out=None,
                             start: int = 0):
        """LZ4 block decompress appended at out[start:]; bytes before
        `start` serve as match history (block-linked frames). Returns the
        produced byte count into `out`, or a bytes object when out is
        None; None on corruption."""
        import numpy as np
        ret_bytes = out is None
        if out is None:
            out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        src = np.frombuffer(data, dtype=np.uint8)
        r = self._lib.zt_lz4_block_decompress(
            src.ctypes.data_as(u8p) if len(data) else
            ctypes.cast(None, u8p), len(data),
            out.ctypes.data_as(u8p), cap, start)
        if r < 0:
            return None
        return out[:r].tobytes() if ret_bytes else int(r)

    def xxh32(self, data: bytes, seed: int = 0) -> int:
        import numpy as np
        u8p = ctypes.POINTER(ctypes.c_uint8)
        src = np.frombuffer(data, dtype=np.uint8)
        return int(self._lib.zt_xxh32(
            src.ctypes.data_as(u8p) if len(data) else
            ctypes.cast(None, u8p), len(data), seed))

    def row_fill(self, full, start: int, end: int, row_log: int,
                 width_log: int, mls: int, pos_table, tag_table,
                 head_table, table_long=None, hlog_long=0):
        """Index [start, end) (dictionary/window prefix) into the row
        matchfinder tables (ZSTD_row_update role)."""
        import numpy as np
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        tl = (table_long.ctypes.data_as(i32p) if table_long is not None
              else ctypes.cast(None, i32p))
        self._lib.zt_row_fill(
            full.ctypes.data_as(u8p), start, end, row_log, width_log, mls,
            pos_table.ctypes.data_as(i32p), tag_table.ctypes.data_as(u8p),
            head_table.ctypes.data_as(u8p), tl,
            hlog_long if table_long is not None else 0)

    def row_parse(self, full, window_low, block_start, block_end, reps,
                  row_log, width_log, mls, max_attempts, defer,
                  pos_table, tag_table, head_table, table_long=None,
                  hlog_long=0):
        """Row-matchfinder lazy parse (ZSTD_RowFindBestMatch role,
        zstd_lazy.c:986). Same sequence contract as lazy_parse."""
        import numpy as np
        n = block_end - block_start
        seq_cap = n // 4 + 16
        ll = np.zeros(seq_cap, dtype=np.int32)
        ob = np.zeros(seq_cap, dtype=np.int32)
        mb = np.zeros(seq_cap, dtype=np.int32)
        reps_arr = np.array(reps, dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        tl = (table_long.ctypes.data_as(i32p) if table_long is not None
              else ctypes.cast(None, i32p))
        nseq = self._lib.zt_row_parse(
            full.ctypes.data_as(u8p), window_low, block_start, block_end,
            reps_arr.ctypes.data_as(u32p),
            ll.ctypes.data_as(i32p), ob.ctypes.data_as(i32p),
            mb.ctypes.data_as(i32p), seq_cap,
            row_log, width_log, mls, max_attempts, defer, 8,
            pos_table.ctypes.data_as(i32p), tag_table.ctypes.data_as(u8p),
            head_table.ctypes.data_as(u8p), tl,
            hlog_long if table_long is not None else 0)
        if nseq < 0:
            return None
        return (ll[:nseq], ob[:nseq], mb[:nseq],
                (int(reps_arr[0]), int(reps_arr[1]), int(reps_arr[2])))

    def _lazy_call(self, full, window_low, block_start, block_end, reps,
                   hash_log, chain_log, mls, depth, defer, accel_log,
                   head, chain, table_long=None, hlog_long=0):
        import numpy as np
        n = block_end - block_start
        seq_cap = n // 4 + 16
        ll = np.zeros(seq_cap, dtype=np.int32)
        ob = np.zeros(seq_cap, dtype=np.int32)
        mb = np.zeros(seq_cap, dtype=np.int32)
        reps_arr = np.array(reps, dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        tl = (table_long.ctypes.data_as(i32p) if table_long is not None
              else ctypes.cast(None, i32p))
        nseq = self._lib.zt_lazy_parse(
            full.ctypes.data_as(u8p), window_low, block_start, block_end,
            reps_arr.ctypes.data_as(u32p),
            ll.ctypes.data_as(i32p), ob.ctypes.data_as(i32p),
            mb.ctypes.data_as(i32p), seq_cap,
            hash_log, chain_log, mls, depth, defer, accel_log,
            head.ctypes.data_as(i32p), chain.ctypes.data_as(i32p),
            tl, hlog_long if table_long is not None else 0)
        if nseq < 0:
            return None
        return (ll[:nseq], ob[:nseq], mb[:nseq],
                (int(reps_arr[0]), int(reps_arr[1]), int(reps_arr[2])))

    def huf_encode(self, data: bytes, nb, val) -> bytes | None:
        """One Huffman stream, last-to-first (HUF_compress1X role).
        nb/val: int32 canonical code table arrays."""
        import numpy as np
        n = len(data)
        cap = 2 * n + 64
        out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        nb = np.ascontiguousarray(nb, dtype=np.int32)
        val = np.ascontiguousarray(val, dtype=np.int32)
        src = np.frombuffer(data, dtype=np.uint8)
        r = self._lib.zt_huf_encode(
            src.ctypes.data_as(u8p), n,
            nb.ctypes.data_as(i32p), val.ctypes.data_as(i32p),
            out.ctypes.data_as(u8p), cap)
        if r < 0:
            return None
        return out[:r].tobytes()

    def fse_normalize(self, count, table_log: int, total: int,
                      max_symbol: int, use_low_prob: bool):
        """FSE_normalizeCount exact mirror (incl. M2). Returns int32 norm
        array or None where the Python oracle raises (RLE case etc.)."""
        import numpy as np
        cnt = np.ascontiguousarray(count[: max_symbol + 1], dtype=np.int64)
        norm = np.empty(max_symbol + 1, dtype=np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        r = self._lib.zt_fse_normalize(
            cnt.ctypes.data_as(i64p), table_log, total, max_symbol,
            1 if use_low_prob else 0, norm.ctypes.data_as(i32p))
        if r < 0:
            return None
        return norm

    def fse_write_ncount(self, norm, max_symbol: int,
                         table_log: int) -> bytes | None:
        """FSE_writeNCount exact bit layout."""
        import numpy as np
        nn = np.ascontiguousarray(norm[: max_symbol + 1], dtype=np.int32)
        out = np.empty(512, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        r = self._lib.zt_fse_write_ncount(
            nn.ctypes.data_as(i32p), max_symbol, table_log,
            out.ctypes.data_as(u8p), out.shape[0])
        if r < 0:
            return None
        return out[:r].tobytes()

    def huf_build_write(self, count, max_symbol: int, max_nb_bits: int):
        """Canonical Huffman CTable build + serialized tree description in
        one call (HUF_buildCTable_wksp + HUF_writeCTable_wksp role).
        Returns (table_log, nb_bits, value, tree_bytes), -2 for
        "unserializable" (caller raises), or None (fall back to Python)."""
        import numpy as np
        nb = np.zeros(256, dtype=np.int32)
        val = np.zeros(256, dtype=np.int32)
        tree = np.empty(960, dtype=np.uint8)
        tlen = ctypes.c_int64(0)
        cnt = np.ascontiguousarray(count, dtype=np.int64)
        if cnt.shape[0] < 256:
            cnt = np.pad(cnt, (0, 256 - cnt.shape[0]))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        r = self._lib.zt_huf_build_write(
            cnt.ctypes.data_as(i64p), max_symbol, max_nb_bits,
            nb.ctypes.data_as(i32p), val.ctypes.data_as(i32p),
            tree.ctypes.data_as(u8p), tree.shape[0], ctypes.byref(tlen))
        if r == -2:
            return -2
        if r < 0:
            return None
        return int(r), nb, val, tree[: tlen.value].tobytes()

    def encode_sequences(self, ll, ob, mb, llc, ofc, mlc,
                         ll_bits, ml_bits, ct_ll, ct_of, ct_ml):
        """3-state interleaved FSE sequence bitstream in C
        (ZSTD_encodeSequences_body role). Arrays are int32 numpy; ctables
        are format.fse.CTable. Returns bytes or None (caller falls back)."""
        import numpy as np
        n = len(ll)
        cap = 16 * n + 64
        out = np.empty(cap, dtype=np.uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        # keep the contiguous copies alive across the call
        arrs = [np.ascontiguousarray(x, dtype=np.int32)
                for x in (ll, ob, mb, llc, ofc, mlc, ll_bits, ml_bits,
                          ct_ll.state_table, ct_of.state_table,
                          ct_ml.state_table)]
        arrs64 = [np.ascontiguousarray(x, dtype=np.int64)
                  for x in (ct_ll.delta_nb_bits, ct_ll.delta_find_state,
                            ct_of.delta_nb_bits, ct_of.delta_find_state,
                            ct_ml.delta_nb_bits, ct_ml.delta_find_state)]
        p32 = [a.ctypes.data_as(i32p) for a in arrs]
        p64 = [a.ctypes.data_as(i64p) for a in arrs64]
        r = self._lib.zt_encode_sequences(
            n, p32[0], p32[1], p32[2], p32[3], p32[4], p32[5], p32[6], p32[7],
            ct_ll.table_log, p32[8], p64[0], p64[1],
            ct_of.table_log, p32[9], p64[2], p64[3],
            ct_ml.table_log, p32[10], p64[4], p64[5],
            out.ctypes.data_as(u8p), cap)
        if r < 0:
            return None
        return out[:r].tobytes()

    def opt_ctx(self):
        """Persistent match-finder context for one frame's blocks; freed on
        garbage collection."""
        lib = self._lib

        class _OptCtx:
            __slots__ = ("ptr",)

            def __init__(self):
                self.ptr = lib.zt_opt_ctx_new()

            def __del__(self):
                if self.ptr:
                    lib.zt_opt_ctx_free(self.ptr)
                    self.ptr = None

        return _OptCtx()

    def opt_mcache(self, cap: int = 1 << 17):
        """Per-block match cache for the iterated keep-min parse: pass 1
        records every position's candidate enumeration, later passes
        replay it when the repcode state matches (freed on GC)."""
        lib = self._lib
        if not hasattr(lib, "zt_opt_mcache_new"):
            return None

        class _MCache:
            __slots__ = ("ptr",)

            def __init__(self):
                self.ptr = lib.zt_opt_mcache_new(cap)

            def __del__(self):
                if self.ptr:
                    lib.zt_opt_mcache_free(self.ptr)
                    self.ptr = None

        h = _MCache()
        return h if h.ptr else None

    def opt_set_mcache(self, ctx, mcache, block_start: int, block_len: int,
                       mode: int) -> None:
        """Arm ctx's match cache for one block parse (mode 1 = record,
        2 = probe, 0 = off)."""
        if not hasattr(self._lib, "zt_opt_ctx_set_mcache"):
            return
        self._lib.zt_opt_ctx_set_mcache(
            ctx.ptr, mcache.ptr if mcache is not None else None,
            block_start, block_len, mode if mcache is not None else 0)

    def opt_twopass(self, v: int) -> None:
        """Force the first-block statistics seeding mode (-1 = default)."""
        if hasattr(self._lib, "zt_opt_knob_twopass"):
            self._lib.zt_opt_knob_twopass(v)

    def opt_ctx_clone(self, dst, src, used_hint: int = 0) -> bool:
        """Snapshot src's matcher tables + statistics into dst (the
        per-block snapshot behind the iterated keep-min parse)."""
        return self._lib.zt_opt_ctx_clone(dst.ptr, src.ptr, used_hint) == 0

    def opt_ctx_copy_prices(self, dst, src) -> None:
        self._lib.zt_opt_ctx_copy_prices(dst.ptr, src.ptr)

    def opt_parse(self, full, window_low: int, block_start: int,
                  block_end: int, reps: tuple, hash_log: int,
                  search_log: int, min_match: int, target_len: int,
                  strategy: int = 9, ctx=None):
        """Optimal-parse one block. Returns (ll, ob, mb, new_reps) int32
        arrays, or None if the native parser declined (fallback to lazy).
        `ctx` (from opt_ctx()) carries the matcher across blocks."""
        import numpy as np
        n = block_end - block_start
        seq_cap = n // 2 + 16
        ll = np.zeros(seq_cap, dtype=np.int32)
        ob = np.zeros(seq_cap, dtype=np.int32)
        mb = np.zeros(seq_cap, dtype=np.int32)
        reps_arr = np.array(reps, dtype=np.uint32)
        full = np.ascontiguousarray(full)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        args = (full.ctypes.data_as(u8p), window_low, block_start, block_end,
                reps_arr.ctypes.data_as(u32p),
                ll.ctypes.data_as(i32p), ob.ctypes.data_as(i32p),
                mb.ctypes.data_as(i32p), seq_cap,
                hash_log, search_log, min_match, target_len, strategy)
        if ctx is not None and ctx.ptr:
            # src_end: ordering comparisons may read the whole buffer
            nseq = self._lib.zt_opt_parse_ctx(
                ctx.ptr, args[0], window_low, block_start, block_end,
                len(full), *args[4:])
        else:
            nseq = self._lib.zt_opt_parse(*args)
        if nseq < 0:
            return None
        return (ll[:nseq], ob[:nseq], mb[:nseq],
                (int(reps_arr[0]), int(reps_arr[1]), int(reps_arr[2])))


def _try_build() -> bool:
    makefile = os.path.join(_REPO_ROOT, "native", "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_native() -> _Native | None:
    global _native, _tried
    if _native is not None:
        return _native
    with _lock:
        if _native is not None or _tried:
            return _native
        _tried = True
        if not os.path.exists(_SO_PATH):
            if not _try_build():
                return None
        try:
            _native = _Native(ctypes.CDLL(_SO_PATH))
        except OSError:
            _native = None
        return _native
