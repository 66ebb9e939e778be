"""Unit tests for the entropy primitives (FSE, Huffman, bitstream, XXH64)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zstd_tpu.format import fse, huffman
from zstd_tpu.format.bitstream import BitReader, BitWriter
from zstd_tpu.constants import LL_DEFAULT_DIST, LL_DEFAULT_LOG, OF_DEFAULT_DIST, \
    OF_DEFAULT_LOG, ML_DEFAULT_DIST, ML_DEFAULT_LOG
from zstd_tpu.xxhash64 import xxh64, _xxh64_py


def test_bitstream_roundtrip():
    bw = BitWriter()
    fields = [(5, 3), (0, 1), (1023, 10), (7, 7), (123456, 17), (1, 1)]
    for v, n in fields:
        bw.add(v, n)
    data = bw.close()
    br = BitReader(data)
    for v, n in reversed(fields):
        assert br.read(n) == v
    assert br.exhausted


def test_bitstream_masking():
    bw = BitWriter()
    bw.add(0xFFFF, 4)  # only low 4 bits kept
    data = bw.close()
    br = BitReader(data)
    assert br.read(4) == 0xF


def test_xxh64_known_vectors():
    # Published xxHash test vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    data = bytes(range(256)) * 10
    assert xxh64(data) == _xxh64_py(data)


def test_fse_ncount_roundtrip():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_sym = int(rng.integers(2, 40))
        count = rng.integers(0, 1000, n_sym).astype(np.int64)
        count[rng.integers(n_sym)] += 1000  # ensure some spread
        total = int(count.sum())
        max_symbol = n_sym - 1
        while count[max_symbol] == 0:
            count[max_symbol] = 1
            total += 1
        table_log = fse.optimal_table_log(9, total, max_symbol)
        try:
            norm = fse.normalize_count(count, table_log, total, max_symbol, True)
        except Exception:
            continue
        hdr = fse.write_ncount(norm, max_symbol, table_log)
        norm2, max2, log2_, consumed = fse.read_ncount(hdr, 63, 9)
        assert log2_ == table_log
        assert max2 == max_symbol
        assert consumed == len(hdr)
        np.testing.assert_array_equal(norm[: max2 + 1], norm2)


@pytest.mark.parametrize("dist,log", [
    (LL_DEFAULT_DIST, LL_DEFAULT_LOG),
    (OF_DEFAULT_DIST, OF_DEFAULT_LOG),
    (ML_DEFAULT_DIST, ML_DEFAULT_LOG),
])
def test_predefined_dtables_match_spec_appendix(dist, log):
    dt = fse.build_dtable(dist.astype(np.int32), log)
    # Spot checks from RFC 8878 Appendix A
    if dist is LL_DEFAULT_DIST:
        assert (dt.symbol[0], dt.nb_bits[0], dt.new_state[0]) == (0, 4, 0)
        assert (dt.symbol[2], dt.nb_bits[2], dt.new_state[2]) == (1, 5, 32)
        assert (dt.symbol[63], dt.nb_bits[63], dt.new_state[63]) == (32, 6, 0)
        assert (dt.symbol[39], dt.nb_bits[39], dt.new_state[39]) == (25, 4, 16)
    if dist is OF_DEFAULT_DIST:
        assert (dt.symbol[1], dt.nb_bits[1], dt.new_state[1]) == (6, 4, 0)
        assert (dt.symbol[15], dt.nb_bits[15], dt.new_state[15]) == (7, 4, 16)
        assert (dt.symbol[31], dt.nb_bits[31], dt.new_state[31]) == (24, 5, 0)
    if dist is ML_DEFAULT_DIST:
        assert (dt.symbol[0], dt.nb_bits[0], dt.new_state[0]) == (0, 6, 0)
        assert (dt.symbol[22], dt.nb_bits[22], dt.new_state[22]) == (1, 4, 16)
        assert (dt.symbol[63], dt.nb_bits[63], dt.new_state[63]) == (46, 6, 0)


def test_fse_2state_roundtrip():
    rng = np.random.default_rng(1)
    for trial in range(10):
        n = int(rng.integers(3, 200))
        data = rng.integers(0, 8, n).astype(np.uint8).tobytes()
        arr = np.frombuffer(data, dtype=np.uint8)
        count = np.bincount(arr, minlength=16).astype(np.int64)
        max_symbol = int(arr.max())
        if count.max() == n:
            continue
        table_log = fse.optimal_table_log(6, n, max_symbol)
        try:
            norm = fse.normalize_count(count, table_log, n, max_symbol, False)
        except Exception:
            continue
        ct = fse.build_ctable(norm, max_symbol, table_log)
        payload = fse.fse_compress_2state(data, ct)
        if not payload:
            continue
        dt = fse.build_dtable(norm, table_log)
        out = fse.fse_decompress_2state(payload, dt, 255)
        assert out == data


def test_huffman_roundtrip():
    rng = np.random.default_rng(2)
    for trial in range(10):
        n = int(rng.integers(100, 3000))
        # skewed distribution
        data = (rng.normal(100, 20, n).clip(0, 255).astype(np.uint8)).tobytes()
        arr = np.frombuffer(data, dtype=np.uint8)
        count = np.bincount(arr, minlength=256).astype(np.int64)
        max_symbol = int(arr.max())
        if int(count.max()) == n:
            continue
        ct = huffman.build_huf_ctable(count, max_symbol)
        assert ct.table_log <= 11
        hdr = huffman.write_tree_description(ct)
        nb_bits, nb_symbols, table_log, consumed = huffman.read_tree_description(hdr)
        assert consumed == len(hdr)
        assert table_log == ct.table_log
        np.testing.assert_array_equal(nb_bits[: max_symbol + 1],
                                      ct.nb_bits[: max_symbol + 1])
        dt = huffman.build_huf_dtable(nb_bits, nb_symbols, table_log)
        enc = huffman.huf_encode_1x(data, ct)
        assert huffman.huf_decode_1x(enc, dt, n) == data
        enc4 = huffman.huf_encode_4x(data, ct)
        if enc4 is not None:
            assert huffman.huf_decode_4x(enc4, dt, n) == data


def test_huffman_height_limit():
    # Exponential counts force deep tree; must clamp to 11 bits
    count = np.zeros(256, dtype=np.int64)
    for i in range(30):
        count[i] = 1 << i
    ct = huffman.build_huf_ctable(count, 29)
    assert ct.table_log <= 11
    assert int(ct.nb_bits[:30].max()) <= 11
    # Kraft sum must be exactly 1
    kraft = sum(2.0 ** -int(b) for b in ct.nb_bits[:30] if b > 0)
    assert abs(kraft - 1.0) < 1e-9
