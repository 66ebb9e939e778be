"""Native host encode paths: the C fast-class matchfinder (native/fast.c,
zstd_fast.c role) and the C entropy bit loops (native/encode.c:
zt_encode_sequences = ZSTD_encodeSequences_body role, zt_huf_encode =
HUF_compress1X role). The C bitstreams must be byte-identical to the
pure-Python spec oracle; the fast parse must round-trip, cross-decode
under the reference binary, and stay within the level's size contract.
"""

import os
import subprocess

import numpy as np
import pytest

from conftest import REF_ZSTD, gen_text, have_ref

import zstd_tpu
import zstd_tpu.native as N
import zstd_tpu.format.sequences as S
import zstd_tpu.format.huffman as H


pytestmark = pytest.mark.skipif(N.get_native() is None,
                                reason="native library unavailable")


def _capture_seqstores(datas_levels):
    import zstd_tpu.format.block as B
    stores = []
    orig = S.write_sequences_section

    def hook(seqs, prev, strategy):
        stores.append((seqs, prev.copy(), strategy))
        return orig(seqs, prev, strategy)

    B.write_sequences_section = hook
    try:
        for data, level in datas_levels:
            zstd_tpu.compress(data, level=level, checksum=False)
    finally:
        B.write_sequences_section = orig
    return stores


def test_c_sequence_bitstream_matches_python():
    data = gen_text(600_000, seed=31)
    stores = _capture_seqstores([(data, 1), (data[:200_000], 3),
                                 (data[:100_000], 19)])
    assert stores
    nat = N.get_native()
    for seqs, prev, strat in stores:
        llc, ofc, mlc = S.seq_to_codes_np(seqs.lit_length, seqs.off_base,
                                          seqs.ml_base)
        _, nxt, _ = S.build_sequences_header(llc, ofc, mlc, seqs.nb_seq,
                                             prev, strat)
        c_out = nat.encode_sequences(seqs.lit_length, seqs.off_base,
                                     seqs.ml_base, llc, ofc, mlc,
                                     S.LL_BITS, S.ML_BITS,
                                     nxt.ct_ll, nxt.ct_of, nxt.ct_ml)
        gn = N.get_native
        N.get_native = lambda: None
        try:
            py_out = S.encode_sequences(seqs, llc, ofc, mlc, nxt.ct_ll,
                                        nxt.ct_of, nxt.ct_ml)
        finally:
            N.get_native = gn
        assert c_out == py_out


def test_c_huffman_stream_matches_python():
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 40, 20_000, dtype=np.uint8) ** 2 % 251)
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    mx = int(np.nonzero(hist)[0][-1])
    ct = H.build_huf_ctable(hist.astype(np.int64), mx)
    nat = N.get_native()
    c_out = nat.huf_encode(data, ct.nb_bits, ct.value)
    gn = N.get_native
    N.get_native = lambda: None
    try:
        py_out = H.huf_encode_1x(data, ct)
    finally:
        N.get_native = gn
    assert c_out == py_out


def test_fast_parse_roundtrip_and_crossdecode():
    if not have_ref():
        pytest.skip("reference binary not built")
    for seed, size in ((1, 400_000), (2, 150_000), (3, 64_000)):
        data = gen_text(size, seed=seed)
        for level in (1, 2, -1, -3):
            blob = zstd_tpu.compress(data, level=level)
            assert zstd_tpu.decompress(blob) == data
            r = subprocess.run([REF_ZSTD, "-dc"], input=blob,
                               capture_output=True, check=True)
            assert r.stdout == data


def test_fast_parse_incompressible_and_tiny():
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    blob = zstd_tpu.compress(noise, level=1)
    assert zstd_tpu.decompress(blob) == noise
    for n in (0, 1, 15, 64):
        d = bytes(range(n))
        assert zstd_tpu.decompress(zstd_tpu.compress(d, level=1)) == d


def test_fast_parse_honors_host_parser_override(monkeypatch):
    data = gen_text(200_000, seed=6)
    fast = zstd_tpu.compress(data, level=1, checksum=False)
    monkeypatch.setenv("ZSTD_TPU_HOST_PARSER", "dp")
    dp = zstd_tpu.compress(data, level=1, checksum=False)
    monkeypatch.delenv("ZSTD_TPU_HOST_PARSER")
    # the DP route is the ratio-maximal one; both must round-trip
    assert zstd_tpu.decompress(fast) == data
    assert zstd_tpu.decompress(dp) == data
    assert len(dp) <= len(fast)


def test_dfast_greedy_mode_roundtrip(monkeypatch):
    """ZSTD_TPU_HOST_PARSER=greedy routes levels 3-4 through the native
    double-fast matchfinder (zstd_double_fast.c role)."""
    if not have_ref():
        pytest.skip("reference binary not built")
    data = gen_text(500_000, seed=17)
    monkeypatch.setenv("ZSTD_TPU_HOST_PARSER", "greedy")
    for level in (3, 4):
        blob = zstd_tpu.compress(data, level=level)
        assert zstd_tpu.decompress(blob) == data
        r = subprocess.run([REF_ZSTD, "-dc"], input=blob,
                           capture_output=True, check=True)
        assert r.stdout == data
    monkeypatch.delenv("ZSTD_TPU_HOST_PARSER")
    dp = zstd_tpu.compress(data, level=3)
    assert zstd_tpu.decompress(dp) == data
    assert len(dp) <= len(blob)          # DP stays the ratio-maximal route


def test_c_huf_build_write_matches_python():
    """zt_huf_build_write (CTable build + tree description in one call)
    is byte/val-identical to the Python oracle pair across distribution
    shapes: uniform, skewed, sparse, binary-ish, and mixed."""
    nat = N.get_native()
    if nat is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    checked = 0
    for trial in range(120):
        max_symbol = int(rng.integers(1, 256))
        kind = trial % 5
        if kind == 0:
            count = rng.integers(0, 1000, size=256).astype(np.int64)
        elif kind == 1:
            count = (rng.zipf(1.5, size=256) % 100000).astype(np.int64)
        elif kind == 2:
            count = np.zeros(256, np.int64)
            for i in rng.integers(0, max_symbol + 1, size=8):
                count[i] = int(rng.integers(1, 1 << 20))
        elif kind == 3:
            count = rng.integers(0, 3, size=256).astype(np.int64)
        else:
            count = np.concatenate([rng.integers(1, 10, 128),
                                    rng.integers(0, 100000, 128)]).astype(np.int64)
        count[max_symbol + 1:] = 0
        if np.count_nonzero(count[:max_symbol + 1]) < 2:
            count[0] += 1
            count[max_symbol] += 1
        max_nb = int(rng.integers(5, 12))
        r = nat.huf_build_write(count, max_symbol, max_nb)
        if r is None or r == -2:
            continue  # infeasible/unserializable: python raises the same way
        tlog, nb, val, tree = r
        ct = H.build_huf_ctable(count, max_symbol, max_nb)
        hdr = H.write_tree_description(ct)
        assert tlog == ct.table_log
        assert np.array_equal(nb, ct.nb_bits)
        assert np.array_equal(val, ct.value)
        assert tree == hdr
        checked += 1
    assert checked >= 60


def test_c_huffman_deep_codes_all_lengths():
    """Regression: 11-bit codes with every head-peel residue (n % 4) must
    round-trip — the unrolled encoder once overflowed its accumulator
    when the peel left >16 resident bits before a 4-deep-code group."""
    nat = N.get_native()
    if nat is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # an exponential histogram forces the full 11-bit code depth
    counts = [max(1, 1 << max(0, 15 - s)) for s in range(24)]
    vals = np.repeat(np.arange(24, dtype=np.uint8), counts)
    rng.shuffle(vals)
    data = bytes(vals)
    hist = np.bincount(np.frombuffer(data, np.uint8), minlength=256).astype(np.int64)
    mx = int(np.nonzero(hist)[0][-1])
    ct = H.build_huf_ctable(hist, mx)
    assert int(ct.nb_bits.max()) >= 10  # the test only bites with deep codes
    dt = H.ctable_to_dtable(ct)
    for cut in (0, 1, 2, 3, 5, 17):
        part = data[: len(data) - cut]
        enc = nat.huf_encode(part, ct.nb_bits, ct.value)
        assert enc is not None
        assert H.huf_decode_1x(enc, dt, len(part)) == part
