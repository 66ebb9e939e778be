"""Device entropy encoders must be byte-exact vs the host oracle."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from zstd_tpu.format import fse, huffman
from zstd_tpu.format.sequences import (FseEntropyState, SeqStore,
                                       build_sequences_header,
                                       encode_sequences, seq_to_codes_np)
from zstd_tpu.ops.bitpack import pack_bits, words_to_bytes_np
from zstd_tpu.ops.fse_enc import SYM_PAD, STATE_TABLE_PAD, fse_pack_batch
from zstd_tpu.ops.huffman_enc import huf_pack_4x_batch
from tests.conftest import gen_text


def test_pack_bits_matches_bitwriter():
    from zstd_tpu.format.bitstream import BitWriter
    rng = np.random.default_rng(0)
    for trial in range(5):
        m = int(rng.integers(1, 500))
        nbits = rng.integers(0, 25, m).astype(np.int32)
        values = rng.integers(0, 1 << 24, m).astype(np.int64)
        bw = BitWriter()
        for v, nb in zip(values, nbits):
            bw.add(int(v), int(nb))
        expect = bw.close()
        # sentinel as final field
        v2 = np.append(values.astype(np.int64) & 0x7FFFFFFF, 1).astype(np.int32)
        n2 = np.append(nbits, 1).astype(np.int32)
        out_words = (int(n2.sum()) + 31) // 32 + 2
        words, total = pack_bits(jnp.asarray(v2), jnp.asarray(n2), out_words)
        got = words_to_bytes_np(np.asarray(words), int(total))
        assert got == expect, f"trial {trial}"


def _pad_ct(ct: fse.CTable):
    st = np.zeros(STATE_TABLE_PAD, dtype=np.int32)
    st[: len(ct.state_table)] = ct.state_table
    dn = np.zeros(SYM_PAD, dtype=np.int32)
    dn[: len(ct.delta_nb_bits)] = ct.delta_nb_bits
    df = np.zeros(SYM_PAD, dtype=np.int32)
    df[: len(ct.delta_find_state)] = ct.delta_find_state
    return st, dn, df, ct.table_log


def test_fse_pack_matches_host():
    rng = np.random.default_rng(1)
    CAP = 256
    for trial in range(6):
        n = int(rng.integers(1, CAP))
        ll = rng.integers(0, 40, n).astype(np.int32)
        ob = (rng.integers(1, 2000, n)).astype(np.int32)
        mlb = rng.integers(0, 80, n).astype(np.int32)
        seqs = SeqStore(ll, ob, mlb, b"")
        llc, ofc, mlc = seq_to_codes_np(ll, ob, mlb)
        header, nxt, _ = build_sequences_header(llc, ofc, mlc, n,
                                                FseEntropyState(), 1)
        expect = encode_sequences(seqs, llc, ofc, mlc,
                                  nxt.ct_ll, nxt.ct_of, nxt.ct_ml)

        def padc(x):
            out = np.zeros(CAP, dtype=np.int32)
            out[:n] = x
            return out[None]

        sts, dns, dfs, tls = [], [], [], []
        for ct in (nxt.ct_ll, nxt.ct_of, nxt.ct_ml):
            st, dn, df, tl = _pad_ct(ct)
            sts.append(st); dns.append(dn); dfs.append(df); tls.append(tl)
        OUT_W = (CAP * 90) // 32 + 4
        words, bits, ovf = fse_pack_batch(
            jnp.asarray(padc(llc)), jnp.asarray(padc(mlc)), jnp.asarray(padc(ofc)),
            jnp.asarray(padc(ll)), jnp.asarray(padc(mlb)), jnp.asarray(padc(ob)),
            jnp.asarray(np.array([n], dtype=np.int32)),
            jnp.asarray(np.stack(sts)[None]), jnp.asarray(np.stack(dns)[None]),
            jnp.asarray(np.stack(dfs)[None]), jnp.asarray(np.array(tls, np.int32)[None]),
            CAP, OUT_W)
        assert not bool(ovf[0])
        got = words_to_bytes_np(np.asarray(words[0]), int(bits[0]))
        assert got == expect, f"trial {trial} n={n}"


def test_huf_pack_4x_matches_host():
    rng = np.random.default_rng(2)
    L_CAP = 4096
    for trial in range(4):
        n = int(rng.integers(300, L_CAP))
        data = rng.normal(100, 25, n).clip(0, 255).astype(np.uint8).tobytes()
        arr = np.frombuffer(data, dtype=np.uint8)
        count = np.bincount(arr, minlength=256).astype(np.int64)
        if int(count.max()) == n:
            continue
        ct = huffman.build_huf_ctable(count, int(arr.max()))
        expect = huffman.huf_encode_4x(data, ct)
        if expect is None:
            continue
        lits = np.zeros(L_CAP, dtype=np.uint8)
        lits[:n] = arr
        seg_cap = (L_CAP + 3) // 4
        out_w = (seg_cap * 12) // 32 + 4
        words, bits, ovf = huf_pack_4x_batch(
            jnp.asarray(lits[None]), jnp.asarray(np.array([n], np.int32)),
            jnp.asarray(ct.nb_bits[None].astype(np.int32)),
            jnp.asarray(ct.value[None].astype(np.int32)),
            seg_cap, out_w)
        streams = [words_to_bytes_np(np.asarray(words[0, s]), int(bits[0, s]))
                   for s in range(4)]
        jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
        got = jump + b"".join(streams)
        assert got == expect, f"trial {trial} n={n}"
