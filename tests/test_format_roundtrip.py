"""Round-trip and cross-implementation tests for the format oracle.

Mirrors the reference test strategy (SURVEY.md §4): API round-trips
(tests/fuzzer.c analog), golden cross-checks against the reference binary
(tests/golden-* analog), and randomized inputs (datagen.c analog).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from tests.conftest import gen_mixed, gen_text, ref_compress, ref_decompress


CORPORA = [
    b"",
    b"a",
    b"abc",
    b"hello world hello world hello world\n" * 10,
    bytes(range(256)) * 40,
    b"\x00" * 100000,
    gen_text(1000),
    gen_text(70000, seed=1),
    gen_text(300000, seed=2),
    gen_mixed(50000, seed=3, match_prob=0.7),
    gen_mixed(150000, seed=4, match_prob=0.2),
    np.random.default_rng(5).integers(0, 256, 65536, dtype=np.uint8).tobytes(),
]


@pytest.mark.parametrize("level", [1, 3])
@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_self_roundtrip(level, i):
    data = CORPORA[i]
    blob = zstd_tpu.compress(data, level=level)
    assert zstd_tpu.decompress(blob) == data


@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_self_roundtrip_checksum(i):
    data = CORPORA[i]
    blob = zstd_tpu.compress(data, level=1, checksum=True)
    assert zstd_tpu.decompress(blob) == data


@pytest.mark.parametrize("level", ["-1", "-3", "-19"])
@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_decode_reference_frames(ref, level, i):
    """Our decoder must decode anything the reference produces."""
    data = CORPORA[i]
    blob = ref_compress(data, level)
    assert zstd_tpu.decompress(blob) == data


@pytest.mark.parametrize("level", [1, 3])
@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_reference_decodes_our_frames(ref, level, i):
    """The reference binary must decode everything we produce."""
    data = CORPORA[i]
    blob = zstd_tpu.compress(data, level=level, checksum=True)
    assert ref_decompress(blob) == data


def test_skippable_frames():
    from zstd_tpu.format.frame import write_skippable_frame
    data = gen_text(5000)
    blob = (write_skippable_frame(b"metadata!")
            + zstd_tpu.compress(data, level=1)
            + write_skippable_frame(b"", variant=5)
            + zstd_tpu.compress(data[::-1], level=1))
    assert zstd_tpu.decompress(blob) == data + data[::-1]


def test_reference_decodes_skippable(ref):
    from zstd_tpu.format.frame import write_skippable_frame
    data = gen_text(5000)
    blob = write_skippable_frame(b"x" * 100) + zstd_tpu.compress(data, level=1)
    assert ref_decompress(blob) == data


def test_ratio_sanity():
    data = gen_text(200000, seed=7)
    blob = zstd_tpu.compress(data, level=1)
    assert len(blob) < len(data) // 3


def test_superblock_exact_sizing(ref):
    """target_cblock_size produces sub-blocks whose EXACT compressed sizes
    cluster at-or-under the target (zstd_compress_superblock.c's exact
    sub-block sizer role, not just estimator cuts)."""
    import statistics

    import zstd_tpu
    from zstd_tpu.format.frame import parse_frame_header
    from tests.conftest import gen_mixed, gen_text, ref_decompress

    data = gen_text(250_000, seed=91) + gen_mixed(80_000, seed=92)
    tgt = 2048
    blob = zstd_tpu.compress(data, level=5, target_cblock_size=tgt)
    assert zstd_tpu.decompress(blob) == data
    assert ref_decompress(blob) == data
    fh = parse_frame_header(blob)
    pos = fh.header_size
    sizes = []
    while True:
        bh = int.from_bytes(blob[pos : pos + 3], "little")
        last, bt, sz = bh & 1, (bh >> 1) & 3, bh >> 3
        payload = 1 if bt == 1 else sz
        sizes.append(payload)
        pos += 3 + payload
        if last:
            break
    body = sizes[:-1] if len(sizes) > 1 else sizes
    assert max(body) <= tgt * 5 // 4          # no sub-block far over target
    assert statistics.median(body) >= tgt // 3  # and none absurdly small
