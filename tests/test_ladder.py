"""Strategy-ladder tests (levels 3-19): round-trip, cross-decode with the
reference binary, and ratio-parity gates (the regression results.csv analog:
compressed size must not exceed the reference's at the same level).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from tests.conftest import gen_mixed, gen_text, ref_compress, ref_decompress

LEVELS = [3, 5, 7, 9, 12]

CORPORA = {
    "text": gen_text(150000, seed=11),
    "mixed_hi": gen_mixed(100000, seed=12, match_prob=0.7),
    "mixed_lo": gen_mixed(80000, seed=13, match_prob=0.25),
}


@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("name", list(CORPORA))
def test_ladder_roundtrip(level, name):
    data = CORPORA[name]
    blob = zstd_tpu.compress(data, level=level)
    assert zstd_tpu.decompress(blob) == data


@pytest.mark.parametrize("level", LEVELS)
@pytest.mark.parametrize("name", list(CORPORA))
def test_ladder_reference_decodes(ref, level, name):
    data = CORPORA[name]
    blob = zstd_tpu.compress(data, level=level, checksum=True)
    assert ref_decompress(blob) == data


@pytest.mark.parametrize("level", [3, 5, 9])
@pytest.mark.parametrize("name", list(CORPORA))
def test_ratio_parity(ref, level, name):
    """Size must beat or match the reference at the same level (within 1%,
    the dense-table search usually wins outright)."""
    data = CORPORA[name]
    ours = len(zstd_tpu.compress(data, level=level))
    theirs = len(ref_compress(data, f"-{level}"))
    assert ours <= theirs * 1.01, f"{ours} vs ref {theirs}"


def test_small_inputs_all_strategies():
    for level in (3, 5, 7, 12, 16, 19, 22):
        for data in (b"", b"a", b"ab" * 3, b"x" * 500, gen_text(3000, seed=1)):
            blob = zstd_tpu.compress(data, level=level)
            assert zstd_tpu.decompress(blob) == data
