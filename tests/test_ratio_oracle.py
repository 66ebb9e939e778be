"""Ratio-parity oracle: compressed size must be <= the reference binary's
at the same level, on the pinned mixed corpus (tests/bigcorpus.py).

This is the regression-suite analog of
/root/reference/tests/regression/results.csv (exact silesia.tar sizes per
level); the full 8 MB sweep lives in tools/ratio_report.py — here we gate a
1 MB corpus at the fast levels and a smaller slice at the slow host levels
so CI stays tractable.
"""

import subprocess

import pytest

import zstd_tpu
from tests.bigcorpus import big_corpus
from tests.conftest import REF_ZSTD


def _ref_size(data: bytes, level: int) -> int:
    r = subprocess.run([REF_ZSTD, f"-{level}", "-c"], input=data,
                       capture_output=True, check=True)
    return len(r.stdout)


@pytest.fixture(scope="module")
def corpus1m():
    return big_corpus(1024 * 1024)


@pytest.mark.parametrize("level", [1, 2, 13, 19, 22])
def test_size_le_reference_fast_paths(ref, corpus1m, level):
    ours = zstd_tpu.compress(corpus1m, level=level)
    assert zstd_tpu.decompress(ours) == corpus1m
    ref_sz = _ref_size(corpus1m, level)
    assert len(ours) <= ref_sz, (
        f"level {level}: ours {len(ours)} > ref {ref_sz} "
        f"({(len(ours) - ref_sz) / ref_sz:+.3%})")


@pytest.mark.parametrize("level", [3, 5, 7, 9])
def test_size_le_reference_lazy_levels(ref, corpus1m, level):
    data = corpus1m[: 256 * 1024]
    ours = zstd_tpu.compress(data, level=level)
    assert zstd_tpu.decompress(ours) == data
    ref_sz = _ref_size(data, level)
    assert len(ours) <= ref_sz, (
        f"level {level}: ours {len(ours)} > ref {ref_sz} "
        f"({(len(ours) - ref_sz) / ref_sz:+.3%})")


def test_fast_negative_levels_beat_reference(ref, corpus1m):
    for fast in (1, 3):
        ours = zstd_tpu.compress(corpus1m, level=-fast)
        assert zstd_tpu.decompress(ours) == corpus1m
        r = subprocess.run([REF_ZSTD, f"--fast={fast}", "-c"],
                           input=corpus1m, capture_output=True, check=True)
        assert len(ours) <= len(r.stdout)


def test_level19_8mb_size_le_reference(ref):
    """The former round-2 gap: at 8 MB, level 19's chain walk lost deep-
    window matches to the reference's binary-tree search (+0.6%). The
    suffix-BST matchfinder (native/opt.c bt_search_insert) + persistent
    matcher context must keep us at or below the reference at full corpus
    scale — gated here, not just reported (VERDICT r2 #4)."""
    data = big_corpus(8 * 1024 * 1024)
    ours = zstd_tpu.compress(data, level=19)
    assert zstd_tpu.decompress(ours) == data
    ref_sz = _ref_size(data, 19)
    assert len(ours) <= ref_sz, (
        f"level 19 @ 8MB: ours {len(ours)} > ref {ref_sz} "
        f"(+{100 * (len(ours) / ref_sz - 1):.3f}%)")
