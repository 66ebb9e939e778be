"""TPU pipeline tests (run on CPU backend with a virtual device mesh)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from zstd_tpu import pipeline
from tests.conftest import gen_mixed, gen_text, ref_decompress


CASES = [
    gen_text(1000),
    gen_text(200000, seed=1),          # multi-block
    gen_mixed(140000, seed=2, match_prob=0.6),
    b"\x00" * 150000,                  # RLE-ish
    np.random.default_rng(3).integers(0, 256, 140000, dtype=np.uint8).tobytes(),
    bytes(range(256)) * 600,
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_pipeline_roundtrip(i):
    data = CASES[i]
    blob = pipeline.compress(data, level=1, checksum=True)
    assert zstd_tpu.decompress(blob) == data


@pytest.mark.parametrize("i", range(len(CASES)))
def test_pipeline_reference_decodes(ref, i):
    data = CASES[i]
    blob = pipeline.compress(data, level=1, checksum=True)
    assert ref_decompress(blob) == data


def test_pipeline_ratio_close_to_oracle():
    data = gen_text(250000, seed=9)
    tpu_blob = pipeline.compress(data, level=1)
    oracle_blob = zstd_tpu.compress(data, level=1)
    # block-local window + no rep-probing costs a little; stay within 15%
    assert len(tpu_blob) < len(oracle_blob) * 1.03
