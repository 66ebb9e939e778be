"""Golden conformance vectors from the reference test suite.

Decodes every frame in /root/reference/tests/golden-decompression/ (known
valid frames covering edge shapes: empty blocks, RLE-first, zero-sequence
encodings, 128K blocks), requires typed failures on every file in
golden-decompression-errors/, and round-trips the golden-compression/
inputs through our encoder with the reference binary as the decoder.
These are test DATA files (frames/corpora), the reference's own
conformance bar (tests/README: golden-* suites).
"""

import glob
import os

import pytest

from conftest import REF_ZSTD, have_ref, ref_decompress

import zstd_tpu
from zstd_tpu.errors import ZstdError

GOLD = "/root/reference/tests/golden-decompression"
GOLD_ERR = "/root/reference/tests/golden-decompression-errors"
GOLD_CMP = "/root/reference/tests/golden-compression"


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(GOLD, "*.zst"))),
                         ids=os.path.basename)
def test_golden_decompression(path):
    if not have_ref():
        pytest.skip("reference binary not built")
    blob = open(path, "rb").read()
    expect = ref_decompress(blob)
    assert zstd_tpu.decompress(blob) == expect
    # the pure-Python spec oracle must agree too
    from zstd_tpu.format.codec import decompress as py_decompress
    assert py_decompress(blob) == expect


@pytest.mark.parametrize("path",
                         sorted(glob.glob(os.path.join(GOLD_ERR, "*.zst"))),
                         ids=os.path.basename)
def test_golden_decompression_errors(path):
    blob = open(path, "rb").read()
    with pytest.raises(ZstdError):
        zstd_tpu.decompress(blob)


@pytest.mark.parametrize("path", [p for p in sorted(
    glob.glob(os.path.join(GOLD_CMP, "*"))) if os.path.isfile(p)],
    ids=os.path.basename)
def test_golden_compression_roundtrip(path):
    if not have_ref():
        pytest.skip("reference binary not built")
    data = open(path, "rb").read()
    for level in (1, 3, 19):
        blob = zstd_tpu.compress(data, level=level)
        assert ref_decompress(blob) == data
        assert zstd_tpu.decompress(blob) == data
