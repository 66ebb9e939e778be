"""Streaming round-trips with random input slicing (zstreamtest analog)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from zstd_tpu.streaming import CompressStream, DecompressStream
from tests.conftest import gen_mixed, gen_text, ref_decompress


def _random_slices(data: bytes, rng) -> list[bytes]:
    out = []
    pos = 0
    while pos < len(data):
        k = int(rng.integers(1, 65536))
        out.append(data[pos : pos + k])
        pos += k
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compress_stream_roundtrip(seed):
    rng = np.random.default_rng(seed)
    data = gen_text(300000 + seed * 7777, seed=seed)
    cs = CompressStream(level=1, checksum=True)
    blob = bytearray()
    for piece in _random_slices(data, rng):
        blob += cs.write(piece)
    blob += cs.finish()
    assert zstd_tpu.decompress(bytes(blob)) == data


def test_compress_stream_reference_decodes(ref):
    data = gen_mixed(200000, seed=3)
    cs = CompressStream(level=1, checksum=True)
    blob = cs.write(data) + cs.finish()
    assert ref_decompress(bytes(blob)) == data


def test_compress_stream_empty():
    cs = CompressStream(level=1)
    blob = cs.finish()
    assert zstd_tpu.decompress(blob) == b""


def test_compress_stream_flush_boundaries():
    data = gen_text(100000, seed=4)
    cs = CompressStream(level=1)
    blob = bytearray()
    blob += cs.write(data[:1000])
    blob += cs.flush()          # forces a short block
    blob += cs.write(data[1000:])
    blob += cs.finish()
    assert zstd_tpu.decompress(bytes(blob)) == data


@pytest.mark.parametrize("seed", [0, 1])
def test_decompress_stream_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    data = gen_text(400000, seed=seed) + gen_mixed(100000, seed=seed)
    blob = zstd_tpu.compress(data, level=1, checksum=True) \
        + zstd_tpu.compress(data[:5000], level=3)
    ds = DecompressStream()
    out = bytearray()
    for piece in _random_slices(blob, rng):
        out += ds.write(piece)
    out += ds.finish()
    assert bytes(out) == data + data[:5000]


def test_decompress_stream_reference_frames(ref):
    from tests.conftest import ref_compress
    data = gen_text(250000, seed=9)
    blob = ref_compress(data, "-3")
    ds = DecompressStream()
    out = ds.write(blob) + ds.finish()
    assert out == data


def test_decompress_stream_byte_at_a_time():
    data = gen_text(20000, seed=5)
    blob = zstd_tpu.compress(data, level=1)
    ds = DecompressStream()
    out = bytearray()
    for i in range(len(blob)):
        out += ds.write(blob[i : i + 1])
    out += ds.finish()
    assert bytes(out) == data
