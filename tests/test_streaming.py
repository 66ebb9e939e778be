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


def test_xxh64_incremental_matches_oneshot():
    from zstd_tpu.xxhash64 import Xxh64, xxh64, _xxh64_py
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 100001, dtype=np.uint8).tobytes()
    for seed in (0, 12345):
        h = Xxh64(seed)
        pos = 0
        while pos < len(data):
            k = int(rng.integers(1, 997))
            h.update(data[pos:pos + k])
            pos += k
        assert h.digest() == xxh64(data, seed) == _xxh64_py(data, seed)
    # tiny inputs exercise the <32-byte path
    for n in (0, 1, 7, 31, 32, 33):
        h = Xxh64(0)
        h.update(data[:n])
        assert h.digest() == xxh64(data[:n], 0)
    # reuse after reset
    h = Xxh64(0)
    h.update(b"garbage")
    h.reset()
    h.update(data[:50])
    assert h.digest() == xxh64(data[:50], 0)


def test_decompress_stream_verifies_checksum():
    """Streaming decode must reject a frame whose checksum was corrupted
    (parity: /root/reference/lib/decompress/zstd_decompress.c:1047-1057)."""
    from zstd_tpu.errors import ZstdError, ZstdErrorCode
    data = gen_text(200000, seed=9)
    cs = CompressStream(level=1, checksum=True)
    blob = bytearray(cs.write(data) + cs.finish())
    blob[-2] ^= 0x40  # flip a bit in the stored Content_Checksum
    ds = DecompressStream()
    with pytest.raises(ZstdError) as ei:
        ds.write(bytes(blob))
        ds.finish()
    assert ei.value.code == ZstdErrorCode.checksum_wrong
    # and the pristine frame still verifies
    blob[-2] ^= 0x40
    ds = DecompressStream()
    out = ds.write(bytes(blob)) + ds.finish()
    assert out == data


def test_compress_stream_constant_memory_checksum():
    """CompressStream must not retain input for checksumming (O(1) state)."""
    cs = CompressStream(level=1, checksum=True)
    cs.write(gen_text(300000, seed=4))
    assert not hasattr(cs, "_xxh_parts")
    from zstd_tpu.xxhash64 import Xxh64
    assert isinstance(cs._xxh, Xxh64)


def test_async_fileio_roundtrip(tmp_path):
    """Read-ahead/write-behind threaded file pipeline + sparse decompress
    (fileio_asyncio.c / fileio.c sparse-write analog)."""
    from zstd_tpu.fileio_async import (compress_file_async,
                                       decompress_file_async)
    data = gen_text(300_000, seed=13) + b"\x00" * 200_000 + \
        gen_mixed(100_000, seed=14)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    zst = tmp_path / "in.bin.zst"
    out = tmp_path / "out.bin"
    compress_file_async(str(src), str(zst), level=1)
    assert ref_decompress(zst.read_bytes()) == data
    decompress_file_async(str(zst), str(out), sparse=True)
    assert out.read_bytes() == data
    # the zero run must actually be a hole when the fs supports it
    st = out.stat()
    assert st.st_size == len(data)


def test_compress_stream_beyond_window_trim(ref):
    """Streams longer than 2x the window exercise the retained-buffer trim
    (matchfinder tables keep absolute positions into the shifted buffer;
    matches are content-verified so distances stay correct). Round-trip +
    reference cross-decode on a 9 MB stream with a 2 MB window."""
    from tests.bigcorpus import big_corpus
    data = big_corpus(9 << 20)
    sc = CompressStream(level=1, checksum=True)
    blob = b""
    for i in range(0, len(data), 700_001):
        blob += sc.write(data[i : i + 700_001])
    blob += sc.finish()
    assert zstd_tpu.decompress(blob) == data
    assert ref_decompress(blob) == data
