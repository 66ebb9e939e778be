"""LZ4 passthrough format (--format=lz4): bundled block codec + frame
layer (native/lz4.c + zstd_tpu/lz4frame.py; role of the reference's
liblz4 glue, programs/fileio.c:1213-1445).

Cross-validated against the system liblz4.so.1 (an independent
implementation) in both directions when present.
"""

import ctypes
import ctypes.util
import subprocess
import sys

import pytest

from zstd_tpu.lz4frame import compress_lz4, decompress_lz4, is_lz4_frame
from zstd_tpu.native import get_native
from tests.conftest import gen_text


def _liblz4():
    for name in ("liblz4.so.1", ctypes.util.find_library("lz4")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


@pytest.mark.parametrize("n", [0, 1, 300, 65536, 300000])
def test_lz4_frame_roundtrip(n):
    data = gen_text(n, seed=n + 1)
    frame = compress_lz4(data)
    assert is_lz4_frame(frame)
    out, consumed = decompress_lz4(frame)
    assert out == data
    assert consumed == len(frame)


def test_lz4_incompressible_stored():
    import random
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(100000))
    frame = compress_lz4(data)
    out, _ = decompress_lz4(frame)
    assert out == data
    assert len(frame) < len(data) + 1024     # stored blocks, tiny overhead


def test_lz4_corruption_detected():
    data = gen_text(50000, seed=9)
    frame = bytearray(compress_lz4(data))
    frame[len(frame) // 2] ^= 0xFF
    with pytest.raises(Exception):
        out, _ = decompress_lz4(bytes(frame))
        assert out == data                    # either raises or mismatches


def test_lz4_xxh32_vectors():
    nat = get_native()
    assert nat.xxh32(b"", 0) == 0x02CC5D05
    assert nat.xxh32(b"Hello World", 0) == 0xB1FD16EE


def test_lz4_cross_liblz4_block():
    lz4 = _liblz4()
    if lz4 is None:
        pytest.skip("liblz4 not present")
    nat = get_native()
    data = gen_text(120000, seed=21)
    # our block -> their decoder
    lz4.LZ4_decompress_safe.restype = ctypes.c_int
    lz4.LZ4_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int]
    blk = nat.lz4_block_compress(data)
    buf = ctypes.create_string_buffer(len(data))
    assert lz4.LZ4_decompress_safe(blk, buf, len(blk), len(data)) \
        == len(data)
    assert buf.raw == data
    # their block -> our decoder
    lz4.LZ4_compress_default.restype = ctypes.c_int
    lz4.LZ4_compress_default.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_int]
    cb = ctypes.create_string_buffer(len(data) + 4096)
    cn = lz4.LZ4_compress_default(data, cb, len(data), len(cb))
    assert cn > 0
    assert nat.lz4_block_decompress(cb.raw[:cn], len(data)) == data


def test_lz4_cross_liblz4_frame():
    lz4 = _liblz4()
    if lz4 is None:
        pytest.skip("liblz4 not present")
    data = gen_text(300000, seed=11)
    lz4.LZ4F_isError.restype = ctypes.c_uint
    lz4.LZ4F_isError.argtypes = [ctypes.c_size_t]
    # our frame -> their frame decoder
    lz4.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lz4.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
    lz4.LZ4F_decompress.restype = ctypes.c_size_t
    lz4.LZ4F_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p]
    frame = compress_lz4(data)
    ctx = ctypes.c_void_p()
    assert lz4.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100) == 0
    out = ctypes.create_string_buffer(len(data) + 16)
    dstsz = ctypes.c_size_t(len(out))
    srcsz = ctypes.c_size_t(len(frame))
    r = lz4.LZ4F_decompress(ctx, out, ctypes.byref(dstsz), frame,
                            ctypes.byref(srcsz), None)
    assert not lz4.LZ4F_isError(r) and r == 0
    assert out.raw[: dstsz.value] == data
    # their frame (block-LINKED default) -> our frame decoder
    lz4.LZ4F_compressFrame.restype = ctypes.c_size_t
    lz4.LZ4F_compressFrame.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_void_p]
    cb = ctypes.create_string_buffer(len(data) + 65536)
    cn = lz4.LZ4F_compressFrame(cb, len(cb), data, len(data), None)
    assert not lz4.LZ4F_isError(cn)
    ours, consumed = decompress_lz4(cb.raw[:cn])
    assert ours == data and consumed == cn


def test_lz4_cli_roundtrip(tmp_path):
    data = gen_text(150000, seed=3)
    f = tmp_path / "a.bin"
    f.write_bytes(data)
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run([sys.executable, "-m", "zstd_tpu.cli",
                        "--format=lz4", str(f)], capture_output=True,
                       env=env)
    assert r.returncode == 0, r.stderr
    lz4f = tmp_path / "a.bin.lz4"
    assert lz4f.exists()
    r = subprocess.run([sys.executable, "-m", "zstd_tpu.cli", "-d", "-c",
                        str(lz4f)], capture_output=True, env=env)
    assert r.returncode == 0, r.stderr
    assert r.stdout == data
