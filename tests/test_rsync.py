"""--rsyncable: content-defined sync points (ZSTD_c_rsyncable analog).

Reference behavior under test: zstdmt_compress.c:833-1799 — rolling-hash
cut points with a 128 KiB minimum block, so a local edit re-synchronizes
the chunking and the compressed stream shares its tail with the original.
"""

import numpy as np
import pytest

from conftest import gen_text

from zstd_tpu.rsync import (WINDOW, _window_hashes, _PRIME, split_rsyncable,
                            sync_points)


def test_window_hash_matches_bruteforce():
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 256, 3000, dtype=np.uint8)
    h = _window_hashes(buf)
    assert h.shape[0] == 3000 - WINDOW + 1
    M, P = 1 << 64, int(_PRIME)
    for i in (0, 1, 500, 2999 - WINDOW + 1 - 1):
        bf = 0
        for j in range(WINDOW):
            bf = (bf + int(buf[i + j]) * pow(P, WINDOW - 1 - j, M)) % M
        assert bf == int(h[i])


def test_segmented_scan_matches_whole(monkeypatch):
    # the bounded-memory segment walk must produce the same points as one
    # whole-buffer scan
    import zstd_tpu.rsync as rs
    data = np.random.default_rng(3).integers(
        0, 256, 300_000, dtype=np.uint8).tobytes()
    whole = sync_points(data, avg_log=12, min_block=1024)
    monkeypatch.setattr(rs, "_SEG", 1 << 14)
    seg = rs.sync_points(data, avg_log=12, min_block=1024)
    assert whole == seg and len(whole) > 10


def test_spacing_bounds():
    data = np.random.default_rng(9).integers(
        0, 256, 1 << 20, dtype=np.uint8).tobytes()
    pts = sync_points(data, avg_log=13, min_block=4096)
    bounds = [0] + pts + [len(data)]
    gaps = [b - a for a, b in zip(bounds, bounds[1:])]
    assert min(gaps[:-1]) >= 4096
    assert max(gaps) <= 2 << 13
    # mean spacing within 3x of the target on random data
    assert (1 << 13) / 3 < sum(gaps) / len(gaps) < 3 * (1 << 13)


def test_edit_locality():
    data = bytearray(gen_text(2_000_000, seed=11))
    pts1 = sync_points(bytes(data), avg_log=16, min_block=16384)
    data[1_000_000] ^= 0x5A
    pts2 = sync_points(bytes(data), avg_log=16, min_block=16384)
    before1 = [p for p in pts1 if p <= 1_000_000]
    before2 = [p for p in pts2 if p <= 1_000_000]
    assert before1 == before2, "points before the edit must be unchanged"
    # points re-synchronize within a few chunks after the edit
    tail1 = [p for p in pts1 if p > 1_000_000 + 4 * (1 << 16)]
    tail2 = [p for p in pts2 if p > 1_000_000 + 4 * (1 << 16)]
    assert tail1 and tail1 == tail2


def test_rsyncable_stream_shares_tail_and_decodes():
    import zstd_tpu
    from zstd_tpu.parallel.pzstd import pzstd_compress, pzstd_decompress
    data = gen_text(1_500_000, seed=4)
    out1 = pzstd_compress(data, level=1, workers=2, rsync_log=17)
    assert pzstd_decompress(out1) == data
    edited = bytearray(data)
    edited[700_000] ^= 0xFF
    edited = bytes(edited)
    out2 = pzstd_compress(edited, level=1, workers=2, rsync_log=17)
    assert pzstd_decompress(out2) == edited
    # rsync property: long common suffix after a mid-stream edit
    n = min(len(out1), len(out2))
    suffix = 0
    while suffix < n and out1[len(out1) - 1 - suffix] == \
            out2[len(out2) - 1 - suffix]:
        suffix += 1
    assert suffix > len(out1) // 5, f"common suffix only {suffix}"
    # and a long common prefix before the edit
    prefix = 0
    while prefix < n and out1[prefix] == out2[prefix]:
        prefix += 1
    assert prefix > len(out1) // 5


def test_cli_rsyncable(tmp_path, ref):
    from zstd_tpu.cli import main
    import subprocess
    src = tmp_path / "in.bin"
    src.write_bytes(gen_text(600_000, seed=2))
    assert main(["-3", "--rsyncable", "-q", str(src)]) == 0
    zst = tmp_path / "in.bin.zst"
    assert zst.exists()
    out = subprocess.run([ref, "-dc", str(zst)],
                         capture_output=True, check=True)
    assert out.stdout == src.read_bytes()


def test_split_roundtrip_empty_and_small():
    assert split_rsyncable(b"") == [b""]
    small = b"abc" * 100
    assert b"".join(split_rsyncable(small)) == small
