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


def test_mutated_frames_never_crash_and_often_reject():
    """golden-decompression-errors / fuzz-target analog: systematic
    mutations of valid frames must produce a typed error or a clean decode
    — never a crash, hang, or unhandled exception type."""
    from zstd_tpu.errors import ZstdError
    rng = np.random.default_rng(99)
    checked = 0
    rejected = 0
    for seed in range(8):
        frame, expected = gen_frame(seed + 4000)
        muts = []
        # truncations at structural points
        for cut in (4, 5, 8, len(frame) // 2, len(frame) - 1):
            if 0 < cut < len(frame):
                muts.append(frame[:cut])
        # bit flips sweeping the header + early payload + tail
        for pos in list(range(0, min(len(frame), 12))) + \
                [len(frame) // 2, len(frame) - 2]:
            b = bytearray(frame)
            b[pos] ^= 1 << int(rng.integers(8))
            muts.append(bytes(b))
        for m in muts:
            checked += 1
            try:
                out = zstd_tpu.decompress(m, window_log_max=31)
                # silent acceptance must at least be self-consistent
                assert isinstance(out, bytes)
            except ZstdError:
                rejected += 1
            except (ValueError, IndexError, OverflowError) as e:
                raise AssertionError(
                    f"untyped decoder failure {type(e).__name__}: {e}")
    assert checked > 80
    assert rejected > checked // 2  # most mutations must be caught


def test_estimate_sizes_monotone():
    from zstd_tpu.params import estimate_cctx_size, estimate_dctx_size
    # srcSize adjustment can reorder mid levels (as in the reference);
    # the extremes must still order and all must be sane
    sizes = [estimate_cctx_size(lvl, 1 << 20) for lvl in (1, 3, 9, 19)]
    assert sizes[0] < sizes[-1]
    assert all(s > 1 << 16 for s in sizes)
    assert estimate_dctx_size() > 0
    assert estimate_cctx_size(1, 1 << 10) <= estimate_cctx_size(1, 1 << 24)


def test_device_path_rejects_corruption():
    """Device-decoder leg of the mutation matrix (cheap targeted form):
    valid frames decode identically; truncations raise typed errors; and a
    frame whose window is smaller than its match offsets must raise — the
    device path may never clamp a bad offset into silently-wrong bytes
    (host mirror: 'offset beyond window')."""
    import zstd_tpu
    from zstd_tpu.device_decoder import device_decompress
    from zstd_tpu.errors import ZstdError
    frame, expected = gen_frame(6001)
    assert device_decompress(frame, window_log_max=31) == expected
    for m in (frame[: len(frame) // 2], frame[:-1], frame[:7]):
        try:
            out = device_decompress(m, window_log_max=31)
            assert isinstance(out, bytes)
        except ZstdError:
            pass

    # offsets beyond the declared window: compress repetitive data with a
    # 128 KB window (matches at 4 KB offsets), then shrink the window
    # descriptor to 1 KB. Host decoder rejects this; device must too.
    pat = np.random.default_rng(3).integers(
        0, 256, 4096, dtype=np.uint8).tobytes()        # 4 KB period
    data = pat * 64                                    # 256 KB
    blob = bytearray(zstd_tpu.compress(data, level=1, checksum=False,
                                       window_log=17))
    assert not (blob[4] >> 5) & 1, "need a window-descriptor frame"
    blob[5] = 0                                        # window -> 1 KB
    try:
        out = device_decompress(bytes(blob), window_log_max=31)
        raise AssertionError("out-of-window offset accepted")
    except ZstdError:
        pass
    try:
        zstd_tpu.decompress(bytes(blob), window_log_max=31)
        raise AssertionError("host accepted out-of-window offset")
    except ZstdError:
        pass
