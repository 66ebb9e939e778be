"""decodecorpus analog (reference tests/decodecorpus.c): generate random
VALID frames from spec-level building blocks plus randomized round-trips,
and cross-check our decoder against the reference binary on both.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from zstd_tpu.format.frame import write_skippable_frame
from tests.conftest import REF_ZSTD, gen_mixed, gen_text, ref_decompress


def _random_payload(rng) -> bytes:
    kind = rng.integers(0, 5)
    n = int(rng.integers(0, 200000))
    if kind == 0:
        return b""
    if kind == 1:
        return bytes([int(rng.integers(0, 256))]) * n          # RLE-able
    if kind == 2:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()  # random
    if kind == 3:
        return gen_text(n, int(rng.integers(0, 1 << 30)))
    return gen_mixed(n, int(rng.integers(0, 1 << 30)),
                     float(rng.random()))


@pytest.mark.parametrize("seed", range(8))
def test_generated_frames_cross_decode(ref, seed):
    """Random multi-frame streams (varying levels, checksums, skippables):
    the reference binary and our decoder must agree byte-for-byte."""
    rng = np.random.default_rng(seed)
    stream = bytearray()
    expect = bytearray()
    for _ in range(int(rng.integers(1, 4))):
        if rng.random() < 0.3:
            stream += write_skippable_frame(
                rng.integers(0, 256, int(rng.integers(0, 64)),
                             dtype=np.uint8).tobytes(),
                variant=int(rng.integers(0, 16)))
        payload = _random_payload(rng)
        level = int(rng.integers(1, 20))
        stream += zstd_tpu.compress(payload, level=level,
                                    checksum=bool(rng.random() < 0.5))
        expect += payload
    ours = zstd_tpu.decompress(bytes(stream))
    theirs = ref_decompress(bytes(stream))
    assert ours == bytes(expect)
    assert theirs == bytes(expect)


@pytest.mark.parametrize("seed", range(4))
def test_reference_generated_roundtrip(ref, seed):
    """Reference-encoded random payloads at random levels decode here."""
    rng = np.random.default_rng(100 + seed)
    payload = _random_payload(rng)
    level = int(rng.integers(1, 20))
    r = subprocess.run([REF_ZSTD, "-c", f"-{level}"], input=payload,
                       capture_output=True, check=True)
    assert zstd_tpu.decompress(r.stdout) == payload


DECODECORPUS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".ref-build", "decodecorpus")


@pytest.mark.skipif(not os.path.exists(DECODECORPUS),
                    reason="reference decodecorpus tool not built "
                           "(make -C /tmp/ref-src/tests decodecorpus)")
def test_reference_decodecorpus_frames_decode(tmp_path):
    """THE reference's own spec-space frame generator (tests/decodecorpus.c)
    as an independent conformance oracle: every generated valid frame must
    decode bit-exactly through our decoder."""
    zdir = tmp_path / "z"
    odir = tmp_path / "o"
    zdir.mkdir()
    odir.mkdir()
    subprocess.run([DECODECORPUS, f"-p{zdir}/", f"-o{odir}/", "-n100",
                    "-s11"], check=True, capture_output=True)
    names = sorted(os.listdir(zdir))
    assert len(names) == 100
    for name in names:
        blob = (zdir / name).read_bytes()
        want = (odir / name.replace(".zst", "")).read_bytes()
        assert zstd_tpu.decompress(blob, window_log_max=31) == want, name
