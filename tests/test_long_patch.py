"""LDM (--long) and --patch-from tests: round-trip, cross-decode with the
reference binary, and long-range ratio gates."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from zstd_tpu.format.codec import compress_patch, decompress_patch
from tests.conftest import REF_ZSTD, gen_text, ref_compress, ref_decompress


def _long_corpus():
    seg = gen_text(512 * 1024, 5)
    filler = gen_text(1536 * 1024, 6)
    return seg + filler + seg + gen_text(64 * 1024, 7)


def test_ldm_roundtrip_and_gain():
    corpus = _long_corpus()
    # plain window (512K) cannot reach the repeat 2M back; LDM must
    plain = zstd_tpu.compress(corpus, level=3, window_log=19)
    longb = zstd_tpu.compress(corpus, level=3, window_log=22, long_mode=True)
    assert zstd_tpu.decompress(longb, window_log_max=22) == corpus
    assert len(longb) < len(plain) - 60 * 1024


def test_ldm_reference_decodes(ref):
    corpus = _long_corpus()
    blob = zstd_tpu.compress(corpus, level=3, window_log=22, long_mode=True,
                             checksum=True)
    assert ref_decompress(blob, "--long=22") == corpus


def test_ldm_beats_reference_long(ref):
    corpus = _long_corpus()
    ours = len(zstd_tpu.compress(corpus, level=3, window_log=22,
                                 long_mode=True))
    theirs = len(ref_compress(corpus, "-3", "--long=22"))
    assert ours <= theirs * 1.02, f"{ours} vs ref {theirs}"


def test_patch_roundtrip():
    old = gen_text(400 * 1024, 11)
    new = old[:100000] + b"edit!" + old[100000:300000] + gen_text(2000, 12) \
        + old[300000:]
    blob = compress_patch(new, old, level=3)
    assert len(blob) < 4096  # a delta, not a recompress
    assert decompress_patch(blob, old) == new


def test_patch_cross_reference(ref):
    old = gen_text(400 * 1024, 13)
    new = old[:200000] + b"xyz" + old[200000:]
    blob = compress_patch(new, old, level=3, checksum=True)
    with tempfile.TemporaryDirectory() as d:
        po = os.path.join(d, "old")
        open(po, "wb").write(old)
        pz = os.path.join(d, "n.zst")
        open(pz, "wb").write(blob)
        r = subprocess.run([REF_ZSTD, "-d", "--patch-from", po, "-c",
                            "--long=31", pz], capture_output=True)
        assert r.returncode == 0 and r.stdout == new
        pn = os.path.join(d, "new")
        open(pn, "wb").write(new)
        r2 = subprocess.run([REF_ZSTD, "--patch-from", po, "-c", pn],
                            capture_output=True, check=True)
        assert decompress_patch(r2.stdout, old, 31) == new


def test_cli_long_and_patch(tmp_path):
    corpus = _long_corpus()
    src = tmp_path / "f.bin"
    src.write_bytes(corpus)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "zstd_tpu.cli", "--long=22",
                        "-c", str(src)], capture_output=True, env=env)
    assert r.returncode == 0
    r2 = subprocess.run([sys.executable, "-m", "zstd_tpu.cli", "-d", "-c",
                         "--long=22"], input=r.stdout, capture_output=True,
                        env=env)
    assert r2.returncode == 0 and r2.stdout == corpus


def test_patch_from_high_level_window_covers_prefix(ref):
    """Round-5 regression: single-segment frame headers set the decoder's
    window to the CONTENT size, stranding matches that reach into the
    --patch-from prefix — level 19's deeper search exposed it (levels
    3/9 never reached far enough). The header must keep the window
    descriptor whenever prefix+content exceeds the content size."""
    import subprocess
    import tempfile
    import os
    from tests.conftest import REF_ZSTD, gen_text
    old = gen_text(400000, seed=50)
    new = bytearray(old)
    for i in range(0, len(new), 9000):
        new[i : i + 40] = gen_text(40, seed=i)
    new = bytes(new)
    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(old)
        oldf = f.name
    try:
        for lvl in (3, 19):
            blob = zstd_tpu.compress_patch(new, old, level=lvl)
            assert zstd_tpu.decompress_patch(blob, old) == new
            r = subprocess.run(
                [REF_ZSTD, "-d", "--patch-from", oldf, "-c", "--long=30"],
                input=blob, capture_output=True)
            assert r.stdout == new, r.stderr[:200]
    finally:
        os.unlink(oldf)
