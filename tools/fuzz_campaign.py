"""Randomized differential fuzz campaigns against the reference binary.

The tests/fuzz + fuzz.py role (/root/reference/tests/fuzz/README.md):
property-based round-trips and cross-decode with randomized corpora,
levels, and feature combinations, plus mutation fuzzing of valid frames.
Distinct from the CI suite by scale: each invocation draws fresh corpora
from the seed, so repeated runs keep exploring new inputs.

Campaigns run by this harness have caught real bugs the fixed suite
missed: a bit-writer accumulator overflow on deep Huffman codes, a
Corruption escaping compress_literals where the reference emits raw
literals, and finalize_dictionary failing on flat literal statistics
(the ZDICT_flatLit case).

Usage:
  python tools/fuzz_campaign.py core    [iters] [seed]   # roundtrip+cross+mutation
  python tools/fuzz_campaign.py feature [iters] [seed]   # streaming/dict/superblock/long/rsyncable/seekable
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".ref-build", "programs", "zstd")


def _ref_decode(blob: bytes, dict_path=None, long_mode=False) -> bytes:
    cmd = [REF, "-d", "-c"]
    if dict_path:
        cmd += ["-D", dict_path]
    if long_mode:
        cmd += ["--long=31"]
    p = subprocess.run(cmd, input=blob, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()[:200]
    return p.stdout


def _ref_encode(data: bytes, level: int) -> bytes:
    p = subprocess.run([REF, f"-{level}", "-c"], input=data,
                       capture_output=True)
    assert p.returncode == 0
    return p.stdout


def _corpus(rng, kind: int, n: int) -> bytes:
    from conftest import gen_text
    if kind == 0:    # text-like
        return gen_text(n, seed=int(rng.integers(1 << 30)))
    if kind == 1:    # skewed bytes (deep Huffman trees)
        counts = rng.dirichlet(np.full(32, 0.05))
        syms = rng.choice(256, 32, replace=False).astype(np.uint8)
        return bytes(rng.choice(syms, n, p=counts).astype(np.uint8))
    if kind == 2:    # binary with long repeats
        base = rng.integers(0, 256, max(n // 8, 16), dtype=np.uint8).tobytes()
        out = bytearray()
        while len(out) < n:
            s = int(rng.integers(0, max(len(base) - 64, 1)))
            out += base[s : s + int(rng.integers(8, 512))]
        return bytes(out[:n])
    if kind == 3:    # incompressible
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 4:    # runs
        out = bytearray()
        while len(out) < n:
            out += bytes([int(rng.integers(0, 8))]) * int(rng.integers(1, 300))
        return bytes(out[:n])
    recs = []       # mixed structured records
    for _ in range(n // 64 + 1):
        recs.append(int(rng.integers(1 << 31)).to_bytes(8, "little") * 2
                    + b"field=%d;" % int(rng.integers(1000)) * 3)
    return b"".join(recs)[:n]


def campaign_core(iters: int, seed: int) -> int:
    import zstd_tpu
    rng = np.random.default_rng(seed)
    bad = 0
    for it in range(iters):
        kind = int(rng.integers(0, 6))
        n = int(rng.integers(1, 400_000))
        data = _corpus(rng, kind, n)
        level = int(rng.choice([1, 1, 2, 3, 3, 4, 5, 6, 7, 9, 10, 12, 17, 19]))
        checksum = bool(rng.integers(2))
        try:
            blob = zstd_tpu.compress(data, level=level, checksum=checksum)
            assert zstd_tpu.decompress(blob) == data, \
                f"it{it} roundtrip k{kind} L{level} n{n}"
            assert _ref_decode(blob) == data, \
                f"it{it} ref-decode k{kind} L{level} n{n}"
            assert zstd_tpu.decompress(_ref_encode(data, level)) == data, \
                f"it{it} decode-ref k{kind} L{level} n{n}"
            if len(blob) > 16:   # mutation: typed error or clean output only
                m = bytearray(blob)
                for _ in range(int(rng.integers(1, 4))):
                    m[int(rng.integers(8, len(m)))] ^= 1 << int(rng.integers(8))
                try:
                    zstd_tpu.decompress(bytes(m))
                except Exception:
                    pass
        except AssertionError as e:
            bad += 1
            print("FAIL:", e, flush=True)
            if bad > 3:
                break
        if it % 20 == 19:
            print(f"[{it + 1}/{iters}] ok", flush=True)
    print("core done, failures:", bad)
    return 1 if bad else 0


def campaign_feature(iters: int, seed: int) -> int:
    import zstd_tpu
    from zstd_tpu.streaming import CompressStream, DecompressStream
    from zstd_tpu.dictionary import (load_dictionary, compress_with_dict,
                                     decompress_with_dict)
    from zstd_tpu.dict_builder.fastcover import train_from_samples
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    from zstd_tpu import seekable
    rng = np.random.default_rng(seed)
    fails = 0
    for it in range(iters):
        n = int(rng.integers(1000, 600_000))
        data = _corpus(rng, int(rng.integers(0, 3)), n)
        level = int(rng.choice([1, 3, 5, 7]))
        which = it % 6
        try:
            if which == 0:      # streaming with random slicing
                sc = CompressStream(level=level, checksum=True)
                blob = b""
                pos = 0
                while pos < len(data):
                    step = int(rng.integers(1, 100_000))
                    blob += sc.write(data[pos:pos + step])
                    pos += step
                if rng.integers(2):   # e_flush mid-stream is always legal
                    blob += sc.flush()
                blob += sc.finish()
                assert zstd_tpu.decompress(blob) == data
                assert _ref_decode(blob) == data
                sd = DecompressStream(window_log_max=27)
                out = b""
                for i in range(0, len(blob), 7777):
                    out += sd.write(blob[i:i + 7777])
                out += sd.finish()
                assert out == data
            elif which == 1:    # trained dictionary + ref cross-decode
                seg = max(n // 16, 64)
                samples = [data[i:i + seg] for i in range(0, len(data), seg)]
                raw = train_from_samples(samples, max_dict_size=4096)
                dbytes = finalize_dictionary(
                    raw, samples, dict_id=int(rng.integers(1, 1 << 30)),
                    level=level)
                d = load_dictionary(dbytes)
                blob = compress_with_dict(data, d, level=level)
                assert decompress_with_dict(blob, d) == data
                with tempfile.NamedTemporaryFile(delete=False) as f:
                    f.write(dbytes)
                    dp = f.name
                try:
                    assert _ref_decode(blob, dp) == data
                finally:
                    os.unlink(dp)
            elif which == 2:    # superblock target mode
                blob = zstd_tpu.compress(
                    data, level=level,
                    target_cblock_size=int(rng.choice([1024, 4096, 16384])))
                assert zstd_tpu.decompress(blob) == data
                assert _ref_decode(blob) == data
            elif which == 3:    # --long
                blob = zstd_tpu.compress(data, level=level, long_mode=True,
                                         window_log=24)
                assert zstd_tpu.decompress(blob, window_log_max=31) == data
                assert _ref_decode(blob, long_mode=True) == data
            elif which == 4:    # rsyncable multi-frame
                from zstd_tpu.parallel.pzstd import pzstd_compress
                blob = pzstd_compress(data, level=min(level, 3),
                                      checksum=True, workers=1, rsync_log=19)
                assert zstd_tpu.decompress(blob) == data
                assert _ref_decode(blob) == data
            else:               # seekable random-access
                blob = seekable.seekable_compress(
                    data, level=min(level, 3),
                    frame_size=int(rng.choice([4096, 65536])))
                a = int(rng.integers(0, max(n - 1, 1)))
                b = int(rng.integers(a, min(a + 50_000, n)))
                assert seekable.seekable_decompress(blob, a, b - a) == data[a:b]
                assert _ref_decode(blob) == data
        except Exception as e:
            fails += 1
            print(f"FAIL it{it} which={which} L{level} n{n}: "
                  f"{type(e).__name__}: {e}", flush=True)
            if fails > 3:
                break
        if it % 10 == 9:
            print(f"[{it + 1}/{iters}] ok", flush=True)
    print("feature done, failures:", fails)
    return 1 if fails else 0


def main() -> int:
    if not os.path.exists(REF):
        print("reference binary missing; see .claude/skills/verify/SKILL.md",
              file=sys.stderr)
        return 2
    mode = sys.argv[1] if len(sys.argv) > 1 else "core"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else int.from_bytes(
        os.urandom(4), "little")
    print(f"campaign={mode} iters={iters} seed={seed}")
    if mode == "feature":
        return campaign_feature(iters, seed)
    return campaign_core(iters, seed)


if __name__ == "__main__":
    sys.exit(main())
