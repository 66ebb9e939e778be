import os
import subprocess
import sys

# JAX tests run on a virtual 8-device CPU mesh. The axon TPU plugin reads the
# process environment at interpreter startup (a .pth-style hook), so setting
# JAX_PLATFORMS in os.environ here is too late — pin the platform through
# jax.config instead (effective because backends initialize lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REF_ZSTD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".ref-build", "programs", "zstd")


def have_ref() -> bool:
    return os.path.exists(REF_ZSTD)


def ref_compress(data: bytes, *args: str) -> bytes:
    if not have_ref():
        pytest.skip("reference zstd binary not built (.ref-build)")
    r = subprocess.run([REF_ZSTD, "-c", *args], input=data,
                       capture_output=True, check=True)
    return r.stdout


def ref_decompress(data: bytes, *args: str) -> bytes:
    if not have_ref():
        pytest.skip("reference zstd binary not built (.ref-build)")
    r = subprocess.run([REF_ZSTD, "-dc", *args], input=data,
                       capture_output=True, check=True)
    return r.stdout


@pytest.fixture
def ref():
    if not have_ref():
        pytest.skip("reference zstd binary not built (.ref-build)")
    return REF_ZSTD


def gen_text(n: int, seed: int = 0) -> bytes:
    """Compressible lorem-ish test data (datagen.c analog)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"zstd", b"tpu", b"kernel", b"entropy", b"stream",
             b"compression", b"frame", b"block", b"sequence"]
    out = bytearray()
    while len(out) < n:
        out += words[rng.integers(len(words))] + b" "
        if rng.random() < 0.05:
            out += b"\n"
    return bytes(out[:n])


def gen_mixed(n: int, seed: int = 0, match_prob: float = 0.5) -> bytes:
    """Parametrized compressibility (RDG_genBuffer analog)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    out = bytearray()
    while len(out) < n:
        if len(out) > 32 and rng.random() < match_prob:
            off = int(rng.integers(1, min(len(out), 1024)))
            ln = int(rng.integers(4, 32))
            start = len(out) - off
            for i in range(ln):
                out.append(out[start + i])
        else:
            out.append(int(rng.integers(0, 32)))
    return bytes(out[:n])
