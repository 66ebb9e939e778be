"""Multi-host runtime test: N real OS processes form a jax.distributed
group (CPU backend, local coordinator), each compresses its contiguous
shard, and the ordered concatenation decodes — the pzstd multi-host DP
model (SURVEY §2.7 / VERDICT round-1 item 6) exercised without a cluster.
"""

import os
import subprocess
import sys

import pytest

import zstd_tpu
from tests.conftest import gen_mixed, gen_text, ref_decompress

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from zstd_tpu.parallel.multihost import compress_my_shard, init_distributed

idx, cnt = init_distributed()
assert cnt == int(os.environ["JAX_NUM_PROCESSES"]), (idx, cnt)
data = open(os.environ["CORPUS"], "rb").read()
shard = compress_my_shard(data, level=int(os.environ.get("LEVEL", "2")),
                          checksum=True, chunk_size=1 << 16,
                          process_index=idx, process_count=cnt, workers=2)
with open(os.environ["OUT"] + f".{idx}", "wb") as fh:
    fh.write(shard)
print("worker", idx, "ok", len(shard))
"""


@pytest.mark.parametrize("nproc", [2])
def test_multihost_frames_concat_and_decode(tmp_path, nproc, ref):
    data = gen_text(300_000, seed=21) + gen_mixed(100_000, seed=22)
    corpus = tmp_path / "corpus.bin"
    corpus.write_bytes(data)
    out = tmp_path / "shard"

    port = 12397
    procs = []
    for i in range(nproc):
        env = dict(os.environ)
        env.update(
            REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            CORPUS=str(corpus), OUT=str(out),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc), JAX_PROCESS_ID=str(i),
            JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
        )
        procs.append(subprocess.Popen([sys.executable, "-c", _WORKER],
                                      env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    for p in procs:
        try:
            outs, errs = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, errs.decode()[-800:]

    blob = b"".join((out.parent / f"shard.{i}").read_bytes()
                    for i in range(nproc))
    # ordered concatenation is standard multi-frame zstd: our decoder AND
    # the reference binary read it
    assert zstd_tpu.decompress(blob) == data
    assert ref_decompress(blob) == data


def test_single_process_path():
    from zstd_tpu.parallel.multihost import (compress_my_shard,
                                             decompress_stream,
                                             init_distributed)
    idx, cnt = init_distributed()
    assert (idx, cnt) == (0, 1)
    data = gen_text(120_000, seed=5)
    blob = compress_my_shard(data, level=1, process_index=0, process_count=1)
    assert decompress_stream(blob) == data
