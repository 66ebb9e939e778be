"""COVER trainer, block splitter, and external sequence producer tests."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zstd_tpu
from tests.conftest import gen_text, ref_decompress


def test_cover_trainer_roundtrip():
    from zstd_tpu.dict_builder.cover import train_from_samples_cover
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    from zstd_tpu.dictionary import (load_dictionary, compress_with_dict,
                                     decompress_with_dict)
    samples = [gen_text(2500, s) for s in range(30)]
    raw = train_from_samples_cover(samples, 8192)
    d = load_dictionary(finalize_dictionary(raw, samples, dict_id=42))
    data = gen_text(3000, 99)
    blob = compress_with_dict(data, d, level=3)
    assert decompress_with_dict(blob, d) == data
    assert len(blob) < len(zstd_tpu.compress(data, level=3))


def test_optimize_cover():
    from zstd_tpu.dict_builder.cover import optimize_train
    samples = [gen_text(1500, s) for s in range(20)]
    content, params = optimize_train(samples, 4096, cover=True)
    assert params["k"] in (256, 512, 1024, 2048)
    assert len(content) <= 4096


def test_block_splitter_triggers_and_roundtrips(ref):
    rng = np.random.default_rng(3)
    corpus = (gen_text(200000, 1)
              + rng.integers(0, 256, 150000, dtype=np.uint8).tobytes()
              + gen_text(150000, 2))
    from zstd_tpu.format.frame import _split_points
    pts = _split_points(np.frombuffer(corpus, np.uint8), 131072, 262144)
    assert pts, "expected a split near the text/random boundary"
    assert abs(pts[0] - 200000) < 8192
    blob = zstd_tpu.compress(corpus, level=16)
    assert ref_decompress(blob) == corpus


def test_external_sequence_producer(ref):
    data = b"abcdefgh" * 4000

    def producer(full, bs, be, wl):
        # trivial producer: one long rep of the 8-byte period
        if be - bs < 64:
            return None
        ml = (be - bs) - 16
        ml -= ml % 8
        return [(8, 8, ml)]

    zstd_tpu.register_sequence_producer(producer)
    try:
        blob = zstd_tpu.compress(data, level=3, checksum=True)
    finally:
        zstd_tpu.register_sequence_producer(None)
    assert ref_decompress(blob) == data
    assert len(blob) < 200


def test_sequence_producer_validation():
    from zstd_tpu.errors import ZstdError

    def bad(full, bs, be, wl):
        return [(0, 999999, 100)]  # offset beyond window

    zstd_tpu.register_sequence_producer(bad)
    try:
        with pytest.raises(Exception):
            zstd_tpu.compress(b"x" * 50000, level=3)
    finally:
        zstd_tpu.register_sequence_producer(None)


def test_pzstd_parallel_frames(ref):
    from zstd_tpu.parallel.pzstd import pzstd_compress, pzstd_decompress
    data = gen_text(3 * 1024 * 1024, 21)
    blob = pzstd_compress(data, level=1, workers=4, chunk_size=1 << 20)
    assert pzstd_decompress(blob, workers=4) == data
    assert ref_decompress(blob) == data
    # shards concatenate in order (the multi-host model)
    b0 = pzstd_compress(data, level=1, chunk_size=1 << 20,
                        shard_index=0, shard_count=2)
    b1 = pzstd_compress(data, level=1, chunk_size=1 << 20,
                        shard_index=1, shard_count=2)
    assert pzstd_decompress(b0 + b1) == data


def test_pzstd_process_pool_encode(ref):
    """VERDICT r2 item #8: -T# encode workers must actually overlap.
    The process executor gives true compute parallelism (no GIL); output
    stays standard multi-frame zstd the reference binary decodes."""
    from zstd_tpu.parallel.pzstd import pzstd_compress, pzstd_decompress
    data = gen_text(2 * 1024 * 1024, 22)
    blob = pzstd_compress(data, level=1, workers=2, chunk_size=1 << 20,
                          executor="process")
    assert pzstd_decompress(blob) == data
    assert ref_decompress(blob) == data
    # byte-identical to the thread executor (determinism across executors)
    blob_t = pzstd_compress(data, level=1, workers=2, chunk_size=1 << 20,
                            executor="thread")
    assert blob == blob_t


def test_native_encode_releases_gil():
    """The native DP parser (ctypes) must release the GIL while parsing so
    thread workers overlap compute with Python (pzstd thread mode and the
    async I/O pipeline depend on it)."""
    import threading
    import time
    import zstd_tpu

    data = gen_text(1 << 20, 23)
    ticks = [0]
    stop = threading.Event()

    def counter():
        while not stop.is_set():
            ticks[0] += 1
            time.sleep(0.001)

    t = threading.Thread(target=counter, daemon=True)
    t.start()
    t0 = time.time()
    zstd_tpu.compress(data, level=12)      # native opt DP does the work
    dt = time.time() - t0
    stop.set()
    t.join(timeout=1)
    # if the C call held the GIL the counter would tick only between
    # blocks (~8 times); overlapped it ticks hundreds of times per second
    assert ticks[0] > max(50 * dt, 20), (ticks[0], dt)


def test_sharded_halo_mesh():
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    import numpy as np
    from zstd_tpu.parallel.shard_compress import compress_step, make_mesh
    mesh = make_mesh(4)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 32, 512, dtype=np.uint8)
    blocks = np.tile(base, (8, 4))
    lens = np.full(8, 2048, dtype=np.int32)
    out = compress_step(mesh, blocks, lens, hash_log=10, mls=5)
    assert out["shard_seq_totals"].shape == (4,)
    assert int(np.sum(np.asarray(out["nb_seq"]))) > 0


def test_target_cblock_size_superblock(ref):
    """ZSTD_c_targetCBlockSize analog: blocks near the requested compressed
    size (low-latency streaming), still reference-decodable."""
    from zstd_tpu.format.frame import parse_frame_header
    data = gen_text(200_000, seed=3)
    blob = zstd_tpu.compress(data, level=3, target_cblock_size=2048)
    assert zstd_tpu.decompress(blob) == data
    assert ref_decompress(blob) == data
    hdr = parse_frame_header(blob, 31)
    pos = hdr.header_size
    sizes = []
    while True:
        bh = int.from_bytes(blob[pos : pos + 3], "little")
        pos += 3
        btype = (bh >> 1) & 3
        s = 1 if btype == 1 else bh >> 3
        pos += s
        sizes.append(s)
        if bh & 1:
            break
    assert len(sizes) >= 8
    assert max(sizes) <= 4 * 2048  # near the target, never wildly over


def test_frame_inspection_api():
    """zstd.h stable-surface analogs: compressBound, getFrameContentSize,
    findFrameCompressedSize, isFrame, getDictID_fromFrame/fromDict —
    validated against real frames and the reference's bound guarantee."""
    import zstd_tpu
    from conftest import gen_text
    from zstd_tpu.format.frame import write_skippable_frame
    data = gen_text(50_000, seed=17)
    blob = zstd_tpu.compress(data, level=3, checksum=True)
    assert zstd_tpu.is_frame(blob)
    assert not zstd_tpu.is_frame(b"\x00\x01\x02\x03\x04")
    assert zstd_tpu.get_frame_content_size(blob) == len(data)
    assert zstd_tpu.find_frame_compressed_size(blob) == len(blob)
    # multi-frame walking with a skippable in front
    sk = write_skippable_frame(b"metadata!")
    stream = sk + blob + blob
    p = 0
    sizes = []
    while p < len(stream):
        s = zstd_tpu.find_frame_compressed_size(stream, p)
        sizes.append(s)
        p += s
    assert sizes == [len(sk), len(blob), len(blob)]
    assert zstd_tpu.get_frame_content_size(stream, 0) == 0  # skippable
    # compress_bound holds for adversarial (incompressible) inputs
    import numpy as np
    rng = np.random.default_rng(1)
    for n in (0, 1, 13, 1000, 200_000):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        out = zstd_tpu.compress(raw, level=1, checksum=True)
        assert len(out) <= zstd_tpu.compress_bound(n), n
    # dict IDs
    from zstd_tpu.dictionary import load_dictionary, compress_with_dict
    from zstd_tpu.dict_builder.fastcover import train_from_samples
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    samples = [data[i:i+5000] for i in range(0, len(data), 5000)]
    dbytes = finalize_dictionary(train_from_samples(samples, 2048),
                                 samples, dict_id=777, level=3)
    assert zstd_tpu.get_dict_id_from_dict(dbytes) == 777
    assert zstd_tpu.get_dict_id_from_dict(b"raw content dict") == 0
    d = load_dictionary(dbytes)
    db = compress_with_dict(data, d, level=3)
    assert zstd_tpu.get_dict_id_from_frame(db) == 777
    assert zstd_tpu.get_dict_id_from_frame(blob) == 0


def test_superblock_sections_treeless_reuse(ref):
    """True superblock sections (round-4 VERDICT #7,
    zstd_compress_superblock.c:263,506-529 role): pieces share ONE
    region Huffman table — the first piece emits it, later pieces are
    treeless — and the result must be reference-decodable AND strictly
    smaller than per-piece tables would allow at small targets."""
    import subprocess
    from tests.conftest import REF_ZSTD, gen_text
    from zstd_tpu.format.frame import parse_frame_header
    data = gen_text(400000, seed=33)
    for tgt in (1024, 4096):
        ours = zstd_tpu.compress(data, level=3, target_cblock_size=tgt)
        assert zstd_tpu.decompress(ours) == data
        r = subprocess.run([REF_ZSTD, "-dc"], input=ours,
                           capture_output=True)
        assert r.stdout == data
        # pieces must actually use treeless (repeat-table) literals
        hdr = parse_frame_header(ours, 31)
        p = hdr.header_size
        last = 0
        treeless = 0
        blocks = 0
        while not last:
            bh = int.from_bytes(ours[p : p + 3], "little")
            p += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            blocks += 1
            if btype == 2 and (ours[p] & 3) == 3:
                treeless += 1
            p += bsize if btype != 1 else 1
        assert blocks > 5, "target size did not split the frame"
        assert treeless >= blocks // 2, (
            f"tgt {tgt}: only {treeless}/{blocks} treeless pieces")
        # reference's own superblock output is the parity bar
        import tempfile, os
        with tempfile.NamedTemporaryFile(delete=False) as f:
            f.write(data)
            fn = f.name
        r = subprocess.run(
            [REF_ZSTD, "-3", f"--target-compressed-block-size={tgt}",
             "-c", fn], capture_output=True)
        os.unlink(fn)
        assert len(ours) <= len(r.stdout), (
            f"tgt {tgt}: ours {len(ours)} > ref superblock {len(r.stdout)}")


def test_host_parser_overrides_roundtrip(ref):
    """Every ZSTD_TPU_HOST_PARSER override must keep producing valid,
    reference-decodable frames (the alternates are part of the
    capability surface, not dead code)."""
    import os
    import subprocess
    from tests.conftest import REF_ZSTD, gen_text, gen_mixed
    data = gen_text(120000, seed=5) + gen_mixed(60000, seed=6)
    for mode in ("chain", "dp", "greedy", "fast"):
        os.environ["ZSTD_TPU_HOST_PARSER"] = mode
        try:
            for level in (1, 3, 5, 9):
                blob = zstd_tpu.compress(data, level=level)
                assert zstd_tpu.decompress(blob) == data, (mode, level)
                r = subprocess.run([REF_ZSTD, "-dc"], input=blob,
                                   capture_output=True)
                assert r.stdout == data, (mode, level)
        finally:
            os.environ.pop("ZSTD_TPU_HOST_PARSER", None)
