"""zstdmt analog: one zstd frame compressed by a device mesh, end-to-end.

Maps the reference's job-parallel single-frame compressor
(/root/reference/lib/compress/zstdmt_compress.c:683 worker,
:588 serialState ordered section) onto a `dp` mesh axis:

  - the frame's 128 KiB blocks are sharded contiguously over devices;
  - each block sees the previous block's tail as *window context* (the
    overlapLog analog): candidates may point into the halo, so match
    offsets legally cross block AND shard boundaries (the decoder window
    spans the whole frame). The cross-shard halo rides ICI via ppermute;
    the frame's first block has its fabricated halo masked off;
  - sequences/literals are emitted only for each block's own bytes
    (emit_from = halo), so the stitched seqstores cover the frame exactly;
  - per-block entropy planning + in-order stitch + the serial XXH64 run on
    the host, exactly like zstdmt's flushProduced/serialState.

Output frames are byte-identical for ANY shard count (the halo is always
"previous block's tail", regardless of which device owns it) — the
determinism-across-shardings property the reference gets from its
serialized job ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import BLOCK_MAX_SIZE, BT_RAW, BT_RLE
from ..format.frame import write_frame_header
from ..ops.codes import seq_codes_block
from ..ops.seqextract import extract_batch
from ..params import get_cparams
from ..pipeline import STATS_LEN, TpuCompressor, _STATS_TAIL
from ..xxhash64 import content_checksum
from .shard_compress import make_mesh

DEFAULT_HALO = 512


@functools.partial(
    jax.jit, static_argnames=("hash_log", "mls", "seq_cap", "axis", "mesh"))
def _analyze_sharded(blocks, lens, halo_ok, mesh, hash_log, mls, seq_cap,
                     axis="dp"):
    """Sharded device program A: halo exchange + extract + stats.

    blocks: uint8[B, halo + n] with the halo region zero-filled (it is
    populated on device); lens: int32[B] content lengths; halo_ok: bool[B].
    """
    Bh = blocks.shape[1]
    halo = DEFAULT_HALO
    n = Bh - halo

    def per_shard(blk, ln, hok):
        nsh = jax.lax.axis_size(axis)
        # previous block's tail: intra-shard from the neighbor row, block 0
        # of each shard from the previous shard via ppermute (ICI halo).
        own = blk[:, halo:]
        tail = own[-1, -halo:]
        perm = [(i, (i + 1) % nsh) for i in range(nsh)]
        prev_shard_tail = jax.lax.ppermute(tail[None], axis, perm)[0]
        prev_tails = jnp.concatenate(
            [prev_shard_tail[None], own[:-1, -halo:]], axis=0)
        ext = jnp.concatenate([prev_tails, own], axis=1)
        emit_from = jnp.full(ln.shape, halo, jnp.int32)
        res = extract_batch(ext, halo + ln, hash_log, mls, seq_cap,
                            emit_from=emit_from, halo_ok=hok)
        lits = jnp.take_along_axis(ext, res["lit_idx"], axis=1)

        j = jnp.arange(Bh, dtype=jnp.int32)

        def stats_block(block, vlen, lit_row, nb_lit, nb_seq, ll, off, ml):
            codes = seq_codes_block(ll, off, ml, nb_seq)
            seg = jnp.maximum((nb_lit + 3) // 4, 1)
            stream = jnp.clip(j // seg, 0, 3)
            lv = (j < nb_lit).astype(jnp.float32)
            stream_oh = (stream[:, None] == jnp.arange(4, dtype=jnp.int32)
                         [None, :]).astype(jnp.float32)
            lit_oh = (lit_row[:, None] == jnp.arange(256, dtype=jnp.int32)
                      [None, :]).astype(jnp.float32)
            lit_hist4 = jnp.einsum("ns,nv->sv", stream_oh * lv[:, None],
                                   lit_oh,
                                   preferred_element_type=jnp.float32)
            lit_hist4 = lit_hist4.astype(jnp.int32)
            all_same = jnp.all((block == block[halo]) | (j < halo)
                               | (j >= halo + vlen))
            stats = jnp.concatenate([
                lit_hist4.reshape(-1),
                codes["ll_hist"], codes["ml_hist"], codes["of_hist"],
                codes["last_codes"],
                jnp.stack([nb_seq, nb_lit, all_same.astype(jnp.int32),
                           lit_row[0].astype(jnp.int32)]),
            ])
            return (jnp.pad(stats, (0, STATS_LEN - stats.shape[0])),
                    codes["llc"], codes["mlc"], codes["ofc"], codes["ob"],
                    codes["mlb"])

        stats, llc, mlc, ofc, ob, mlb = jax.vmap(stats_block)(
            ext, ln, lits, res["nb_lit"], res["nb_seq"],
            res["ll"], res["off"], res["ml"])
        return (stats, dict(llc=llc, mlc=mlc, ofc=ofc, ob=ob, mlb=mlb,
                            llx=res["ll"], lits=lits, nb_lit=res["nb_lit"],
                            nb_seq=res["nb_seq"]))

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis, None),
                   dict(llc=P(axis, None), mlc=P(axis, None),
                        ofc=P(axis, None), ob=P(axis, None),
                        mlb=P(axis, None), llx=P(axis, None),
                        lits=P(axis, None), nb_lit=P(axis),
                        nb_seq=P(axis))),
    )
    return shard(blocks, lens, halo_ok)


def compress_sharded(data: bytes, level: int = 1, checksum: bool = False,
                     mesh: Mesh | None = None, axis: str = "dp") -> bytes:
    """Compress `data` into ONE zstd frame using every device in `mesh`.

    The frame is byte-identical for any mesh size (including 1); the
    reference binary decodes it (cross-checked in tests/test_zstdmt.py).
    """
    if mesh is None:
        mesh = make_mesh()
    nsh = mesh.devices.size
    n = len(data)
    cparams = get_cparams(level, n)
    halo = DEFAULT_HALO
    # cross-block offsets may reach up to block_size + halo back; make sure
    # the declared window covers them (ZSTD_wildcopy-safe decoders check
    # offset <= window_size)
    window_log = cparams.window_log
    if n > (1 << window_log) and (1 << window_log) < BLOCK_MAX_SIZE + halo:
        window_log += 1
    out = bytearray(write_frame_header(n, window_log, checksum))
    if n == 0:
        out += (1 | (BT_RAW << 1)).to_bytes(3, "little")
        if checksum:
            out += content_checksum(b"").to_bytes(4, "little")
        return bytes(out)

    block_size = min(1 << cparams.window_log, BLOCK_MAX_SIZE)
    nb_blocks = (n + block_size - 1) // block_size
    b_pad = ((nb_blocks + nsh - 1) // nsh) * nsh
    arr = np.frombuffer(data, dtype=np.uint8)

    blocks = np.zeros((b_pad, halo + block_size), dtype=np.uint8)
    lens = np.zeros(b_pad, dtype=np.int32)
    for bi in range(nb_blocks):
        s = bi * block_size
        e = min(s + block_size, n)
        blocks[bi, halo : halo + e - s] = arr[s:e]
        lens[bi] = e - s
    halo_ok = np.ones(b_pad, dtype=bool)
    halo_ok[0] = False                       # frame start: no real history

    sharding = NamedSharding(mesh, P(axis, None))
    blocks_d = jax.device_put(jnp.asarray(blocks), sharding)
    lens_d = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P(axis)))
    hok_d = jax.device_put(jnp.asarray(halo_ok), NamedSharding(mesh, P(axis)))

    seq_cap = max(block_size // 4, 8)
    mls = min(max(cparams.min_match, 4), 8)
    stats, resident = _analyze_sharded(
        blocks_d, lens_d, hok_d, mesh, cparams.hash_log, mls, seq_cap,
        axis=axis)

    # host: entropy planning + pack dispatch + in-order stitch (zstdmt
    # serialState/flushProduced analog), via the single-chip machinery
    import concurrent.futures
    comp = TpuCompressor(level=level, checksum=checksum)
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        stageA = {0: (lens, pool.submit(np.asarray, stats), resident)}
        stageB: dict[int, tuple] = {}
        comp._planB(0, stageA, stageB, halo + block_size, cparams, pool)
        payloads = comp._finalize(0, stageA, stageB, arr, [(0, b_pad)],
                                  block_size, cparams)
    finally:
        pool.shutdown(wait=False)
    payloads = payloads[:nb_blocks]

    for i, (payload, btype, blen) in enumerate(payloads):
        last = i == len(payloads) - 1
        if btype == BT_RLE:
            bh = int(last) | (BT_RLE << 1) | (blen << 3)
        else:
            bh = int(last) | (btype << 1) | (len(payload) << 3)
        out += bh.to_bytes(3, "little")
        out += payload
    if checksum:
        out += content_checksum(data).to_bytes(4, "little")
    return bytes(out)
