"""zstdmt analog: one zstd frame compressed by a device mesh, end-to-end.

Maps the reference's job-parallel single-frame compressor
(/root/reference/lib/compress/zstdmt_compress.c:683 worker,
:588 serialState ordered section) onto a `dp` mesh axis:

  - the frame's 128 KiB blocks are sharded contiguously over devices;
  - each block sees the tail of the *previous* content as window context,
    sized by the overlapLog rule (ZSTDMT_computeOverlapSize,
    zstdmt_compress.c:1210: overlap = window >> (9 - ovlog), default ovlog
    6 for fast strategies .. 9 for btultra2): candidates may point into
    the halo, so match offsets legally cross block AND shard boundaries
    (the decoder window spans the whole frame). The cross-shard halo rides
    ICI via ppermute; the frame's first block has its fabricated halo
    masked off;
  - sequences/literals are emitted only for each block's own bytes
    (emit_from = halo), so the stitched seqstores cover the frame exactly;
  - entropy *planning* (table builds) runs on host from the per-block
    stats vectors, but the pack stage — FSE/Huffman bit-packing and
    region compaction — runs under the SAME shard_map, so compressed
    bytes are produced data-parallel on every device and the host only
    fetches each shard's tight compact prefix (zstdmt worker analog);
  - the in-order stitch + serial XXH64 run on the host, exactly like
    zstdmt's flushProduced/serialState.

Output frames are byte-identical for ANY shard count (the halo is always
"the previous overlap bytes", regardless of which device owns them) — the
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
from ..pipeline import STATS_LEN, TpuCompressor, _STATS_TAIL, _pack_impl
from ..xxhash64 import content_checksum
from .shard_compress import make_mesh

DEFAULT_HALO = 512   # floor: always at least the round-2 short halo


def overlap_size(strategy: int, window_log: int, overlap_log: int = 0) -> int:
    """ZSTDMT_computeOverlapSize analog (zstdmt_compress.c:1182-1226):
    overlap_log 0 = per-strategy default (6 fast .. 9 btultra2);
    overlap = window >> (9 - ovlog)."""
    if overlap_log == 0:
        if strategy >= 8:          # btultra2
            ovlog = 9
        elif strategy >= 6:        # btopt/btultra
            ovlog = 8
        elif strategy >= 4:        # lazy2/btlazy2
            ovlog = 7
        else:
            ovlog = 6
    else:
        ovlog = max(1, min(overlap_log, 9))
    rlog = 9 - ovlog
    if rlog >= 8:
        return 0
    return 1 << max(window_log - rlog, 0)


@functools.partial(
    jax.jit,
    static_argnames=("hash_log", "mls", "seq_cap", "halo", "axis", "mesh"))
def _analyze_sharded(blocks, lens, halo_ok, mesh, hash_log, mls, seq_cap,
                     halo, axis="dp"):
    """Sharded device program A: halo exchange + extract + stats.

    blocks: uint8[B, halo + n] with the halo region zero-filled (it is
    populated on device); lens: int32[B] content lengths; halo_ok: bool[B].
    """
    Bh = blocks.shape[1]

    def per_shard(blk, ln, hok):
        nsh = jax.lax.axis_size(axis)
        # previous content's tail: intra-shard from the neighbor row, block
        # 0 of each shard from the previous shard via ppermute (ICI halo).
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


@functools.partial(
    jax.jit,
    static_argnames=("cap", "out_w_fse", "seg_cap", "out_w_huf", "axis",
                     "mesh"))
def _pack_sharded(llc, mlc, ofc, llx, mlb, ob, nb_seq, lits, nb_lit, blob,
                  mesh, cap, out_w_fse, seg_cap, out_w_huf, axis="dp"):
    """Sharded device program B: every shard bit-packs and compacts its own
    blocks (the zstdmt worker's 'produce compressed bytes' half). Returns
    (compact u8[nsh, capp], sizes i32[B, 7])."""

    def per_shard(llc_, mlc_, ofc_, llx_, mlb_, ob_, ns_, lit_, nl_, pb_):
        buf, sizes = _pack_impl(llc_, mlc_, ofc_, llx_, mlb_, ob_, ns_,
                                lit_, nl_, pb_,
                                cap, out_w_fse, seg_cap, out_w_huf)
        return buf[None], sizes

    # check_vma=False: the pack scan carries start from constant init
    # states (unvarying), which the varying-axis analysis rejects even
    # though every shard runs the identical program on its own rows
    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None),) * 6 + (P(axis), P(axis, None), P(axis),
                                         P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False)
    return shard(llc, mlc, ofc, llx, mlb, ob, nb_seq, lits, nb_lit, blob)


@functools.lru_cache(maxsize=64)
def _shard_prefix_fetcher(nbytes: int):
    """Cached program: fetch the first nbytes of one shard's compact row."""
    return jax.jit(lambda x, s: jax.lax.dynamic_slice(
        x, (s, jnp.int32(0)), (1, nbytes)))


def compress_sharded(data: bytes, level: int = 1, checksum: bool = False,
                     mesh: Mesh | None = None, axis: str = "dp",
                     overlap_log: int = 0) -> bytes:
    """Compress `data` into ONE zstd frame using every device in `mesh`.

    The frame is byte-identical for any mesh size (including 1); the
    reference binary decodes it (cross-checked in tests/test_zstdmt.py).
    overlap_log mirrors ZSTD_c_overlapLog: 0 = strategy default, 9 = a
    full window of cross-boundary context (capped at one block).
    """
    if mesh is None:
        mesh = make_mesh()
    nsh = mesh.devices.size
    n = len(data)
    cparams = get_cparams(level, n)
    block_size = min(1 << cparams.window_log, BLOCK_MAX_SIZE)
    # overlapLog-sized halo (≤ one block: the halo row carries the previous
    # block, which is the farthest contiguous context one extra row gives)
    halo = overlap_size(cparams.strategy, cparams.window_log, overlap_log)
    halo = int(min(max(halo, DEFAULT_HALO), block_size))
    # cross-block offsets may reach up to block_size + halo back; make sure
    # the declared window covers them (decoders check offset <= window)
    window_log = cparams.window_log
    while n > (1 << window_log) and (1 << window_log) < block_size + halo:
        window_log += 1
    out = bytearray(write_frame_header(n, window_log, checksum))
    if n == 0:
        out += (1 | (BT_RAW << 1)).to_bytes(3, "little")
        if checksum:
            out += content_checksum(b"").to_bytes(4, "little")
        return bytes(out)

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
        halo, axis=axis)

    # host: entropy planning from the stats vectors (zstdmt serialState
    # analog — the only ordered section), then the pack stage goes back
    # under the mesh
    comp = TpuCompressor(level=level, checksum=checksum)
    plans, blob, cap, out_w_fse, seg_cap, out_w_huf = comp._build_plans(
        np.asarray(stats), lens, cparams.strategy, halo + block_size)
    r = resident
    compact, sizes_d = _pack_sharded(
        r["llc"], r["mlc"], r["ofc"], r["llx"], r["mlb"], r["ob"],
        r["nb_seq"], r["lits"], r["nb_lit"], jnp.asarray(blob),
        mesh, cap, out_w_fse, seg_cap, out_w_huf, axis=axis)

    # per-shard tight-prefix fetch + in-order stitch (flushProduced analog)
    sizes = np.asarray(sizes_d)              # [B, 7], tiny
    rows = b_pad // nsh
    step = 128 * 1024
    capp = int(compact.shape[1])
    metas: list[dict] = []
    parts: list[np.ndarray] = []
    base = 0
    hdr = rows * 7 * 4   # per-shard sizes header at the compact-buffer head
    for s in range(nsh):
        pl = plans[s * rows : (s + 1) * rows]
        sz = sizes[s * rows : (s + 1) * rows]
        m_s, total = TpuCompressor._region_metas(pl, sz)
        nb = min(max(-(-(hdr + total) // step) * step, step), capp)
        part = np.asarray(_shard_prefix_fetcher(nb)(compact,
                                                    jnp.int32(s)))[0]
        parts.append(part[hdr : hdr + total])
        for m in m_s:
            e = dict(zeroed=m["zeroed"])
            e["fse"] = (m["fse"][0] + base, m["fse"][1])
            e["huf"] = [(o + base, z) for o, z in m["huf"]]
            e["raw"] = (m["raw"][0] + base, m["raw"][1])
            metas.append(e)
        base += total
    compact_h = np.concatenate(parts) if parts else np.zeros(0, np.uint8)

    stageB = {0: (plans, _Done((metas, compact_h)))}
    payloads = comp._finalize(0, {}, stageB, arr, [(0, b_pad)],
                              block_size, cparams)
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


class _Done:
    """Minimal future: already-computed result for _finalize's fut.result()."""

    def __init__(self, value):
        self._v = value

    def result(self):
        return self._v
