"""Sharded block extraction over a device mesh (collective-structure demo).

Maps the zstdmt job model (SURVEY.md §2.7) onto a `dp` mesh axis: every
device owns a contiguous run of 128 KiB blocks, the previous block's tail is
window *context only* (ppermute halo; sequences are emitted from emit_from
onward, candidates may reach into the halo), and per-shard totals ride a
psum so every participant knows the global layout.

The full end-to-end frame producer lives in `parallel.zstdmt`
(compress_sharded) — this module keeps the minimal step used by
__graft_entry__.dryrun_multichip and the mesh tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.seqextract import extract_batch


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_extract_fn(mesh: Mesh, hash_log: int, mls: int, seq_cap: int,
                       axis: str = "dp"):
    """Returns a jitted fn: (blocks[B, n], lens[B]) -> per-block seqstore
    arrays + per-shard compressed-work summary, with B sharded over `axis`.

    Uses shard_map so the collective structure is explicit: the all_gather of
    per-shard sequence counts mirrors zstdmt's ordered flush bookkeeping.
    """

    HALO = 128  # window-overlap bytes passed neighbor-to-neighbor

    def per_shard(blocks, lens):
        # window halo: the previous shard's last block tail rides ICI via
        # ppermute (zstdmt overlapLog analog); shard 0's first block has no
        # real history, so its candidates into the halo are masked off.
        nsh = jax.lax.axis_size(axis)
        tail = blocks[-1, -HALO:]
        perm = [(i, (i + 1) % nsh) for i in range(nsh)]
        halo = jax.lax.ppermute(tail[None], axis, perm)[0]
        idx = jax.lax.axis_index(axis)

        # extended blocks: block j sees the previous block's tail as search
        # context (intra-shard: its neighbor row; block 0: the cross-shard
        # halo). Sequences are emitted for [HALO, HALO+len) only; offsets may
        # legally reach into the halo — the decoder window spans blocks.
        prev_tails = jnp.concatenate([halo[None], blocks[:-1, -HALO:]], axis=0)
        ext = jnp.concatenate([prev_tails, blocks], axis=1)
        b_loc = blocks.shape[0]
        emit_from = jnp.full((b_loc,), HALO, jnp.int32)
        halo_ok = (jnp.arange(b_loc) > 0) | (idx > 0)
        res = extract_batch(ext, lens + HALO, hash_log, mls, seq_cap,
                            emit_from=emit_from, halo_ok=halo_ok)
        lits = jnp.take_along_axis(ext, res["lit_idx"], axis=1)
        # per-shard totals, exchanged so every shard knows the global layout
        # (one-hot + psum == ordered all-gather, and yields a replicated
        # result the partitioner can verify); the in-order stitch and the
        # serial XXH64 chain stay on the host, as in zstdmt's flushProduced.
        onehot = (jnp.arange(nsh, dtype=jnp.int32) == idx).astype(jnp.int32)
        all_seqs = jax.lax.psum(onehot * jnp.sum(res["nb_seq"]), axis)
        all_lits = jax.lax.psum(onehot * jnp.sum(res["nb_lit"]), axis)
        return dict(nb_seq=res["nb_seq"], ll=res["ll"], off=res["off"],
                    ml=res["ml"], nb_lit=res["nb_lit"], lits=lits,
                    shard_seq_totals=all_seqs, shard_lit_totals=all_lits)

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=dict(nb_seq=P(axis), ll=P(axis, None), off=P(axis, None),
                       ml=P(axis, None), nb_lit=P(axis), lits=P(axis, None),
                       shard_seq_totals=P(None), shard_lit_totals=P(None)),
    )
    return jax.jit(shard)


def compress_step(mesh: Mesh, blocks: np.ndarray, lens: np.ndarray,
                  hash_log: int = 13, mls: int = 6, axis: str = "dp"):
    """One sharded compression step over the mesh (used by dryrun + tests)."""
    b, n = blocks.shape
    seq_cap = max(n // 4, 8)
    fn = sharded_extract_fn(mesh, hash_log, mls, seq_cap, axis)
    sharding = NamedSharding(mesh, P(axis, None))
    blocks_d = jax.device_put(jnp.asarray(blocks), sharding)
    lens_d = jax.device_put(jnp.asarray(lens), NamedSharding(mesh, P(axis)))
    return fn(blocks_d, lens_d)
