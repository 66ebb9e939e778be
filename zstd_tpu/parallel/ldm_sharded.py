"""Sharded LDM window: device-parallel long-range candidate discovery.

The SURVEY §5 long-context plan made concrete (reference role:
/root/reference/lib/compress/zstd_ldm.c:32 gear fingerprints + bucketed
table; zstdmt's serially-maintained cross-job window,
/root/reference/lib/compress/zstdmt_compress.c:478-640):

  - the input is sharded contiguously over the mesh; each shard computes
    the SAME fingerprint as the host LDM (format/ldm.py) for its own
    positions, elementwise — the 64-bit multiplicative hash is evaluated
    in exact uint32 limb arithmetic (no x64 requirement; only the top 32
    bits are consumed by the anchor predicate and bucket key);
  - the 63-byte fingerprint-window halo comes from the *next* shard via
    ppermute (neighbor halo exchange);
  - anchors are routed to their key-range owner shard via all_to_all
    (the hash-sharded candidate table: owner s holds keys with
    key >> (hash_log - log2 S) == s), where a lexicographic (key, pos)
    sort + a bounded look-back turns bucket membership into per-anchor
    candidate lists with the host table's recency semantics (last
    LDM_BUCKET entries inserted before the anchor's block);
  - the greedy verify/commit walk stays on host (ShardedLdmState is a
    drop-in for format/ldm.LdmState), so sequence selection — and
    therefore compressed size — matches the host --long path wherever
    the candidate sets agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import MIN_MATCH
from ..format.ldm import LDM_BUCKET, LDM_MIN_MATCH, _PRIME64
from ..format.lazy import _ext_fwd
from .shard_compress import make_mesh

_SPAN = 64             # fingerprint window (matches format/ldm.py)
_HASH_LOG = 20
_RATE_LOG = 7
_LOOKBACK = 12         # sorted-neighbor scan depth for candidate recovery
_SENT = jnp.uint32(0xFFFFFFFF)

_P16 = [int(_PRIME64) & 0xFFFF, (int(_PRIME64) >> 16) & 0xFFFF,
        (int(_PRIME64) >> 32) & 0xFFFF, (int(_PRIME64) >> 48) & 0xFFFF]


def _mulp_hi32(vlo, vhi):
    """High 32 bits of (v * PRIME64) mod 2^64, for v given as two uint32
    words — exact 16-bit-limb long multiplication (TPU-safe: no uint64)."""
    a = [vlo & 0xFFFF, vlo >> 16, vhi & 0xFFFF, vhi >> 16]
    cols = [None, None, None, None]
    for i in range(4):
        for j in range(4 - i):
            prod = a[i] * jnp.uint32(_P16[j])
            c = i + j
            lo = prod & 0xFFFF
            cols[c] = lo if cols[c] is None else cols[c] + lo
            if c + 1 < 4:
                hi = prod >> 16
                cols[c + 1] = hi if cols[c + 1] is None else cols[c + 1] + hi
    r0 = cols[0]
    r1 = cols[1] + (r0 >> 16)
    r2 = cols[2] + (r1 >> 16)
    r3 = cols[3] + (r2 >> 16)
    return (r2 & 0xFFFF) | ((r3 & 0xFFFF) << 16)


def _pack32(ext, start, n_pos):
    """uint32 LE word at ext[p+start .. p+start+4) for p in [0, n_pos)."""
    w = ext[start : start + n_pos].astype(jnp.uint32)
    for k in range(1, 4):
        w = w | (ext[start + k : start + k + n_pos].astype(jnp.uint32)
                 << jnp.uint32(8 * k))
    return w


def _fingerprint_hi(ext, n_pos):
    """Top 32 bits of the format/ldm.py fingerprint for every position."""
    h = None
    for off, sh in ((0, 0), (16, 3), (32, 7), (48, 13)):
        m = _mulp_hi32(_pack32(ext, off, n_pos), _pack32(ext, off + 4, n_pos))
        m = m >> jnp.uint32(sh)
        h = m if h is None else h ^ m
    return h


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "cap", "block_size",
                              "window_size", "nsh"))
def _discover(chunks, valid, gbase, mesh, nsh, cap, block_size, window_size,
              axis="dp"):
    """Sharded discovery program. chunks: u8[S, m + SPAN] (halo zero-filled,
    populated on device); valid: i32[S] fingerprint positions per shard;
    gbase: i32[S] global byte offset of each shard.

    Returns (pos i32[S, S*cap], cand i32[S, S*cap, LDM_BUCKET]) where row s
    holds the anchors OWNED by shard s (sentinel -1 padded)."""
    m = chunks.shape[1] - _SPAN
    own_log = _HASH_LOG - max(nsh - 1, 1).bit_length() if nsh > 1 else _HASH_LOG
    # owner = key >> own_log  (key range partition); for nsh not a power of
    # two the top bucket spills into the last shard via clip below

    def per_shard(chunk, nv, gb):
        chunk = chunk[0]
        nv = nv[0]
        gb = gb[0]
        # neighbor halo: first SPAN bytes of the NEXT shard complete the
        # fingerprint windows that straddle the shard boundary
        head = chunk[:_SPAN]
        perm = [(i, (i - 1) % nsh) for i in range(nsh)]
        nxt = jax.lax.ppermute(head[None], axis, perm)[0]
        ext = jnp.concatenate([chunk[:m], nxt])
        hhi = _fingerprint_hi(ext, m)
        p = jnp.arange(m, dtype=jnp.int32)
        is_anchor = ((hhi >> jnp.uint32(32 - _RATE_LOG)) == 0) & (p < nv)
        key = (hhi >> jnp.uint32(32 - _RATE_LOG - _HASH_LOG)) \
            & jnp.uint32((1 << _HASH_LOG) - 1)
        owner = jnp.minimum(key >> jnp.uint32(own_log),
                            jnp.uint32(nsh - 1)).astype(jnp.int32)
        gpos = gb + p

        # compact anchors, grouped by owner: sort (non-anchors last) then
        # scatter each entry to slot owner*cap + rank_within_owner
        route_k = jnp.where(is_anchor, owner, nsh).astype(jnp.uint32)
        order = jnp.argsort(route_k * jnp.uint32(1 << 26)
                            + p.astype(jnp.uint32))
        so = route_k[order]
        sk = key[order]
        sp = gpos[order]
        i = jnp.arange(m, dtype=jnp.int32)
        seg_start = jnp.searchsorted(so, jnp.arange(nsh + 1, dtype=jnp.uint32)
                                     ).astype(jnp.int32)
        within = i - seg_start[jnp.clip(so, 0, nsh).astype(jnp.int32)]
        dst = jnp.where((so < nsh) & (within < cap),
                        so.astype(jnp.int32) * cap + within, nsh * cap)
        buf_k = jnp.full(nsh * cap + 1, _SENT, jnp.uint32).at[dst].set(
            sk, mode="drop")[: nsh * cap]
        buf_p = jnp.full(nsh * cap + 1, -1, jnp.int32).at[dst].set(
            sp, mode="drop")[: nsh * cap]

        # hash-sharded table exchange: slice b of buf goes to owner b
        send_k = buf_k.reshape(nsh, cap)
        send_p = buf_p.reshape(nsh, cap)
        recv_k = jax.lax.all_to_all(send_k, axis, 0, 0).reshape(-1)
        recv_p = jax.lax.all_to_all(send_p, axis, 0, 0).reshape(-1)

        # owner-side: lexicographic (key, pos) sort, bounded look-back for
        # the last LDM_BUCKET same-key entries before each anchor's block
        rp_u = jnp.where(recv_p >= 0, recv_p, jnp.int32(0x7FFFFFFF))
        sk2, sp2 = jax.lax.sort((recv_k, rp_u), num_keys=2)
        cutoff = (sp2 // block_size) * block_size
        n_e = sk2.shape[0]
        cands = []
        ranks = jnp.zeros(n_e, jnp.int32)
        slot = [jnp.full(n_e, -1, jnp.int32) for _ in range(LDM_BUCKET)]
        for k in range(1, _LOOKBACK + 1):
            pk = jnp.concatenate([jnp.full(k, -1, jnp.int32), sp2[:-k]])
            kk = jnp.concatenate([jnp.full(k, _SENT, jnp.uint32), sk2[:-k]])
            ok = ((kk == sk2) & (sk2 != _SENT) & (pk >= 0)
                  & (pk < cutoff) & (sp2 - pk <= window_size))
            for b in range(LDM_BUCKET):
                slot[b] = jnp.where(ok & (ranks == b), pk, slot[b])
            ranks = ranks + ok.astype(jnp.int32)
        pos_out = jnp.where(sk2 == _SENT, -1, sp2)
        cand_out = jnp.stack(slot, axis=1)
        return pos_out[None], cand_out[None]

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None, None)),
        check_vma=False)
    return shard(chunks, valid, gbase)


class ShardedLdmState:
    """Drop-in for format/ldm.LdmState with mesh-parallel discovery.

    Candidate lists are precomputed on the device mesh at construction;
    find_long_matches replays the host greedy verify/commit walk against
    them (same cursor/backward-extension semantics, same size behavior)."""

    def __init__(self, full: np.ndarray, window_log: int,
                 mesh: Mesh | None = None, axis: str = "dp"):
        if mesh is None:
            mesh = make_mesh()
        self.full = full
        self.window_size = 1 << window_log
        n = len(full)
        nsh = mesh.devices.size
        n_pos = max(n - _SPAN + 1, 0)
        block_size = min(self.window_size, 128 * 1024)
        m = -(-max(n_pos, 1) // nsh)           # fingerprint positions/shard
        m = -(-m // 128) * 128                 # lane-friendly
        # anchors/shard ≈ m >> RATE_LOG, split over nsh owners; 4x headroom
        cap = max(m // (32 * nsh), 8)

        chunks = np.zeros((nsh, m + _SPAN), dtype=np.uint8)
        valid = np.zeros(nsh, dtype=np.int32)
        gbase = np.zeros(nsh, dtype=np.int32)
        for s in range(nsh):
            a = s * m
            b = min(a + m + _SPAN, n)
            if a < n:
                chunks[s, : b - a] = full[a:b]
            valid[s] = min(max(n_pos - a, 0), m)
            gbase[s] = a

        sh2 = NamedSharding(mesh, P(axis, None))
        pos_d, cand_d = _discover(
            jax.device_put(jnp.asarray(chunks), sh2),
            jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis))),
            jax.device_put(jnp.asarray(gbase), NamedSharding(mesh, P(axis))),
            mesh, nsh, cap, block_size, self.window_size, axis=axis)
        pos = np.asarray(pos_d).reshape(-1)
        cand = np.asarray(cand_d).reshape(-1, LDM_BUCKET)
        keep = pos >= 0
        pos, cand = pos[keep], cand[keep]
        order = np.argsort(pos, kind="stable")
        self.anchors = pos[order].astype(np.int64)
        self.cands = cand[order]

    # LdmState interface ------------------------------------------------
    def insert_upto(self, pos: int) -> None:
        pass    # candidates are precomputed with block-granular recency

    def find_long_matches(self, block_start: int, block_end: int
                          ) -> list[tuple[int, int, int]]:
        full = self.full
        n = len(full)
        lo = np.searchsorted(self.anchors, block_start)
        hi = np.searchsorted(self.anchors,
                             max(block_end - LDM_MIN_MATCH, block_start))
        out = []
        cursor = block_start
        for ai in range(lo, hi):
            p = int(self.anchors[ai])
            if p < cursor:
                continue
            best_len = 0
            best_c = -1
            for c in self.cands[ai]:
                c = int(c)
                if c < 0 or c >= p or p - c > self.window_size:
                    continue
                limit = min(block_end - p, n - p)
                l = _ext_fwd(full, p, c, limit)
                if l > best_len:
                    best_len = l
                    best_c = c
            if best_len >= LDM_MIN_MATCH:
                s, c2 = p, best_c
                while s > cursor and c2 > 0 and full[s - 1] == full[c2 - 1]:
                    s -= 1
                    c2 -= 1
                    best_len += 1
                out.append((s, best_len, s - c2))
                cursor = s + best_len
        return out


def compress_long_sharded(data: bytes, level: int = 1,
                          checksum: bool = False, long_log: int = 27,
                          mesh: Mesh | None = None) -> bytes:
    """--long=N through the mesh path: sharded candidate discovery feeds
    the standard frame assembly (host inner matcher compresses the gaps)."""
    import dataclasses

    from ..format.frame import compress_frame
    from ..params import get_cparams

    n = len(data)
    cparams = get_cparams(level, n)
    wlog = max(cparams.window_log, min(long_log, max(n - 1, 1).bit_length()))
    cparams = dataclasses.replace(cparams, window_log=wlog)
    full = np.frombuffer(data, dtype=np.uint8)
    state = ShardedLdmState(full, wlog, mesh=mesh)
    return compress_frame(data, cparams, checksum=checksum,
                          ldm_state=state)
