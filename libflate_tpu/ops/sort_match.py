"""Sort-based LZ77 candidate finder — content-ordered back-scan.

Sort every position by its big-endian 4-byte prefix word (ties by
position) with the Pallas bitonic kernel (ops/pallas_sort); a
position's best candidates are then its IMMEDIATELY PRECEDING sorted
neighbors: among equal prefixes they are exactly the zlib hash chain
(nearest previous occurrence first), across a prefix boundary they are
the longest-shared-prefix predecessors, and the shared-prefix length
(<= 4) falls out of the key XOR with no data gather at all.  A second
bitonic pass (key = position) restores text order.

vs the round-3 per-lane hash kernel (ops/pallas_lz77): no bucket
collisions (exact prefix grouping), K chain candidates for the price
of K static shifted compares instead of K gather+LCP passes, and no
insert sweep (whose cost was buckets x positions — the encode
pipeline's single largest term at ~26 ms / 8 MiB).

Parity note: replaces the reference's single-slot prefix table
(libflate_lz77/src/default.rs:69-129); candidate quality is a superset
(its table keeps one entry per 3-byte hash, this keeps every
occurrence in prefix order).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_sort import sort_keys, sort_pairs

#: sorted neighbors examined per position (the effective chain depth)
SCAN_K = 8


@functools.partial(jax.jit, static_argnames=("window", "scan_k"))
def sort_candidates(blocks: jnp.ndarray, window: int = 32768,
                    scan_k: int = SCAN_K):
    """(B, n) uint8 member bytes -> (cand, lcp4) both (B, n) int32.

    cand[p]: best earlier position sharing the longest 4-byte-prefix
    (>= 3 bytes) within ``window``, ties to the nearest; -1 if none.
    lcp4[p]: the EXACT shared-prefix length with cand (3 or 4) — a
    length-4 prefix match still extends further (the LCP stage's job).
    """
    bsz, n = blocks.shape
    n_pad = 1 << (n - 1).bit_length()
    assert n_pad <= 1 << 16, "unsort packing holds 16-bit positions"

    d = blocks.astype(jnp.uint32)
    pad = jnp.zeros((bsz, 3), jnp.uint32)
    dd = jnp.concatenate([d, pad], axis=1)
    w4be = ((dd[:, :n] << 24) | (dd[:, 1:n + 1] << 16)
            | (dd[:, 2:n + 2] << 8) | dd[:, 3:n + 3])
    key = (w4be ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    if n_pad != n:  # padding sorts last and is filtered by dist > 0
        key = jnp.pad(key, ((0, 0), (0, n_pad - n)),
                      constant_values=jnp.int32(2 ** 31 - 1))
    pos = jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32)[None, :],
                           (bsz, n_pad))

    ks, ps = sort_pairs(key, pos, tiebreak=True)

    best_score = jnp.full((bsz, n_pad), -1, jnp.int32)
    best_cand = jnp.full((bsz, n_pad), -1, jnp.int32)
    best_l = jnp.zeros((bsz, n_pad), jnp.int32)
    for k in range(1, scan_k + 1):
        kk = jnp.concatenate(
            [jnp.zeros((bsz, k), jnp.int32), ks[:, :-k]], axis=1)
        pp = jnp.concatenate(
            [jnp.full((bsz, k), 1 << 20, jnp.int32), ps[:, :-k]],
            axis=1)
        x = ks ^ kk
        lcp = jnp.where(
            x == 0, 4,
            jnp.where((x & jnp.int32(-16777216)) != 0, 0,
                      jnp.where(x & 0xFF0000, 1,
                                jnp.where(x & 0xFF00, 2, 3))))
        dist = ps - pp
        ok = (dist > 0) & (dist <= window) & (lcp >= 3)
        score = (lcp << 17) + (window - dist)
        upd = ok & (score > best_score)
        best_score = jnp.where(upd, score, best_score)
        best_cand = jnp.where(upd, pp, best_cand)
        best_l = jnp.where(upd, lcp, best_l)

    # unsort as a SINGLE-array sort: pack pos(16) | lcp4==4 flag(1) |
    # dist-1(15) into one int32 (half the bitonic data movement).  The
    # all-ones dist field with a clear flag is the no-candidate
    # sentinel — it also swallows the worthless (dist=32768, lcp=3)
    # corner (zlib's TOO_FAR drops len-3 beyond 4 KiB anyway).
    valid = best_cand >= 0
    ext = valid & (best_l >= 4)
    dist_b = jnp.where(valid, ps - best_cand - 1, 0x7FFF)
    packed = ((ps.astype(jnp.uint32) << 16)
              | (ext.astype(jnp.uint32) << 15)
              | dist_b.astype(jnp.uint32))
    key2 = (packed ^ jnp.uint32(0x80000000)).astype(jnp.int32)
    ks2 = sort_keys(key2)
    u = ks2.astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    pos_o = (u >> 16).astype(jnp.int32)
    dist_o = (u & 0x7FFF).astype(jnp.int32)
    ext_o = ((u >> 15) & 1).astype(jnp.int32)
    none = (ext_o == 0) & (dist_o == 0x7FFF)
    cand = jnp.where(none, -1, pos_o - dist_o - 1)
    lcp4 = jnp.where(none, 0, 3 + ext_o)
    return cand[:, :n], lcp4[:, :n]
