"""Pallas TPU LZ77 candidate finder — per-lane hash tables in VMEM.

Replaces the argsort-based ``ops.lz77.prefix_candidates`` (the encode
pipeline's dominant cost: XLA sort of 64 Ki keys x 128 members) with
the direct formulation of the reference's single-slot prefix table
(libflate_lz77/src/default.rs:69-129): every position inserts itself
at ``hash(3-byte key)``; the previous occupant is its candidate.

TPU-first decomposition:

* 128 members ride the lanes; each lane owns a private 4096-bucket
  table column in VMEM scratch (persistent across the sequential grid
  walk over position chunks).
* 8 consecutive positions per inner step occupy the sublanes.  Both
  lookup and insert sweep the table's 128 row-groups with static
  slices + selects (Mosaic has no scatter); intra-step recency is
  fixed up with an 8x8 triangular pass so the semantics match the
  strictly sequential reference insert order bucket-for-bucket.
* Hash collisions can surface a wrong-key candidate; the match-length
  stage computes the true LCP, so collisions only cost ratio (a lost
  candidate), never correctness.  The window bound (<= 32 KiB) is
  enforced by the XLA caller.

Keys/hashes are built by XLA (elementwise, fused, negligible); the
kernel only runs the sequential table recurrence that XLA cannot
express without a sort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANES = 128
SUB = 8
#: hash buckets (per-lane single-slot table).  More buckets = fewer
#: collisions = better ratio, at VMEM (BUCKETS*512 B) + insert-sweep
#: cost linear in BUCKETS.  Overridable for A/Bs.
BUCKETS = int(os.environ.get("LIBFLATE_HASH_BUCKETS", "4096"))
GROUPS = BUCKETS // SUB
B_BITS = BUCKETS.bit_length() - 1
FP_BITS = 14                 # fingerprint bits (wrong-key rejection)
CHUNK_POS = 2048             # positions per grid step


def _hash_kernel(h_ref, out_ref, tbl_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        for g in range(GROUPS):
            tbl_ref[pl.ds(g * SUB, SUB), :] = jnp.full(
                (SUB, LANES), -1, jnp.int32)

    base_c = c * CHUNK_POS
    iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)

    def step(t, _):
        hvec = h_ref[pl.ds(t * SUB, SUB), :]   # bucket | (fp << B_BITS)
        hb = hvec & (BUCKETS - 1)
        fp = hvec >> B_BITS
        g = hb >> 3
        lo = hb & 7

        # ---- lookup: tbl[hb[s,l], l] (pre-step state); slots store
        # pos | (fp << 17), so a fingerprint mismatch — a wrong-key
        # bucket collision — rejects to -1 here instead of wasting an
        # LCP evaluation downstream (~2^-14 false accepts; the LCP
        # verifies real bytes either way, so this is purely a filter)
        cand = jnp.full((SUB, LANES), -1, jnp.int32)
        for gg in range(GROUPS):
            grp = tbl_ref[pl.ds(gg * SUB, SUB), :]
            val = jnp.take_along_axis(grp, lo, axis=0)
            cand = jnp.where(g == gg, val, cand)
        cand = jnp.where((cand >= 0) & ((cand >> 17) == fp),
                         cand & 0x1FFFF, -1)

        # ---- intra-step recency: position j's candidate is the latest
        # i < j in this step with the same bucket+fp
        rows = [hvec[j:j + 1, :] for j in range(SUB)]
        crows = [cand[j:j + 1, :] for j in range(SUB)]
        base = base_c + t * SUB
        for j in range(1, SUB):
            for i in range(j):
                crows[j] = jnp.where(rows[j] == rows[i], base + i,
                                     crows[j])
        cand = jnp.concatenate(crows, axis=0)
        out_ref[pl.ds(t * SUB, SUB), :] = cand

        # ---- insert all 8 positions.  Permuting the step's positions
        # by their TARGET SUBLANE first (one take_along inverse map)
        # turns each group write into a single compare+select instead
        # of an 8-way position loop (the round-3 kernel's dominant
        # cost, ~20 ms / 8 MiB — linear in GROUPS x positions).  Three
        # permutation passes cover same-sublane collisions; a position
        # drops only when >= 4 step positions share a (lane, low-3-
        # bucket-bit) cell (measured ~1% of candidates on a dense
        # 6-letter corpus, 0 wrong-key candidates — a dropped insert
        # only loses a future candidate, never correctness).
        stored_vec = ((base + iota)
                      | ((hvec >> B_BITS) << 17))
        u_tgt = hvec & 7
        g_tgt = (hvec & (BUCKETS - 1)) >> 3
        inv1 = jnp.full((SUB, LANES), -1, jnp.int32)
        inv2 = jnp.full((SUB, LANES), -1, jnp.int32)
        inv3 = jnp.full((SUB, LANES), -1, jnp.int32)
        for j in range(SUB):
            hit_u = u_tgt[j:j + 1, :] == iota
            inv3 = jnp.where(hit_u & (inv2 >= 0), inv2, inv3)
            inv2 = jnp.where(hit_u & (inv1 >= 0), inv1, inv2)
            inv1 = jnp.where(hit_u, j, inv1)

        def perm(inv):
            iz = jnp.clip(inv, 0, SUB - 1)
            pv = jnp.take_along_axis(stored_vec, iz, axis=0)
            pg = jnp.where(inv >= 0,
                           jnp.take_along_axis(g_tgt, iz, axis=0), -1)
            return pv, pg

        perm1, pg1 = perm(inv1)
        perm2, pg2 = perm(inv2)
        perm3, pg3 = perm(inv3)
        for gg in range(GROUPS):
            grp = tbl_ref[pl.ds(gg * SUB, SUB), :]
            grp = jnp.where(pg3 == gg, perm3, grp)     # oldest first
            grp = jnp.where(pg2 == gg, perm2, grp)
            grp = jnp.where(pg1 == gg, perm1, grp)     # newest wins
            tbl_ref[pl.ds(gg * SUB, SUB), :] = grp
        return 0

    jax.lax.fori_loop(0, CHUNK_POS // SUB, step, 0)


@functools.partial(jax.jit, static_argnames=())
def hash_candidates(h: jnp.ndarray) -> jnp.ndarray:
    """(n, 128) int32 bucket ids -> (n, 128) int32 previous position
    with the same bucket (-1 if none).  n must divide by CHUNK_POS."""
    n, lanes = h.shape
    assert lanes == LANES and n % CHUNK_POS == 0
    grid = (1, n // CHUNK_POS)
    spec = pl.BlockSpec((CHUNK_POS, LANES), lambda i, j: (j, 0),
                        memory_space=pltpu.VMEM)
    import os
    interpret = os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"
    return pl.pallas_call(
        _hash_kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BUCKETS, LANES), jnp.int32)],
        interpret=interpret,
    )(h.astype(jnp.int32))


@jax.jit
def _keys_hashes(blocks: jnp.ndarray) -> jnp.ndarray:
    """(B, n) uint8 member bytes -> (n, B) int32 packed
    ``bucket | (fingerprint << B_BITS)`` ids: the bucket is the hash's
    top B_BITS, the fingerprint the next FP_BITS — together 26 bits of
    the multiplicative hash, so equality means same bucket AND almost
    surely same 3-byte key."""
    d = blocks.astype(jnp.uint32)
    b, n = d.shape
    pad = jnp.zeros((b, 2), jnp.uint32)
    dd = jnp.concatenate([d, pad], axis=1)
    key = dd[:, :n] | (dd[:, 1:n + 1] << 8) | (dd[:, 2:n + 2] << 16)
    hv = key * jnp.uint32(2654435761)
    bucket = hv >> jnp.uint32(32 - B_BITS)
    fp = (hv >> jnp.uint32(32 - B_BITS - FP_BITS)) & jnp.uint32(
        (1 << FP_BITS) - 1)
    return jnp.transpose(
        (bucket | (fp << B_BITS)).astype(jnp.int32))


def prefix_candidates_pallas(blocks: jnp.ndarray,
                             window: int = 32768) -> jnp.ndarray:
    """(B, n) uint8 -> (B, n) int32 candidates, kernel-backed.

    Bucket-level parity with the reference's single-slot table; the
    window bound is applied here, collision rejection is delegated to
    the LCP stage.
    """
    b, n = blocks.shape
    assert b == LANES, "kernel batch is 128 members (pad the batch)"
    # slots pack position into 17 bits (pos | fp << 17): larger members
    # would silently alias candidate positions (ratio loss, no error)
    assert n <= 1 << 17, "member size exceeds the 128 KiB slot packing"
    n_pad = -(-n // CHUNK_POS) * CHUNK_POS
    h = _keys_hashes(blocks)
    if n_pad != n:
        h = jnp.pad(h, ((0, n_pad - n), (0, 0)))
    cand = hash_candidates(h)[:n]
    cand = jnp.transpose(cand)
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    return jnp.where((cand >= 0) & (idx - cand <= window), cand, -1)
