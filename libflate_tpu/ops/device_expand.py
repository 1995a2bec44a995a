"""Device-resident LZ77 expansion — the decode chain's second half.

Replaces ops.deflate_decode.expand_tokens_device (generic XLA pointer
doubling, ~1.16 s per 8 MiB: every gather rides XLA's ~85 M elem/s
ceiling and RLE runs make chains thousands deep) with a TPU-first
decomposition (reference hot loop being replaced:
src/deflate/decode.rs:112-130 + libflate_lz77/src/lib.rs:164-194):

1. **Fused token-id rank + field gather** — output position -> covering
   token id via coarse per-128-bucket counts (cheap fused XLA one-hots)
   plus an in-kernel binary-search fine rank, fused with the token
   field gather in ONE Pallas pass (ops/pallas_rank.rank_gather_fields).
2. **Mod-collapse** — a byte inside an overlapped (RLE) copy jumps
   straight to the PRE-TOKEN source: src(p) = (p - s) % d + s - d.
   Every chain step then crosses a token boundary, so chain depth drops
   from output-run length (thousands) to the token DAG depth (~10-200
   on text; measured mean 9-36).
3. **Fused chase + materialize** — ONE Pallas kernel pass
   (ops/pallas_expand.resolve_bytes) walks 4 KiB superblocks in order:
   a far fetch serves sources in earlier superblocks from a
   precomputed hit-row list (SMEM), then in-register doubling resolves
   intra-block chains and sibling selects cover the same superblock;
   resolved bytes store sublane-packed (4 per int32).

Members are independent (PGZF container) — no cross-member history.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_cap",))
def expand_members(packed: jnp.ndarray, n_tokens: jnp.ndarray,
                   out_cap: int):
    """Expand packed LZ77 tokens into plaintext, fully on device.

    Args:
        packed: (B, T) int32 tokens ``a | (b << 9)`` (a = literal byte
            or match length; b = distance, 0 for literals) — the sync
            kernel / native packing.
        n_tokens: (B,) int32 valid token counts.
        out_cap: static output capacity per member (multiple of 1024).

    Returns:
        (out (B, out_cap) uint8, n_out (B,) int32, err (B,) bool).
        err: bad distance (reaches before the member) or output
        overflow.
    """
    from .pallas_expand import resolve_bytes

    bsz, t = packed.shape
    a = packed & 511
    b = (packed >> 9) & 0xFFFF
    tidx = jnp.arange(t, dtype=jnp.int32)
    valid = tidx[None, :] < n_tokens[:, None]
    is_match = valid & (b > 0)
    lens = jnp.where(valid, jnp.where(is_match, a, 1), 0)
    ends = jnp.cumsum(lens, axis=1)
    starts = ends - lens
    n_out = ends[:, -1]
    overflow = n_out > out_cap
    # bad distance = a match reaching before its member's start; a
    # token-level (B, T) reduce — the per-position check this replaces
    # scanned the full (B, out_cap) src array
    bad_dist = jnp.any(is_match & (starts < b), axis=1)

    # fused rank + field gather + mod-collapse: output position ->
    # covering token -> chase-ready (src, lit) in ONE kernel pass
    # (ops/pallas_rank emit="src"; replaces the XLA bucket-rank build +
    # gather_two + the 8M-element mod/mask tail)
    pk = jnp.where(valid, jnp.where(is_match, packed, a), 0)
    from .pallas_rank import rank_emit_src
    src, litvals = rank_emit_src(
        jnp.minimum(starts, out_cap - 1), pk, valid,
        jnp.minimum(n_out, out_cap), out_cap)

    # fused chase + materialize: one sequential-block kernel pass
    # (ops/pallas_expand) replaces the two-level doubling rounds and
    # the final materialize gather; padding positions are fixpoints
    # with lit 0, so no post-mask is needed
    out = resolve_bytes(src, litvals).astype(jnp.uint8)
    err = overflow | bad_dist
    return out, jnp.minimum(n_out, out_cap), err
