"""Device-resident LZ77 expansion — the decode chain's second half.

Replaces ops.deflate_decode.expand_tokens_device (generic XLA pointer
doubling, ~1.16 s per 8 MiB: every gather rides XLA's ~85 M elem/s
ceiling and RLE runs make chains thousands deep) with a TPU-first
decomposition (reference hot loop being replaced:
src/deflate/decode.rs:112-130 + libflate_lz77/src/lib.rs:164-194):

1. **Token-id rank** — output position -> covering token id, scatter-
   free (coarse per-128-bucket counts + fine in-bucket rank; see
   _token_id_scatter_free); token fields (start + packed a/d) arrive
   per byte through ONE fused two-table windowed gather
   (ops/pallas_gather.gather_two).
2. **Mod-collapse** — a byte inside an overlapped (RLE) copy jumps
   straight to the PRE-TOKEN source: src(p) = (p - s) % d + s - d.
   Every chain step then crosses a token boundary, so chain depth drops
   from output-run length (thousands) to the token DAG depth (~10-200
   on text; measured mean 9-36).
3. **Fused chase + materialize** — ONE Pallas kernel pass
   (ops/pallas_expand.resolve_bytes) walks 4 KiB superblocks in order:
   in-register doubling resolves intra-block chains, sibling selects
   cover the same superblock, and a dynamically-banded prefix sweep
   fetches bytes already materialized in the (sublane-packed) output.

Members are independent (PGZF container) — no cross-member history.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_gather import (LANES, flatten_rows, gather_rows,
                            gather_two)


def _gather_flat(table_2d: jnp.ndarray, idx_2d: jnp.ndarray,
                 skip: bool = True, block: int = 8) -> jnp.ndarray:
    """(B, M) table + (B, N) int32 idx -> (B, N) int32 values.

    Default block=8: every gather here has near-monotone indices
    (token ids / bucket-local starts, ~2-3 table-row spread per vreg),
    where an 8-row locality-skip unit scans ~8x less than 64."""
    bsz, m = table_2d.shape
    n = idx_2d.shape[1]
    pad_m = (-m) % (8 * LANES)
    if pad_m:
        table_2d = jnp.pad(table_2d, ((0, 0), (0, pad_m)))
    pad_n = (-n) % (8 * LANES)
    if pad_n:
        idx_2d = jnp.pad(idx_2d, ((0, 0), (0, pad_n)))
    out = gather_rows(flatten_rows(table_2d.astype(jnp.int32)),
                      flatten_rows(idx_2d.astype(jnp.int32)), skip=skip,
                      block=block)
    return out.reshape(bsz, -1)[:, :n]


def _gather_two_flat(tab_a: jnp.ndarray, tab_b: jnp.ndarray,
                     idx_2d: jnp.ndarray, rank_lo: jnp.ndarray,
                     win: int = 16):
    """Fused 2-table gather: (B, M) tables + (B, N) monotone idx +
    (B, N/1024) per-vreg low token ranks -> two (B, N) value arrays."""
    bsz, m = tab_a.shape
    n = idx_2d.shape[1]
    m_min = max(-(-m // (8 * LANES)) * 8 * LANES, win * LANES)
    if m_min != m:
        tab_a = jnp.pad(tab_a, ((0, 0), (0, m_min - m)))
        tab_b = jnp.pad(tab_b, ((0, 0), (0, m_min - m)))
    rows = tab_a.shape[1] // LANES
    lo = jnp.clip(((jnp.maximum(rank_lo - 1, 0)) >> 7) & ~7,
                  0, max(rows - win, 0))
    oa, ob = gather_two(flatten_rows(tab_a.astype(jnp.int32)),
                        flatten_rows(tab_b.astype(jnp.int32)),
                        flatten_rows(idx_2d.astype(jnp.int32)),
                        lo, win=win)
    return (oa.reshape(bsz, -1)[:, :n], ob.reshape(bsz, -1)[:, :n])


def _token_id_scatter_free(starts: jnp.ndarray, valid: jnp.ndarray,
                           n_tokens: jnp.ndarray, out_cap: int):
    """Output position -> covering token id, without any XLA scatter.

    The scatter+cumsum construction costs ~26 ms per 8 MiB (85 M elem/s
    scatter ceiling).  Scatter-free: starts are sorted, so
    token_id(p) = #{starts <= p} - 1 splits into a coarse per-128-bucket
    count (one-hot compare, fused reduce) and a fine in-bucket rank
    against <= 128 bucket-local starts (every token emits >= 1 byte, so
    a 128-byte bucket holds <= 128 starts), fetched with one Pallas
    gather.
    """
    bsz, t = starts.shape
    nb = out_cap // 128
    sb = jnp.where(valid, starts >> 7, nb)           # invalid -> off-end
    cnt = jnp.zeros((bsz, nb), jnp.int32)
    tile = min(128, nb)
    for r0 in range(0, nb, tile):
        r = jnp.arange(r0, r0 + tile, dtype=jnp.int32)
        oh = (sb[:, :, None] == r[None, None, :]).astype(jnp.int32)
        cnt = jax.lax.dynamic_update_slice(
            cnt, jnp.sum(oh, axis=1), (0, r0))
    c_excl = jnp.cumsum(cnt, axis=1) - cnt           # starts before bucket

    k = jnp.arange(128, dtype=jnp.int32)
    idxk = c_excl[:, :, None] + k[None, None, :]     # (B, nb, 128)
    bs = _gather_flat(starts, idxk.reshape(bsz, -1)).reshape(bsz, nb, 128)
    bs = jnp.where(idxk < n_tokens[:, None, None], bs, out_cap + 1)
    p_abs = (jnp.arange(nb, dtype=jnp.int32)[None, :, None] * 128
             + jnp.arange(128, dtype=jnp.int32)[None, None, :])
    fine = jnp.zeros((bsz, nb, 128), jnp.int32)
    for r0 in range(0, nb, tile):
        sl = slice(r0, r0 + tile)
        f = jnp.sum((bs[:, sl, None, :] <= p_abs[:, sl, :, None]
                     ).astype(jnp.int32), axis=-1)
        fine = jax.lax.dynamic_update_slice(fine, f, (0, r0, 0))
    token_id = (c_excl[:, :, None] + fine).reshape(bsz, out_cap) - 1
    return jnp.clip(token_id, 0, t - 1), c_excl


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

    # token id per output position (scatter-free; see helper)
    token_id, c_excl = _token_id_scatter_free(
        jnp.minimum(starts, out_cap - 1), valid, n_tokens, out_cap)

    # per-byte token fields: the packed word already carries (a, d), so
    # one fused two-table gather covers all three fields (start +
    # packed).  token_id is monotone, so idx vreg v's token window is
    # [rank(1024v) - 1, rank(1024v) + 1023] — rows derived from the
    # bucket ranks and handed to the kernel via SMEM (gather_two),
    # which skips the per-vreg vector->scalar bound reduces that
    # dominate gather_rows on these indices.
    pk = jnp.where(valid, jnp.where(is_match, packed, a), 0)
    tok_start, tok_pk = _gather_two_flat(starts, pk, token_id,
                                         c_excl[:, ::8])
    tok_d = (tok_pk >> 9) & 0xFFFF
    tok_a = tok_pk & 511

    pos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    is_lit = tok_d == 0
    # mod-collapse: jump past the whole overlapped copy in one step
    rel = pos - tok_start
    src = jnp.where(is_lit, pos,
                    rel % jnp.maximum(tok_d, 1) + tok_start - tok_d)
    live = pos < n_out[:, None]
    bad_dist = jnp.any((src < 0) & ~is_lit & live, axis=1)
    src = jnp.clip(src, 0, out_cap - 1)
    src = jnp.where(live, src, pos)          # padding: fixpoints

    # fused chase + materialize: one sequential-block kernel pass
    # (ops/pallas_expand) replaces the two-level doubling rounds and
    # the final materialize gather
    litvals = jnp.where(is_lit, tok_a & 255, 0)
    out = resolve_bytes(src, litvals).astype(jnp.uint8)
    out = jnp.where(live, out, 0).astype(jnp.uint8)
    err = overflow | bad_dist
    return out, jnp.minimum(n_out, out_cap), err
