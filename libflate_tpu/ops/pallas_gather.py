"""Pallas TPU batched per-member gather kernel.

XLA's generic gather/scatter lowers to ~85 M elem/s on this TPU (the
measured ceiling everywhere in this project; docs/ROADMAP.md) — far too
slow for LZ77 expansion, whose pointer-chase is nothing but gathers.
This kernel does out[b, i, l] = table[b, flat_idx[b, i, l]] at ~1 G
elem/s by scanning the member's table rows in VMEM: per 8-row block one
broadcast + lane-shuffle + select per row (the only per-element indexed
primitives Mosaic exposes are single-vreg lane shuffles and sublane
shuffles; a true per-element 2D gather does not lower).

An optional locality skip predicates each 64-row block on the output
vreg's index range — pointer-chase rounds have strongly local indices
(sources sit within the LZ77 window of their position), so most blocks
skip in a couple of cycles.

Parity note: this is infrastructure for the device decode hot loop
(reference: libflate_lz77/src/lib.rs:164-194 rle_decode — the
sequential overlapping copy this framework replaces with batched
pointer resolution).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 8
BLOCK = 64            # rows per predicated block (locality skip unit)


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _gather_kernel(tab_ref, idx_ref, out_ref, *, rows: int, n_out: int,
                   skip: bool, block: int):
    n_blocks = -(-rows // block)

    def body(v, _):
        idx = idx_ref[pl.ds(v * SUB, SUB), :]
        lane = idx & (LANES - 1)
        grp = idx >> 7                                    # table row
        acc = jnp.zeros((SUB, LANES), jnp.int32)
        gmin = jnp.min(grp) // block
        gmax = jnp.max(grp) // block

        def do_block(c, acc):
            blk = tab_ref[pl.ds(c * block, block), :]
            for u in range(block):
                row = jnp.broadcast_to(blk[u, :][None, :], (SUB, LANES))
                cand = jnp.take_along_axis(row, lane, axis=1)
                acc = jnp.where(grp == c * block + u, cand, acc)
            return acc

        if skip:
            # dynamic-bound scan over just the blocks the vreg's index
            # range touches (A/B on chase-shaped indices: 6.8 ms vs
            # 8.0 full vs 10.0 lax.cond-predicated per 8.4M)
            acc = jax.lax.fori_loop(gmin, gmax + 1, do_block, acc)
        else:
            for c in range(n_blocks):
                acc = do_block(c, acc)
        out_ref[pl.ds(v * SUB, SUB), :] = acc
        return 0

    jax.lax.fori_loop(0, n_out // SUB, body, 0)


@functools.partial(jax.jit, static_argnames=("skip", "block"))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                skip: bool = True, block: int = BLOCK) -> jnp.ndarray:
    """Batched per-member flat gather.

    Args:
        table: (B, R, 128) int32 — member b's entries; flat entry e
            lives at ``table[b, e >> 7, e & 127]``.  R must be a
            multiple of 8 (pad rows with anything).
        idx: (B, N, 128) int32 flat entry indices in [0, R*128); N a
            multiple of 8.  Out-of-range indices are clipped.
        skip: predicate row blocks on each output vreg's index range
            (fast when indices are local, harmless otherwise).
        block: rows per predicated block — the locality-skip unit.  64
            suits window-spread chase indices; 8 suits near-monotone
            indices (e.g. token-field gathers, ~2-3 row spread per
            vreg) where a 64-row floor would scan 8x too much.

    Returns (B, N, 128) int32 with out[b, i, l] = flat(table[b])[idx].
    """
    bsz, rows, lanes = table.shape
    _, n_out, _ = idx.shape
    assert lanes == LANES and rows % SUB == 0 and n_out % SUB == 0
    idx = jnp.clip(idx.astype(jnp.int32), 0, rows * LANES - 1)
    if rows % block:
        table = jnp.pad(table, ((0, 0), (0, block - rows % block), (0, 0)))
        rows = table.shape[1]

    spec_t = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((1, n_out, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    kern = functools.partial(_gather_kernel, rows=rows, n_out=n_out,
                             skip=skip, block=block)

    def kfn(t, i, o):
        kern(t.at[0], i.at[0], o.at[0])

    return pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec_t, spec_i],
        out_specs=spec_i,
        out_shape=jax.ShapeDtypeStruct((bsz, n_out, LANES), jnp.int32),
        interpret=_interp(),
    )(table.astype(jnp.int32), idx)


def flatten_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(B, M) -> (B, M/128, 128) table layout (M multiple of 1024)."""
    bsz, m = x.shape
    return x.reshape(bsz, m // LANES, LANES)


def unflatten_rows(x: jnp.ndarray) -> jnp.ndarray:
    """(B, R, 128) -> (B, R*128)."""
    bsz, r, lanes = x.shape
    return x.reshape(bsz, r * lanes)


def _gather2_kernel(lo_ref, ta_ref, tb_ref, idx_ref, oa_ref, ob_ref, *,
                    n_vregs: int, win: int):
    b = pl.program_id(0)

    def body(v, _):
        idx = idx_ref[pl.ds(v * SUB, SUB), :]
        lane = idx & (LANES - 1)
        grp = idx >> 7
        l0 = lo_ref[b, v]
        ra = ta_ref[pl.ds(l0, win), :]
        rb = tb_ref[pl.ds(l0, win), :]
        aa = jnp.zeros((SUB, LANES), jnp.int32)
        ab = jnp.zeros((SUB, LANES), jnp.int32)
        for u in range(win):
            hit = grp == l0 + u
            ba = jnp.broadcast_to(ra[u:u + 1, :], (SUB, LANES))
            bb = jnp.broadcast_to(rb[u:u + 1, :], (SUB, LANES))
            aa = jnp.where(hit, jnp.take_along_axis(ba, lane, axis=1),
                           aa)
            ab = jnp.where(hit, jnp.take_along_axis(bb, lane, axis=1),
                           ab)
        oa_ref[pl.ds(v * SUB, SUB), :] = aa
        ob_ref[pl.ds(v * SUB, SUB), :] = ab
        return 0

    jax.lax.fori_loop(0, n_vregs, body, 0)


@functools.partial(jax.jit, static_argnames=("win",))
def gather_two(tab_a: jnp.ndarray, tab_b: jnp.ndarray,
               idx: jnp.ndarray, lo_rows: jnp.ndarray,
               win: int = 16):
    """Fused two-table gather with precomputed per-vreg row windows.

    For near-monotone indices (token-id maps) the per-vreg table window
    is known host/XLA-side, so the kernel takes it from SMEM instead of
    paying a vector->scalar min/max reduce per vreg (the dominant cost
    of gather_rows on such indices), and gathers BOTH tables in one
    sweep (shared broadcasts of the hit mask and index decode).

    Args:
        tab_a, tab_b: (B, R, 128) int32 tables (same shape).
        idx: (B, N, 128) int32 flat indices; every index of vreg v MUST
            lie in rows [lo_rows[b, v], lo_rows[b, v] + win) of its
            table (indices outside the window yield 0).
        lo_rows: (B, N // 8) int32 8-row-aligned window starts (one
            per idx vreg), clipped to [0, R - win].
        win: static window height in rows (multiple of 8).

    Returns (out_a, out_b), each (B, N, 128) int32.
    """
    bsz, rows, lanes = tab_a.shape
    _, n_out, _ = idx.shape
    assert lanes == LANES and tab_b.shape == tab_a.shape
    assert rows % SUB == 0 and n_out % SUB == 0 and win % SUB == 0

    spec_t = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_i = pl.BlockSpec((1, n_out, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    assert lo_rows.shape == (bsz, n_out // SUB)
    spec_lo = pl.BlockSpec((bsz, n_out // SUB), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)

    kern = functools.partial(_gather2_kernel, n_vregs=n_out // SUB,
                             win=win)

    def kfn(lo, ta, tb, i, oa, ob):
        kern(lo, ta.at[0], tb.at[0], i.at[0], oa.at[0], ob.at[0])


    shape = jax.ShapeDtypeStruct((bsz, n_out, LANES), jnp.int32)
    return pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec_lo, spec_t, spec_t, spec_i],
        out_specs=[spec_i, spec_i],
        out_shape=[shape, shape],
        interpret=_interp(),
    )(lo_rows.astype(jnp.int32), tab_a.astype(jnp.int32),
      tab_b.astype(jnp.int32), idx.astype(jnp.int32))
