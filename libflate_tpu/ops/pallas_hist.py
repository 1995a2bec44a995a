"""Pallas TPU token-histogram kernel — per-lane bin rows in VMEM.

The shared-table encode path only needs the BATCH-GLOBAL litlen and
distance symbol histograms (ops/pipeline._shared_stats sums the
per-member ones before package-merge), but the XLA formulation
(deflate_encode.token_histograms_masked) scatter-adds every token slot
at ~85 M elem/s — 267 ms of the 8 MiB encode profile.  This kernel
keeps one histogram COLUMN per member lane in VMEM (bins are rows) and
counts each 8-slot vreg with a bounded sweep of compare-selects over
the 40 bin row-groups, exactly the pallas_lz77 table-update pattern.
The (320, 128) per-lane table is lane-summed by XLA afterwards (tiny).

Bin layout (one bin per row): rows 0..285 litlen symbols, 286..287
dead, 288..317 distance symbols (288 + dist_sym), 318..319 dead.
Hole slots carry litlen bin 287 and distance bin 288 - 1 → both dead.

Reference semantics: src/deflate/symbol.rs frequency collection; the
symbol mapping mirrors spec/constants length/distance tables.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import constants as C

LANES = 128
SUB = 8
BINS = 320                   # 286 litlen + pad + 30 dist + pad
_GROUPS = BINS // SUB        # 40
_LIT_GROUPS = 36             # litlen bins live in groups 0..35
CHUNK_POS = 2048             # slot rows per grid step
_DEAD_LIT = 287
_DIST_BASE = 288


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _hist_kernel(packed_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        for g in range(_GROUPS):
            out_ref[pl.ds(g * SUB, SUB), :] = jnp.zeros(
                (SUB, LANES), jnp.int32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)

    def step(t, _):
        v = packed_ref[pl.ds(t * SUB, SUB), :]
        lo = v & 511                       # litlen bin (287 = dead)
        hi = v >> 9                        # 0 = no match, else sym + 1
        d = _DIST_BASE - 1 + hi            # 287 dead when hi == 0
        lo_rows = [lo[j:j + 1, :] for j in range(SUB)]
        d_rows = [d[j:j + 1, :] for j in range(SUB)]

        for gg in range(_GROUPS):
            acc = jnp.zeros((SUB, LANES), jnp.int32)
            rows = lo_rows if gg < _LIT_GROUPS else d_rows
            for j in range(SUB):
                r = rows[j]
                hit = (r >> 3 == gg) & (iota == (r & 7))
                acc = acc + hit.astype(jnp.int32)
            out_ref[pl.ds(gg * SUB, SUB), :] = (
                out_ref[pl.ds(gg * SUB, SUB), :] + acc)
        return 0

    jax.lax.fori_loop(0, CHUNK_POS // SUB, step, 0)


@functools.partial(jax.jit, static_argnames=())
def _hist_table(packed: jnp.ndarray) -> jnp.ndarray:
    """(n, 128) packed symbols → (320, 128) per-lane bin counts."""
    n, lanes = packed.shape
    assert lanes == LANES and n % CHUNK_POS == 0
    spec = pl.BlockSpec((CHUNK_POS, LANES), lambda i, j: (j, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BINS, LANES), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _hist_kernel,
        grid=(1, n // CHUNK_POS),
        in_specs=[spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((BINS, LANES), jnp.int32),
        interpret=_interp(),
    )(packed)


def length_symbol_arith(length: jnp.ndarray) -> jnp.ndarray:
    """RFC-1951 length → litlen symbol (257..285), pure elementwise.

    Replaces the 259-entry table gather (deflate_encode._LEN_CODE) with
    compare arithmetic: for l = length - 3 ≥ 8 the code index is
    4e + 4 + ((l >> e) & 3) with e = ⌊log2 l⌋ - 2 extra bits.
    """
    l = length - 3
    e = ((l >= 8).astype(jnp.int32) + (l >= 16) + (l >= 32)
         + (l >= 64) + (l >= 128))
    idx = jnp.where(l < 8, l, 4 * e + 4 + ((l >> e) & 3))
    return jnp.where(length == C.MAX_MATCH, 285, 257 + idx)


def dist_symbol_arith(dist: jnp.ndarray) -> jnp.ndarray:
    """RFC-1951 distance → distance symbol (0..29), pure elementwise.

    For d = dist - 1 ≥ 4 the symbol is 2e + 2 + ((d >> e) & 1) with
    e = ⌊log2 d⌋ - 1 extra bits (replaces the 32769-entry _DIST_CODE
    gather)."""
    d = dist - 1
    e = ((d >= 4).astype(jnp.int32) + (d >= 8) + (d >= 16) + (d >= 32)
         + (d >= 64) + (d >= 128) + (d >= 256) + (d >= 512)
         + (d >= 1024) + (d >= 2048) + (d >= 4096) + (d >= 8192)
         + (d >= 16384))
    return jnp.where(d < 4, d, 2 * e + 2 + ((d >> e) & 1))


@functools.partial(jax.jit, static_argnames=())
def shared_histograms_pallas(a: jnp.ndarray, b: jnp.ndarray,
                             valid: jnp.ndarray):
    """Batch-global (lit_freq (286,), dist_freq (30,)) via the kernel.

    a/b/valid: (B, M) padded stream-order token slots (ops/pallas_parse
    packing: a = literal byte or match length, b = distance, valid =
    real-token mask).  Matches summing token_histograms_masked over the
    batch: one END_OF_BLOCK per member and the all-literal dummy
    distance code included.
    """
    bsz, m = a.shape
    is_match = (b > 0) & valid
    lit_sym = jnp.where(is_match, length_symbol_arith(a), a)
    dist_sym = dist_symbol_arith(b)
    lo = jnp.where(valid, lit_sym, _DEAD_LIT)
    hi = jnp.where(is_match, dist_sym + 1, 0)
    packed = (lo | (hi << 9)).astype(jnp.int32)
    packed_t = jnp.transpose(packed)               # (M, B)
    pad = (-m) % CHUNK_POS
    if pad:
        filler = jnp.full((pad, bsz), _DEAD_LIT, jnp.int32)
        packed_t = jnp.concatenate([packed_t, filler], axis=0)
    table = _hist_table(packed_t)
    per_bin = jnp.sum(table, axis=1)
    lit_freq = per_bin[:C.MAX_LITLEN_SYMBOLS]
    lit_freq = lit_freq.at[C.END_OF_BLOCK].add(bsz)
    dist_freq = per_bin[_DIST_BASE:_DIST_BASE + C.MAX_DIST_SYMBOLS]
    dist_freq = jnp.where(dist_freq.sum() == 0,
                          jnp.zeros_like(dist_freq).at[0].set(1),
                          dist_freq)
    return lit_freq, dist_freq
