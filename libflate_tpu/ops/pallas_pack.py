"""Pallas TPU bit-pack kernel — lockstep slot packer.

The XLA pack (ops/bitpack.pack_fields) is a sorted scatter-add over
every field slot (~99 k/member after the walk-emit cap) and lowers to
~85 M elem/s scalarized scatters — the encode pipeline's largest stage
(118 ms / 8 MiB).  This kernel mirrors the sync DECODER's decomposition
(ops/pallas_sync_decode) in reverse: the member field stream is cut
into fixed-size slot-chunks, and 1024 chunks run in lockstep per grid
program, each appending its fields into a 64-bit register window and
flushing completed 32-bit words into its own output column.

The flush row differs per slot (cursors diverge with data), which VMEM
cannot scatter — so the flush is a *masked row sweep*: every candidate
word row is read-modify-written with a per-slot `wc == q` select.  The
sweep costs steps x d_out group-RMWs per program, which makes total
cost LINEAR in fields-per-chunk — hence small chunks.

Each chunk packs bits [start_j, end_j) of its member at the FINAL
in-word alignment (the kernel starts its window at ``start_j & 31``
with the low bits zero), so stitching is a word-level OR-copy of each
column's real words on the host — no bit shifts.

Parity: replaces the reference's sequential BitWriter
(src/bit.rs:4-61) for the PGZF shared path; oracle = the XLA packer
(bit-identical, tested in interpret mode).
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
SLOTS = SUB * LANES              # 1024 slot-chunks per grid program
#: default fields per slot-chunk.  The masked flush sweep makes kernel
#: cost ~linear in d_out(f_ch) at fixed total fields (n_programs scales
#: inversely), so smaller chunks are cheaper: measured 36.1 / 16.6 /
#: 8.8 ms per 8 MiB at 512 / 256 / 128.  256 is the knee once the
#: per-chunk overheads outside the kernel are counted: the stitch
#: scatter's word count is dominated by the 32-word slice rounding
#: (same at 512/256, 2x at 128) and the packed `small` D2H row grows
#: by n_ch ints per member.
F_CH = 256


def d_out_for(f_ch: int) -> int:
    """Worst-case words per chunk: 31 start-bit skew + f_ch/2 tokens x
    38 bits (f1 <= 17, f2 <= 21 under the shared 12/8-bit code caps)."""
    return (31 + (f_ch // 2) * 38 + 31) // 32 + 1


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _pack_kernel(f_ch, d_out, fv_ref, fw_ref, k0_ref, out_ref):
    zero = jnp.zeros((SUB, LANES), jnp.int32)

    def zbody(q, _):
        out_ref[pl.ds(q * SUB, SUB), :] = zero
        return 0

    jax.lax.fori_loop(0, d_out, zbody, 0)

    k0 = k0_ref[:].astype(jnp.uint32)        # (SUB, LANES), [0, 32)
    lo0 = jnp.zeros((SUB, LANES), jnp.uint32)
    wc0 = jnp.zeros((SUB, LANES), jnp.int32)

    def step(f, carry):
        lo, k, wc = carry
        v = fv_ref[pl.ds(f * SUB, SUB), :].astype(jnp.uint32)
        w = fw_ref[pl.ds(f * SUB, SUB), :].astype(jnp.uint32)
        v = v & ((jnp.uint32(1) << w) - jnp.uint32(1))
        lo2 = lo | (v << k)
        # v >> (32 - k) without the k == 0 undefined shift
        spill = (v >> (jnp.uint32(31) - k)) >> jnp.uint32(1)
        k2 = k + w
        flush = k2 >= 32

        def wbody(q, _):
            cur = out_ref[pl.ds(q * SUB, SUB), :]
            hit = flush & (wc == q)
            out_ref[pl.ds(q * SUB, SUB), :] = jnp.where(
                hit, lo2.astype(jnp.int32), cur)
            return 0

        # cursors are monotone and clustered, so the flushing lanes'
        # word rows form a narrow band — sweep just [qmin, qmax]
        # instead of all d_out rows (the masked reduces cost ~2 row
        # RMWs; the band is typically a few rows of ~150)
        qmin = jnp.min(jnp.where(flush, wc, d_out))
        qmax = jnp.max(jnp.where(flush, wc, -1))
        jax.lax.fori_loop(qmin, qmax + 1, wbody, 0)
        lo = jnp.where(flush, spill, lo2)
        k = jnp.where(flush, k2 - 32, k2).astype(jnp.uint32)
        wc = wc + flush.astype(jnp.int32)
        return lo, k, wc

    lo, k, wc = jax.lax.fori_loop(0, f_ch, step, (lo0, k0, wc0))

    # final partial word (k in (0, 32)): flush it at row wc
    def fbody(q, _):
        cur = out_ref[pl.ds(q * SUB, SUB), :]
        hit = (k > 0) & (wc == q)
        out_ref[pl.ds(q * SUB, SUB), :] = jnp.where(
            hit, lo.astype(jnp.int32), cur)
        return 0

    fmin = jnp.min(jnp.where(k > 0, wc, d_out))
    fmax = jnp.max(jnp.where(k > 0, wc, -1))
    jax.lax.fori_loop(fmin, fmax + 1, fbody, 0)


@functools.partial(jax.jit, static_argnames=("f_ch",))
def pack_slots(fv: jnp.ndarray, fw: jnp.ndarray, k0: jnp.ndarray,
               f_ch: int = F_CH):
    """Pack per-slot field streams into per-slot word columns.

    Args:
        fv: (S, f_ch) int32 — slot s's field f value (LSB-first payload;
            masked to width in-kernel).  S must be a multiple of 1024.
        fw: (S, f_ch) int32 widths in [0, 28]; interleaved (f1, f2)
            token pairs must satisfy w1 + w2 <= 38 (shared-table caps).
        k0: (S,) int32 — the slot's absolute start bit & 31; the packed
            stream begins at bit k0 of word 0 (low bits zero).

    Returns:
        (S, d_out) int32 word columns; word q of slot s holds bits
        [32*q, 32*(q+1)) of the slot's aligned stream.
    """
    s_n, f_in = fv.shape
    assert f_in == f_ch and s_n % SLOTS == 0
    d_out = d_out_for(f_ch)
    p_ = s_n // SLOTS

    def to_kernel(x):
        # slot s = (p, sub, lane); field f at rows f*8+sub
        return x.reshape(p_, SUB, LANES, f_ch).transpose(
            0, 3, 1, 2).reshape(p_, f_ch * SUB, LANES)

    spec_f = pl.BlockSpec((1, f_ch * SUB, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, d_out * SUB, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def kernel(fv_r, fw_r, k0_r, out_r):
        _pack_kernel(f_ch, d_out, fv_r.at[0], fw_r.at[0], k0_r.at[0],
                     out_r.at[0])

    out = pl.pallas_call(
        kernel,
        grid=(p_,),
        in_specs=[spec_f, spec_f, spec_k],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((p_, d_out * SUB, LANES),
                                       jnp.int32),
        interpret=_interp(),
    )(to_kernel(fv), to_kernel(fw),
      k0.astype(jnp.int32).reshape(p_, SUB, LANES))
    # word q of slot (p, sub, lane) at out[p, q*8+sub, lane]
    return out.reshape(p_, d_out, SUB, LANES).transpose(
        0, 2, 3, 1).reshape(s_n, d_out)
