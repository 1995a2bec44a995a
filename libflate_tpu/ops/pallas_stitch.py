"""Pallas TPU stitch kernel — OR chunk word columns into member rows.

The pack kernel (ops/pallas_pack) emits each 256-field slot-chunk as an
absolute-word-aligned column; assembling a member's DEFLATE stream is
then a word-level OR of every column at its start word.  The XLA
formulation (ops.pipeline._stitch_cols_device) is a scatter-add whose
cost is one scalarized HBM update per word (~85 M elem/s → ~21 ms per
8 MiB at 48-word columns).

This kernel runs one member per grid program with the member's columns
resident in VMEM.  Chunk j's words sit at lanes [0, nw) of its column
row; placing them at absolute word offset ``word0[j]`` is a single
dynamic lane rotate (``pltpu.roll`` by ``word0 & 127``) plus two masked
OR read-modify-writes of the (1, 128) output word rows it straddles —
no scatter at all.  Columns wider than 128 words process in 128-lane
segments (static count).

Within a member, chunks apply sequentially in a ``fori_loop``, so
overlapping boundary words OR cleanly in order; members parallelize
across grid programs.

Parity: together with ops/pallas_pack this replaces the reference's
sequential BitWriter flush (src/bit.rs:4-61) for the PGZF shared path;
oracle = ops.pipeline.stitch_chunk_cols (host OR, bit-identical).
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
#: output slack rows: the zero-padded tail of a chunk's last segment may
#: roll into rows past the member's final real word
SLACK_ROWS = SUB


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _stitch_kernel(n_ch: int, segs: int, rows_alloc: int,
                   cols_refs, w0_ref, out_refs):
    # M members stitch in lockstep per grid program: within a member
    # consecutive chunks' RMW rows overlap (serial chain), but the M
    # members' chains are independent and interleave (the resolve
    # kernel's member-ILP lesson)
    M = len(cols_refs)
    zero = jnp.zeros((SUB, LANES), jnp.int32)

    def zbody(q, _):
        for m in range(M):
            out_refs[m][pl.ds(q * SUB, SUB), :] = zero
        return 0

    jax.lax.fori_loop(0, rows_alloc // SUB, zbody, 0)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    b = pl.program_id(0)

    def body(j, _):
        for m in range(M):
            off = w0_ref[b * M + m, j]
            row = off >> 7                # 128 words per output row
            lane0 = off & (LANES - 1)
            hi = lane_i >= lane0          # unwrapped lanes -> row + s
            for s in range(segs):
                v = cols_refs[m][pl.ds(j, 1), pl.ds(s * LANES, LANES)]
                rolled = pltpu.roll(v, lane0, axis=1)
                r0 = row + s
                cur = out_refs[m][pl.ds(r0, 1), :]
                out_refs[m][pl.ds(r0, 1), :] = (
                    cur | jnp.where(hi, rolled, 0))
                cur1 = out_refs[m][pl.ds(r0 + 1, 1), :]
                out_refs[m][pl.ds(r0 + 1, 1), :] = (
                    cur1 | jnp.where(hi, 0, rolled))
        return 0

    jax.lax.fori_loop(0, n_ch, body, 0)


@functools.partial(jax.jit, static_argnames=("w_out",))
def stitch_cols_pallas(cols: jnp.ndarray, word0: jnp.ndarray,
                       w_out: int) -> jnp.ndarray:
    """OR chunk word columns into member word rows (kernel stitch).

    Args:
        cols: (B, n_ch, nw) int32/uint32 — word q of chunk j = bits
            [32q, 32(q+1)) of the chunk's word-aligned stream (zero
            outside the chunk's real bit range).
        word0: (B, n_ch) int32 absolute start word of each chunk
            (monotone non-decreasing per member; word0[j] + nw must
            stay within w_out + 8*128 slack).
        w_out: output words per member (multiple of 128).

    Returns:
        (B, w_out) uint32 member word rows — bit-identical to
        ops.pipeline._stitch_cols_device / stitch_chunk_cols.
    """
    bsz, n_ch, nw = cols.shape
    assert w_out % LANES == 0
    segs = -(-nw // LANES)
    assert segs <= SLACK_ROWS, "column depth exceeds output slack"
    pad = segs * LANES - nw
    c = jnp.pad(cols.astype(jnp.int32), ((0, 0), (0, 0), (0, pad)))
    rows_alloc = w_out // LANES + SLACK_ROWS

    M = int(os.environ.get("LIBFLATE_STITCH_MEMBERS", "8"))
    while bsz % M:
        M //= 2

    spec_c = pl.BlockSpec((M, n_ch, segs * LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    # SMEM blocks must equal the full array shape (Mosaic constraint);
    # the kernel indexes rows by program_id
    spec_w = pl.BlockSpec((bsz, n_ch), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    spec_o = pl.BlockSpec((M, rows_alloc, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def kernel(c_r, w0_r, o_r):
        _stitch_kernel(n_ch, segs, rows_alloc,
                       [c_r.at[m] for m in range(M)], w0_r,
                       [o_r.at[m] for m in range(M)])

    out = pl.pallas_call(
        kernel,
        grid=(bsz // M,),
        in_specs=[spec_c, spec_w],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((bsz, rows_alloc, LANES),
                                       jnp.int32),
        interpret=_interp(),
    )(c, word0.astype(jnp.int32))
    return out.reshape(bsz, rows_alloc * LANES)[:, :w_out].astype(
        jnp.uint32)
