"""Pallas TPU fused LZ77 chase + materialize kernel.

Replaces the multi-kernel two-level pointer chase and the final
materialize gather of ``ops.device_expand`` (12 separate pallas_call
rounds, ~69 ms per 8 MiB) with ONE kernel pass: after mod-collapse
every pointer strictly decreases, so walking each member's 4 KiB
superblocks (4 sub-blocks of one vreg each) in ascending order gives

1. **in-register doubling** — a sub-block's intra-block chains resolve
   in <= 10 composition rounds on its own (8, 128) vreg (single-vreg
   lane/sublane shuffles, no VMEM traffic), after which every entry is
   a literal root inside the sub-block or a pointer to an earlier one;
2. **sibling selects** — pointers into earlier sub-blocks of the SAME
   superblock read the byte vregs still held in registers;
3. **one packed prefix sweep** — earlier superblocks are already
   byte-resolved in the output ref, stored 4 bytes per int32 word
   (sublane-packed: word (r, l) holds positions 512*(r>>1) + 128*(4*
   (r&1)+k) + l, so packing a resolved vreg is three shifts+ors on
   sublane slices and the lookup is row = s>>9, lane = s&127, byte =
   (s>>7)&3).  The sweep's dynamically-bounded row-group scan touches
   4x fewer rows than an unpacked byte table — the dominant cost for
   window-spread LZ77 pointers.

Parity note: device half of the reference decode hot loop
(libflate_lz77/src/lib.rs:164-194 rle_decode — the sequential
overlapping copy, re-expressed as batched pointer resolution).
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
BLK = SUB * LANES            # positions per sub-block (one vreg)
BLK_BITS = 10
SUPER = 4 * BLK              # positions per superblock (one packed vreg)


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _vgather(val: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """out[s, l] = val[local >> 7, local & 127] for in-vreg local ids;
    out-of-range locals yield 0 (callers mask)."""
    row = local >> 7
    lane = local & (LANES - 1)
    acc = jnp.zeros((SUB, LANES), jnp.int32)
    for u in range(SUB):
        rb = jnp.broadcast_to(val[u:u + 1, :], (SUB, LANES))
        acc = jnp.where(row == u,
                        jnp.take_along_axis(rb, lane, axis=1), acc)
    return acc


def _resolve_kernel(src_ref, lit_ref, out_ref, *, n_super: int,
                    skip: tuple = ()):
    # ``skip`` is an ablation knob for profiling scripts ONLY — it is a
    # static jit argument (so it participates in the cache key), never
    # read from the environment inside production traces.
    def superblock(sb, _):
        vs = []                                  # resolved byte vregs
        for j in range(4):
            blk = sb * 4 + j
            base = blk * BLK
            s = src_ref[pl.ds(blk * SUB, SUB), :]

            # Intra-block doubling, two tiers (roots are fixpoints;
            # convergence checks measure 25x the shuffles they save, so
            # both tiers run unconditional fixed rounds):
            # 1. in-ROW rounds — while the pointer stays inside its own
            #    128-lane row, one composition round is a single
            #    per-element lane shuffle (take_along_axis on the vreg
            #    itself).  7 rounds cover the worst 127-hop in-row
            #    chain; corrupt forward pointers just stop resolving.
            abs_row = (blk * SUB
                       + jax.lax.broadcasted_iota(jnp.int32,
                                                  (SUB, LANES), 0))
            if "row" not in skip:
                for _ in range(7):
                    own_row = (s >> 7) == abs_row
                    cand = jnp.take_along_axis(s, s & (LANES - 1),
                                               axis=1)
                    s = jnp.where(own_row, cand, s)

            # 2. cross-row rounds — at row fixpoint every in-block hop
            #    lands in a strictly LOWER row, so depth <= 7 and three
            #    full composition rounds always converge.
            if "xrow" not in skip:
                for _ in range(3):
                    own = (s >> BLK_BITS) == blk
                    s = jnp.where(own, _vgather(s, s - base), s)

            own = (s >> BLK_BITS) == blk
            v = jnp.where(
                own,
                _vgather(lit_ref[pl.ds(blk * SUB, SUB), :], s - base),
                0)
            if "sib" not in skip:
                for t in range(j):               # sibling sub-blocks
                    sel = (s >> BLK_BITS) == (sb * 4 + t)
                    v = jnp.where(
                        sel, _vgather(vs[t], s - (sb * 4 + t) * BLK),
                        v)

            # packed prefix sweep over earlier superblocks
            far = (s >> 12) < sb
            g0 = jnp.min(jnp.where(far, s, jnp.int32(2 ** 30))) >> 12
            g1 = jnp.max(jnp.where(far, s, jnp.int32(-1))) >> 12
            row = s >> 9
            lane = s & (LANES - 1)

            def sweep(kk, acc):
                rows = out_ref[pl.ds(kk * SUB, SUB), :]
                for u in range(SUB):
                    rb = jnp.broadcast_to(rows[u:u + 1, :],
                                          (SUB, LANES))
                    acc = jnp.where(
                        row == kk * SUB + u,
                        jnp.take_along_axis(rb, lane, axis=1), acc)
                return acc

            w = jnp.zeros((SUB, LANES), jnp.int32)
            if "sweep" not in skip:
                w = jax.lax.fori_loop(g0, g1 + 1, sweep, w)
            fv = (w >> (((s >> 7) & 3) * 8)) & 255
            vs.append(jnp.where(far, fv, v))

        rows_out = []
        for j in range(4):                       # sublane-pack 4 -> 1
            b = vs[j]
            rows_out.append(b[0:1] | (b[1:2] << 8) | (b[2:3] << 16)
                            | (b[3:4] << 24))
            rows_out.append(b[4:5] | (b[5:6] << 8) | (b[6:7] << 16)
                            | (b[7:8] << 24))
        out_ref[pl.ds(sb * SUB, SUB), :] = jnp.concatenate(rows_out,
                                                           axis=0)
        return 0

    jax.lax.fori_loop(0, n_super, superblock, 0)


@functools.partial(jax.jit, static_argnames=("skip",))
def resolve_packed(src: jnp.ndarray, lit: jnp.ndarray,
                   skip: tuple = ()) -> jnp.ndarray:
    """Chase mod-collapsed pointers to their literal roots and emit the
    root bytes, per member, in one kernel pass.

    Args:
        src: (B, N) int32 absolute source positions; literals (and
            padding) are fixpoints ``src[p] == p``, matches satisfy
            ``src[p] < p`` (mod-collapse guarantees this — corrupt
            forward pointers produce garbage bytes that the caller's
            CRC check catches).
        lit: (B, N) int32 literal byte (< 256) per position, read only
            at literal roots.

    Returns (B, N // 512, 128) int32 sublane-packed plaintext words:
    position p's byte is ``(out[b, p >> 9, p & 127] >> (8 * ((p >> 7)
    & 3))) & 255`` (see module docstring).  N must divide by 4096.
    """
    bsz, n = src.shape
    assert n % SUPER == 0 and lit.shape == (bsz, n)
    rows = n // LANES

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, n // 512, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_resolve_kernel, n_super=n // SUPER,
                             skip=tuple(skip))

    def kfn(s_r, l_r, o_r):
        kern(s_r.at[0], l_r.at[0], o_r.at[0])

    return pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec, spec],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((bsz, n // 512, LANES),
                                       jnp.int32),
        interpret=_interp(),
    )(src.astype(jnp.int32).reshape(bsz, rows, LANES),
      lit.astype(jnp.int32).reshape(bsz, rows, LANES))


def unpack_bytes(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, N//512, 128) sublane-packed words -> (B, n) int32 bytes
    (transpose+reshape only; fuses into surrounding XLA)."""
    bsz = packed.shape[0]
    w = packed.reshape(bsz, -1, 2, 1, LANES)
    planes = jnp.concatenate(
        [(w >> (8 * k)) & 255 for k in range(4)], axis=3)
    return planes.reshape(bsz, -1)[:, :n]


@jax.jit
def resolve_bytes(src: jnp.ndarray, lit: jnp.ndarray) -> jnp.ndarray:
    """resolve_packed + unpack: (B, N) int32 root bytes per position.
    N must divide by 1024 (padded to a superblock internally)."""
    bsz, n = src.shape
    pad = (-n) % SUPER
    if pad:
        fix = jnp.arange(n, n + pad, dtype=jnp.int32)[None, :]
        src = jnp.concatenate(
            [src, jnp.broadcast_to(fix, (bsz, pad))], axis=1)
        lit = jnp.concatenate(
            [lit, jnp.zeros((bsz, pad), jnp.int32)], axis=1)
    return unpack_bytes(resolve_packed(src, lit), n)
