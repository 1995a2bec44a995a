"""Pallas TPU bitonic sort — (key, payload) per member, fully static.

Why a sort: the LZ77 matcher needs, per position, its nearest previous
occurrences of the same 3/4-byte prefix.  A hash table expresses this
as scatter/gather, which on TPU costs buckets x positions select work
(the round-3 per-lane-table kernel spent ~26 ms / 8 MiB in its insert
sweep, linear in bucket count).  Sorting (prefix-key, position) instead
makes every position's candidate set its ADJACENT sorted neighbors —
and a bitonic network is the TPU-shaped sort: every compare-exchange
pattern is static (vreg-aligned row swaps, static sublane permutations,
static lane-XOR shuffles), no scatter, no dynamic control flow.

One 65536-element member sorts in log2(n)*(log2(n)+1)/2 = 136
compare-exchange substages; substages with distance >= 1024 exchange
whole vregs, the <= 512 tail runs register-resident per vreg.

Parity note: replaces the candidate half of the reference's
insert-before-probe prefix table (libflate_lz77/src/default.rs:69-129)
with an order-based formulation; the sorted back-scan IS the zlib-style
hash chain (nearest previous same-prefix positions, most recent first).
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
VREG = SUB * LANES            # 1024 elements per vreg


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _xor_rows(v: jnp.ndarray, c: int) -> jnp.ndarray:
    """Rows permuted by r -> r ^ c (c in {1, 2, 4}; static slices)."""
    if c == 4:
        return jnp.concatenate([v[4:8], v[0:4]], axis=0)
    if c == 2:
        return jnp.concatenate([v[2:4], v[0:2], v[6:8], v[4:6]], axis=0)
    parts = []
    for r in range(0, SUB, 2):
        parts.extend([v[r + 1:r + 2], v[r:r + 1]])
    return jnp.concatenate(parts, axis=0)


def _sort_kernel(kin_ref, pin_ref, k_ref, p_ref, *, n_vregs: int,
                 n_log: int, tiebreak: bool):
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    e_in = iota_s * LANES + iota_l          # element id within vreg

    def copy(v, _):
        k_ref[pl.ds(v * SUB, SUB), :] = kin_ref[pl.ds(v * SUB, SUB), :]
        p_ref[pl.ds(v * SUB, SUB), :] = pin_ref[pl.ds(v * SUB, SUB), :]
        return 0

    jax.lax.fori_loop(0, n_vregs, copy, 0)

    def less(ak, ap, bk, bp):
        """(ak, ap) < (bk, bp) — payload tie-break makes the order
        total when payloads are unique (sorted-by-prefix candidates
        need equal-key runs in position order)."""
        if tiebreak:
            return (ak < bk) | ((ak == bk) & (ap < bp))
        return ak < bk

    def exchange(k, p, qk, qp, want):
        # int32 select — Mosaic cannot lower a select of i1 vectors
        takeq = jnp.where(want,
                          less(qk, qp, k, p).astype(jnp.int32),
                          less(k, p, qk, qp).astype(jnp.int32)) != 0
        return (jnp.where(takeq, qk, k), jnp.where(takeq, qp, p))

    for stage in range(1, n_log + 1):       # block size = 2**stage
        size = 1 << stage
        # ---- cross-vreg substages (distance >= 1024) ----------------
        for d_log in range(stage - 1, 9, -1):
            d = 1 << d_log
            dv = d // VREG

            def xpair(i, _, dv=dv, size=size):
                # i-th low-partner vreg: insert the dv bit as zero
                v = ((i & ~(dv - 1)) << 1) | (i & (dv - 1))
                w = v + dv
                ka = k_ref[pl.ds(v * SUB, SUB), :]
                kb = k_ref[pl.ds(w * SUB, SUB), :]
                pa = p_ref[pl.ds(v * SUB, SUB), :]
                pb = p_ref[pl.ds(w * SUB, SUB), :]
                up = (v * VREG) & size == 0
                # a is the low element of every pair
                takeb = jnp.where(up,
                                  less(kb, pb, ka, pa).astype(jnp.int32),
                                  less(ka, pa, kb, pb).astype(jnp.int32)
                                  ) != 0
                k_ref[pl.ds(v * SUB, SUB), :] = jnp.where(takeb, kb, ka)
                p_ref[pl.ds(v * SUB, SUB), :] = jnp.where(takeb, pb, pa)
                k_ref[pl.ds(w * SUB, SUB), :] = jnp.where(takeb, ka, kb)
                p_ref[pl.ds(w * SUB, SUB), :] = jnp.where(takeb, pa, pb)
                return 0

            jax.lax.fori_loop(0, n_vregs // 2, xpair, 0)

        # ---- in-vreg substages (distances 512 .. 1) ------------------
        def invreg(v, _, stage=stage, size=size):
            k = k_ref[pl.ds(v * SUB, SUB), :]
            p = p_ref[pl.ds(v * SUB, SUB), :]
            e = v * VREG + e_in
            up = (e & size) == 0
            for d_log in range(min(stage - 1, 9), -1, -1):
                d = 1 << d_log
                if d >= LANES:
                    qk = _xor_rows(k, d >> 7)
                    qp = _xor_rows(p, d >> 7)
                else:
                    perm = iota_l ^ d
                    qk = jnp.take_along_axis(k, perm, axis=1)
                    qp = jnp.take_along_axis(p, perm, axis=1)
                is_lo = (e_in & d) == 0
                k, p = exchange(k, p, qk, qp, up == is_lo)
            k_ref[pl.ds(v * SUB, SUB), :] = k
            p_ref[pl.ds(v * SUB, SUB), :] = p
            return 0

        jax.lax.fori_loop(0, n_vregs, invreg, 0)


@functools.partial(jax.jit, static_argnames=("tiebreak",))
def sort_pairs(key: jnp.ndarray, payload: jnp.ndarray,
               tiebreak: bool = False):
    """Sort each member's (key, payload) pairs by int32 key, ascending.

    key, payload: (B, N) int32, N a power of two >= 1024.  Signed
    compare — callers bias unsigned keys by ^0x80000000.  With
    ``tiebreak`` equal keys order by payload (stable-equivalent when
    payloads are unique positions).
    Returns (key_sorted, payload_sorted), same shapes.
    """
    bsz, n = key.shape
    assert n >= VREG and (n & (n - 1)) == 0
    rows = n // LANES
    n_log = n.bit_length() - 1

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_sort_kernel, n_vregs=n // VREG,
                             n_log=n_log, tiebreak=tiebreak)

    def kfn(ki, pi, ko, po):
        kern(ki.at[0], pi.at[0], ko.at[0], po.at[0])

    shape = jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32)
    ks, ps = pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[shape, shape],
        interpret=_interp(),
    )(key.astype(jnp.int32).reshape(bsz, rows, LANES),
      payload.astype(jnp.int32).reshape(bsz, rows, LANES))
    return ks.reshape(bsz, n), ps.reshape(bsz, n)
