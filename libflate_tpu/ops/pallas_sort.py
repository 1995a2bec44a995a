"""Pallas TPU bitonic sort — (key, payload) per member, fully static.

Why a sort: the LZ77 matcher needs, per position, its nearest previous
occurrences of the same 3/4-byte prefix.  A hash table expresses this
as scatter/gather, which on TPU costs buckets x positions select work;
sorting (prefix-key, position) instead makes every position's
candidate set its ADJACENT sorted neighbors — and a bitonic network is
the TPU-shaped sort: every compare-exchange pattern is static
(vreg-aligned row swaps, static sublane permutations, static lane-XOR
shuffles), no scatter, no dynamic control flow.

Schedule: VMEM traffic, not compute, dominates a naive
substage-at-a-time schedule (measured ~2/3 of its cost), so substages
fuse register-resident:

* stages 1..10 (all distances < 1024) run as ONE pass — each vreg is
  loaded once, all 55 compare-exchange substages happen in registers;
* stages 11+ split into the few cross-block substages (distance >=
  8 Ki elements, vreg-pair exchanges) and an 8-vreg BLOCK pass that
  fuses the block-local cross distances (1..4 Ki) with the 10-substage
  in-vreg tail under one load/store.

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
BLOCK_V = 8                   # vregs fused per phase-B block pass


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


def _sort_kernel(refs, *, n_vregs: int, n_log: int, tiebreak: bool):
    if len(refs) == 4:
        kin_ref, pin_ref, k_ref, p_ref = refs
    else:                       # single-array (key-only) sort
        kin_ref, k_ref = refs
        pin_ref = p_ref = None
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    e_in = iota_s * LANES + iota_l          # element id within vreg

    def less(ak, ap, bk, bp):
        """(ak, ap) < (bk, bp) — payload tie-break makes the order
        total when payloads are unique (sorted-by-prefix candidates
        need equal-key runs in position order)."""
        if tiebreak and ap is not None:
            return (ak < bk) | ((ak == bk) & (ap < bp))
        return ak < bk

    def exchange(k, p, qk, qp, want):
        # ONE less() per exchange: takeq = less(theirs, mine) == want.
        # On the want==False side this swaps EQUAL elements too —
        # harmless: with tiebreak the order is total (no equals), and
        # without it equal keys are interchangeable by contract.
        takeq = less(qk, qp, k, p) == want
        return (jnp.where(takeq, qk, k),
                None if p is None else jnp.where(takeq, qp, p))

    def pair_minmax(ka, pa, kb, pb, up):
        """a gets the pair min (ascending) / max (descending)."""
        takeb = less(kb, pb, ka, pa) == up
        if pa is None:
            return (jnp.where(takeb, kb, ka), None,
                    jnp.where(takeb, ka, kb), None)
        return (jnp.where(takeb, kb, ka), jnp.where(takeb, pb, pa),
                jnp.where(takeb, ka, kb), jnp.where(takeb, pa, pb))

    def invreg_substages(k, p, e_or_scalar_up, stage, first_stage):
        """All substages with distance <= 512 of ``stage`` (and, when
        first_stage == 1, the full stage cascade 1..stage) on one
        register-resident vreg."""
        for st in range(first_stage, stage + 1):
            size = 1 << st
            if size <= VREG // 2:
                up = (e_in & size) == 0
            else:
                up = e_or_scalar_up(size)
            for d_log in range(min(st - 1, 9), -1, -1):
                d = 1 << d_log
                if d >= LANES:
                    qk = _xor_rows(k, d >> 7)
                    qp = None if p is None else _xor_rows(p, d >> 7)
                else:
                    # per-element take_along (A/B: two static pltpu
                    # rolls + select measured slightly SLOWER)
                    perm = iota_l ^ d
                    qk = jnp.take_along_axis(k, perm, axis=1)
                    qp = (None if p is None
                          else jnp.take_along_axis(p, perm, axis=1))
                is_lo = (e_in & d) == 0
                k, p = exchange(k, p, qk, qp,
                                jnp.logical_not(jnp.logical_xor(up,
                                                                is_lo)))
        return k, p

    # ---- phase A: stages 1..min(10, n_log), one pass, register-held -
    # (reads the input refs, writes the in-place-sorted output refs).
    # Each vreg's 55-substage cascade is a serially DEPENDENT chain
    # (latency-bound, like the rank kernel's binary search), so four
    # independent vregs interleave per iteration for ILP.
    a_top = min(10, n_log)
    a_par = 8 if n_vregs % 8 == 0 else (4 if n_vregs % 4 == 0 else 1)

    def phase_a(i, _):
        for j in range(a_par):
            v = i * a_par + j
            k = kin_ref[pl.ds(v * SUB, SUB), :]
            p = (None if pin_ref is None
                 else pin_ref[pl.ds(v * SUB, SUB), :])

            def up_of(size, v=v):
                return (v * VREG) & size == 0

            k, p = invreg_substages(k, p, up_of, a_top, 1)
            k_ref[pl.ds(v * SUB, SUB), :] = k
            if p_ref is not None:
                p_ref[pl.ds(v * SUB, SUB), :] = p
        return 0

    jax.lax.fori_loop(0, n_vregs // a_par, phase_a, 0)

    # ---- phase B: stages 11..n_log ----------------------------------
    bv = min(BLOCK_V, n_vregs)
    for stage in range(11, n_log + 1):
        size = 1 << stage

        # cross-block substages: distance >= bv * VREG
        for d_log in range(stage - 1, 9 + bv.bit_length() - 1, -1):
            d = 1 << d_log
            dv = d // VREG

            def xpair(i, _, dv=dv, size=size):
                v = ((i & ~(dv - 1)) << 1) | (i & (dv - 1))
                w = v + dv
                ka = k_ref[pl.ds(v * SUB, SUB), :]
                kb = k_ref[pl.ds(w * SUB, SUB), :]
                pa = pb = None
                if p_ref is not None:
                    pa = p_ref[pl.ds(v * SUB, SUB), :]
                    pb = p_ref[pl.ds(w * SUB, SUB), :]
                up = (v * VREG) & size == 0
                ka, pa, kb, pb = pair_minmax(ka, pa, kb, pb, up)
                k_ref[pl.ds(v * SUB, SUB), :] = ka
                k_ref[pl.ds(w * SUB, SUB), :] = kb
                if p_ref is not None:
                    p_ref[pl.ds(v * SUB, SUB), :] = pa
                    p_ref[pl.ds(w * SUB, SUB), :] = pb
                return 0

            jax.lax.fori_loop(0, n_vregs // 2, xpair, 0)

        # block pass: block-local cross distances + in-vreg tail, all
        # under one load/store of bv vregs
        def block_pass(b8, _, stage=stage, size=size):
            ks = [k_ref[pl.ds((b8 * bv + i) * SUB, SUB), :]
                  for i in range(bv)]
            ps = ([None] * bv if p_ref is None else
                  [p_ref[pl.ds((b8 * bv + i) * SUB, SUB), :]
                   for i in range(bv)])
            for d_log in range(min(stage - 1,
                                   9 + bv.bit_length() - 1), 9, -1):
                dv = (1 << d_log) // VREG
                for i in range(bv):
                    if i & dv:
                        continue
                    jj = i + dv
                    up = ((b8 * bv + i) * VREG) & size == 0
                    (ks[i], ps[i], ks[jj], ps[jj]) = pair_minmax(
                        ks[i], ps[i], ks[jj], ps[jj], up)
            for i in range(bv):
                def up_of(sz, i=i):
                    return ((b8 * bv + i) * VREG) & sz == 0

                ks[i], ps[i] = invreg_substages(ks[i], ps[i], up_of,
                                                stage, stage)
                k_ref[pl.ds((b8 * bv + i) * SUB, SUB), :] = ks[i]
                if p_ref is not None:
                    p_ref[pl.ds((b8 * bv + i) * SUB, SUB), :] = ps[i]
            return 0

        jax.lax.fori_loop(0, n_vregs // bv, block_pass, 0)


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
        kern((ki.at[0], pi.at[0], ko.at[0], po.at[0]))

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


@jax.jit
def sort_keys(key: jnp.ndarray) -> jnp.ndarray:
    """Single-array variant of sort_pairs: sort each member's int32
    keys ascending (half the data movement — callers pack payload bits
    into the key when they fit)."""
    bsz, n = key.shape
    assert n >= VREG and (n & (n - 1)) == 0
    rows = n // LANES
    n_log = n.bit_length() - 1

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_sort_kernel, n_vregs=n // VREG,
                             n_log=n_log, tiebreak=False)

    def kfn(ki, ko):
        kern((ki.at[0], ko.at[0]))

    ks = pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32),
        interpret=_interp(),
    )(key.astype(jnp.int32).reshape(bsz, rows, LANES))
    return ks.reshape(bsz, n)
