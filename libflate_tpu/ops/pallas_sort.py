"""Pallas TPU bitonic sort — (key, payloads...) per member, fully static.

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

Payloads generalize to a tuple: each extra payload costs one extra
shuffle + select per substage (the compare is shared), measured
~+1.8 ms per payload per 8 MiB — how ops/sort_match affords carrying
the next two prefix words through the sort (exact match lengths to 12
with zero gathers).

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


def _sort_kernel(kin_ref, pin_refs, k_ref, p_refs, *, n_vregs: int,
                 n_log: int, tiebreak: bool):
    """Bitonic network over (key, payloads...).  ``pin_refs``/``p_refs``
    are (possibly empty) tuples; tiebreak compares payload 0."""
    n_pay = len(pin_refs)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    e_in = iota_s * LANES + iota_l          # element id within vreg

    def less(ak, aps, bk, bps):
        """(ak, aps) < (bk, bps) — payload-0 tie-break makes the order
        total when payloads are unique (sorted-by-prefix candidates
        need equal-key runs in position order)."""
        if tiebreak and n_pay:
            return (ak < bk) | ((ak == bk) & (aps[0] < bps[0]))
        return ak < bk

    def exchange(k, ps, qk, qps, want):
        # ONE less() per exchange: takeq = less(theirs, mine) == want.
        # On the want==False side this swaps EQUAL elements too —
        # harmless: with tiebreak the order is total (no equals), and
        # without it equal keys are interchangeable by contract.
        takeq = less(qk, qps, k, ps) == want
        return (jnp.where(takeq, qk, k),
                tuple(jnp.where(takeq, qp, p) for qp, p in zip(qps, ps)))

    def pair_minmax(ka, pa, kb, pb, up):
        """a gets the pair min (ascending) / max (descending)."""
        takeb = less(kb, pb, ka, pa) == up
        return (jnp.where(takeb, kb, ka),
                tuple(jnp.where(takeb, y, x) for x, y in zip(pa, pb)),
                jnp.where(takeb, ka, kb),
                tuple(jnp.where(takeb, x, y) for x, y in zip(pa, pb)))

    def invreg_substages(k, ps, e_or_scalar_up, stage, first_stage):
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
                    qps = tuple(_xor_rows(p, d >> 7) for p in ps)
                else:
                    # per-element take_along (A/B: two static pltpu
                    # rolls + select measured slightly SLOWER)
                    perm = iota_l ^ d
                    qk = jnp.take_along_axis(k, perm, axis=1)
                    qps = tuple(jnp.take_along_axis(p, perm, axis=1)
                                for p in ps)
                is_lo = (e_in & d) == 0
                k, ps = exchange(k, ps, qk, qps,
                                 jnp.logical_not(jnp.logical_xor(up,
                                                                 is_lo)))
        return k, ps

    # ---- phase A: stages 1..min(10, n_log), one pass, register-held -
    # (reads the input refs, writes the in-place-sorted output refs).
    # Each vreg's 55-substage cascade is a serially DEPENDENT chain
    # (latency-bound, like the rank kernel's binary search), so eight
    # independent vregs interleave per iteration for ILP.
    a_top = min(10, n_log)
    a_par = 8 if n_vregs % 8 == 0 else (4 if n_vregs % 4 == 0 else 1)

    def phase_a(i, _):
        for j in range(a_par):
            v = i * a_par + j
            k = kin_ref[pl.ds(v * SUB, SUB), :]
            ps = tuple(r[pl.ds(v * SUB, SUB), :] for r in pin_refs)

            def up_of(size, v=v):
                return (v * VREG) & size == 0

            k, ps = invreg_substages(k, ps, up_of, a_top, 1)
            k_ref[pl.ds(v * SUB, SUB), :] = k
            for r, p in zip(p_refs, ps):
                r[pl.ds(v * SUB, SUB), :] = p
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
                pa = tuple(r[pl.ds(v * SUB, SUB), :] for r in p_refs)
                pb = tuple(r[pl.ds(w * SUB, SUB), :] for r in p_refs)
                up = (v * VREG) & size == 0
                ka, pa, kb, pb = pair_minmax(ka, pa, kb, pb, up)
                k_ref[pl.ds(v * SUB, SUB), :] = ka
                k_ref[pl.ds(w * SUB, SUB), :] = kb
                for r, x, y in zip(p_refs, pa, pb):
                    r[pl.ds(v * SUB, SUB), :] = x
                    r[pl.ds(w * SUB, SUB), :] = y
                return 0

            jax.lax.fori_loop(0, n_vregs // 2, xpair, 0)

        # block pass: block-local cross distances + in-vreg tail, all
        # under one load/store of bv vregs
        def block_pass(b8, _, stage=stage, size=size):
            ks = [k_ref[pl.ds((b8 * bv + i) * SUB, SUB), :]
                  for i in range(bv)]
            ps = [tuple(r[pl.ds((b8 * bv + i) * SUB, SUB), :]
                        for r in p_refs) for i in range(bv)]
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
                for r, p in zip(p_refs, ps[i]):
                    r[pl.ds((b8 * bv + i) * SUB, SUB), :] = p
            return 0

        jax.lax.fori_loop(0, n_vregs // bv, block_pass, 0)


def _sort_call(key: jnp.ndarray, payloads: tuple, tiebreak: bool):
    bsz, n = key.shape
    assert n >= VREG and (n & (n - 1)) == 0
    rows = n // LANES
    n_log = n.bit_length() - 1
    n_pay = len(payloads)

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_sort_kernel, n_vregs=n // VREG,
                             n_log=n_log, tiebreak=tiebreak)

    def kfn(*refs):
        ins, outs = refs[:1 + n_pay], refs[1 + n_pay:]
        kern(ins[0].at[0], tuple(r.at[0] for r in ins[1:]),
             outs[0].at[0], tuple(r.at[0] for r in outs[1:]))

    shape = jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32)
    outs = pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec] * (1 + n_pay),
        out_specs=[spec] * (1 + n_pay),
        out_shape=[shape] * (1 + n_pay),
        interpret=_interp(),
    )(key.astype(jnp.int32).reshape(bsz, rows, LANES),
      *(p.astype(jnp.int32).reshape(bsz, rows, LANES)
        for p in payloads))
    return tuple(o.reshape(bsz, n) for o in outs)


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
    return _sort_call(key, (payload,), tiebreak)


@functools.partial(jax.jit, static_argnames=("tiebreak",))
def sort_multi(key: jnp.ndarray, *payloads: jnp.ndarray,
               tiebreak: bool = False):
    """sort_pairs generalized to any number of carried payload arrays
    (each +~1.8 ms per 8 MiB; the compare is shared).  Tie-break, if
    requested, uses payload 0.  Returns (key_sorted, *payloads_sorted).
    """
    return _sort_call(key, tuple(payloads), tiebreak)


@jax.jit
def sort_keys(key: jnp.ndarray) -> jnp.ndarray:
    """Single-array variant of sort_pairs: sort each member's int32
    keys ascending (half the data movement — callers pack payload bits
    into the key when they fit)."""
    return _sort_call(key, (), False)[0]
