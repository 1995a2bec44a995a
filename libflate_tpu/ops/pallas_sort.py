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


def _scan_emit(k_ref, p_refs, k2_ref, m_ref, *, n_vregs: int,
               window: int, scan_k: int):
    """Sorted back-scan + unsort-key packing, register-resident.

    Runs after the bitonic network, inside the same kernel: for each
    sorted slot, score its ``scan_k`` predecessors by exact shared
    prefix length (key + carried words, 4 bytes each) and emit the
    packed unsort key ``pos<<16 | ext<<15 | dist-1`` plus the exact
    length m — the XLA back-scan this replaces cost ~2.5 ms / 8 MiB
    and forced all sorted payloads through HBM.
    """
    n_pay = len(p_refs)            # payload 0 = position, rest = words
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    e_in = iota_s * LANES + iota_l
    sign = jnp.int32(-2147483648)

    def lead_bytes(x):
        return jnp.where(
            x == 0, 4,
            jnp.where((x & jnp.int32(-16777216)) != 0, 0,
                      jnp.where(x & 0xFF0000, 1,
                                jnp.where(x & 0xFF00, 2, 3))))

    def vreg(v, _):
        pv = jnp.maximum(v - 1, 0)
        ck = k_ref[pl.ds(v * SUB, SUB), :]
        cps = [r[pl.ds(v * SUB, SUB), :] for r in p_refs]
        pk = k_ref[pl.ds(pv * SUB, SUB), :]
        pps = [r[pl.ds(pv * SUB, SUB), :] for r in p_refs]
        first = v == 0

        best_score = jnp.full((SUB, LANES), -1, jnp.int32)
        best_cand = jnp.full((SUB, LANES), -1, jnp.int32)
        best_l = jnp.zeros((SUB, LANES), jnp.int32)
        for k in range(1, scan_k + 1):
            lane = (iota_l - k) & (LANES - 1)
            in_row = iota_l >= k

            def sh(c, p):
                cr = jnp.take_along_axis(c, lane, axis=1)
                pr = jnp.take_along_axis(p, lane, axis=1)
                down = jnp.concatenate([pr[SUB - 1:SUB],
                                        cr[:SUB - 1]], axis=0)
                return jnp.where(in_row, cr, down)

            kk = sh(ck, pk)
            pp = sh(cps[0], pps[0])
            # only the position fill matters at the member head: a
            # huge pp makes dist negative -> candidate rejected
            pp = jnp.where(first & (e_in < k), jnp.int32(1 << 20), pp)
            x = ck ^ kk
            lcp = lead_bytes(x)
            all_eq = x == 0
            for i in range(1, n_pay):
                xi = cps[i] ^ sh(cps[i], pps[i])
                lcp = jnp.where(all_eq, 4 * i + lead_bytes(xi), lcp)
                all_eq = all_eq & (xi == 0)
            dist = cps[0] - pp
            ok = (dist > 0) & (dist <= window) & (lcp >= 3)
            score = (lcp << 17) + (window - dist)
            upd = ok & (score > best_score)
            best_score = jnp.where(upd, score, best_score)
            best_cand = jnp.where(upd, pp, best_cand)
            best_l = jnp.where(upd, lcp, best_l)

        valid = best_cand >= 0
        ext = valid & (best_l >= 4)
        dist_b = jnp.where(valid, cps[0] - best_cand - 1, 0x7FFF)
        packed = ((cps[0] << 16) | (ext.astype(jnp.int32) << 15)
                  | dist_b)
        k2_ref[pl.ds(v * SUB, SUB), :] = packed ^ sign
        m_ref[pl.ds(v * SUB, SUB), :] = best_l
        return 0

    jax.lax.fori_loop(0, n_vregs, vreg, 0)


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


@functools.partial(jax.jit,
                   static_argnames=("window", "scan_k", "fuse_unsort"))
def sort_scan_candidates(key: jnp.ndarray, pos: jnp.ndarray,
                         *words: jnp.ndarray, window: int,
                         scan_k: int, fuse_unsort: bool = False):
    """Fused matcher back-end: bitonic (key, pos, words...) sort with
    position tie-break, then the sorted back-scan IN the same kernel.

    The content-sorted arrays never leave VMEM (the network runs on
    scratch buffers); only the two scan products reach HBM, so the
    back-scan comes FREE relative to the sort alone (A/B on the bench
    corpus: 19.0 vs 19.5 ms / 8 MiB for sort_multi without the scan —
    the split pipeline's XLA back-scan cost ~2.5 ms on top and moved
    every sorted payload through HBM).

    ``fuse_unsort=True`` additionally runs the position re-sort in the
    same kernel (scan into scratch, unsort scratch -> output blocks).
    Measured and REJECTED as the default: 34.7 ms vs 19.0 + ~11 for
    the separate ``sort_pairs`` dispatch under the same load — the
    third network phase inside one program schedules worse than a
    standalone kernel, and an in-place variant on the output blocks
    was far worse still (54.5 ms; read-write aliasing defeats Mosaic's
    loop pipelining).

    Returns (key2, m) both (B, N) int32, in SORTED order unless
    ``fuse_unsort`` — ``key2`` is the packed unsort key ``(pos << 16 |
    ext << 15 | dist-1) ^ 0x80000000`` (all-ones dist with a clear ext
    flag = no candidate) and ``m`` the exact shared-prefix length with
    the best predecessor (0 if none).  ``ops.sort_match`` feeds key2/m
    through the unsort ``sort_pairs`` and decodes cand/m in text
    order.
    """
    assert 1 <= scan_k <= SUB * LANES // 2
    bsz, n = key.shape
    assert n >= VREG and (n & (n - 1)) == 0
    rows = n // LANES
    n_log = n.bit_length() - 1
    n_pay = 1 + len(words)

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    sort_kern = functools.partial(_sort_kernel, n_vregs=n // VREG,
                                  n_log=n_log, tiebreak=True)
    scan_kern = functools.partial(_scan_emit, n_vregs=n // VREG,
                                  window=window, scan_k=scan_k)
    unsort_kern = functools.partial(_sort_kernel, n_vregs=n // VREG,
                                    n_log=n_log, tiebreak=False)

    def kfn(*refs):
        ins = refs[:1 + n_pay]
        k2_ref, m_ref = refs[1 + n_pay:3 + n_pay]
        scr = refs[3 + n_pay:]
        sort_kern(ins[0].at[0], tuple(r.at[0] for r in ins[1:]),
                  scr[0], tuple(scr[1:]))
        if fuse_unsort:
            # scan into dedicated scratch, then unsort scratch -> the
            # output blocks.  (Running the unsort IN PLACE on the
            # output blocks measured 35 ms vs 10 standalone — the
            # read-write aliasing defeats Mosaic's loop pipelining.)
            sk, sm_ = scr[1 + n_pay], scr[2 + n_pay]
            scan_kern(scr[0], tuple(scr[1:1 + n_pay]), sk, sm_)
            unsort_kern(sk, (sm_,), k2_ref.at[0], (m_ref.at[0],))
        else:
            scan_kern(scr[0], tuple(scr[1:1 + n_pay]), k2_ref.at[0],
                      m_ref.at[0])

    shape = jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32)
    k2, m = pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec] * (1 + n_pay),
        out_specs=[spec] * 2,
        out_shape=[shape] * 2,
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)] * (
            (3 if fuse_unsort else 1) + n_pay),
        interpret=_interp(),
    )(key.astype(jnp.int32).reshape(bsz, rows, LANES),
      pos.astype(jnp.int32).reshape(bsz, rows, LANES),
      *(w.astype(jnp.int32).reshape(bsz, rows, LANES) for w in words))
    return k2.reshape(bsz, n), m.reshape(bsz, n)


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
