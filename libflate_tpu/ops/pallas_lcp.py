"""Pallas TPU exact-LCP kernel — member-per-program match lengths.

The XLA match-length stage (ops/lz77.match_lengths) is the encode
pipeline's second-largest cost (~0.7 s / 8 MiB warm): every extension
round gathers 4-byte words at candidate offsets through XLA's ~85 M
elem/s scalarized gather.  This kernel runs one member per grid program
with the member's entire 4-byte-word array resident in VMEM (64 Ki
words = 512×128 rows), so a gather is a bounded row-group sweep of
lane shuffles (~0.8 vop/element) instead of an HBM scalar load.

Key lockstep invariant: a lane stays *active* only while its words
fully match, so every active lane's current length equals 4·round —
the position-side word offset is uniform per round and needs only a
2-group windowed read, while the candidate side sweeps a 34-group
window (the 32 KiB DEFLATE history bound maps to ≤ 34 row groups).

Semantics: ln[p] = min(true LCP(p, cand[p]), limit[p], 4·max_rounds),
limit = min(258, n_valid - p); ln = 0 where cand < 0.  Mirrors the
reference's sequential byte loop (libflate_lz77/src/default.rs:111-129)
under the same round cap as the XLA path.
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
ROWS = 512                  # 64 Ki positions / 128 lanes (TPU shape)
N = ROWS * LANES            # 65536 positions per member
MAX_MATCH = 258


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _gather_window(w4_ref, tgt, start_group, n_groups: int):
    """acc[s,l] = w4[tgt[s,l]] for element ids tgt within the swept
    row window [8·start_group, 8·(start_group+n_groups)).

    (A fused variant serving all extension offsets from one sweep
    measured 62 vs 42 ms / 8 MiB — the 6 live accumulator sets spill;
    the per-round loop keeps one.  Round-4 A/B, do not re-fuse.)

    A single select-accumulator is a serially DEPENDENT chain of
    8·n_groups selects (the bitonic sort's latency-bound shape, see
    ops/pallas_sort phase A): 8 per-sublane accumulators interleave
    independent chains of n_groups each, OR-merged at the end (each
    element matches exactly one swept row, all other contributions
    stay 0)."""
    g = tgt >> 7                       # element row 0..rows-1
    lane = tgt & (LANES - 1)
    accs = [jnp.zeros((SUB, LANES), jnp.int32) for _ in range(SUB)]
    for kk in range(n_groups):
        rows = w4_ref[pl.ds(start_group * SUB + kk * SUB, SUB), :]
        for s in range(SUB):
            rb = jnp.broadcast_to(rows[s:s + 1, :], (SUB, LANES))
            v = jnp.take_along_axis(rb, lane, axis=1)
            accs[s] = jnp.where(
                g == start_group * SUB + kk * SUB + s, v, accs[s])
    while len(accs) > 1:
        accs = [accs[i] | accs[i + 1] for i in range(0, len(accs), 2)]
    return accs[0]


def _lcp_kernel(max_rounds, groups, win_groups, first_round, w4_ref,
                cand_ref, m4_ref, nv_ref, out_ref):
    b = pl.program_id(0)
    n = groups * SUB * LANES
    pos_groups = min(2, groups)
    nv = nv_ref[b, 0]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)

    def vreg_step(t, _):
        c = cand_ref[pl.ds(t * SUB, SUB), :]
        e = t * (SUB * LANES) + iota_s * LANES + iota_l
        lim = jnp.clip(jnp.minimum(MAX_MATCH, nv - e), 0, None)
        cand_start = jnp.clip(t - (win_groups - 2), 0, groups - win_groups)
        pos_start = jnp.minimum(t, groups - pos_groups)
        if first_round == 0:
            ln0 = jnp.zeros((SUB, LANES), jnp.int32)
            act0 = ((c >= 0) & (lim > 0)).astype(jnp.int32)
        else:
            # exact shared-prefix length (<= 4*first_round) already
            # known (sort matcher payload compares): extension only
            # where the full known prefix matched, the limit allows
            # more, AND the candidate's words lie inside the swept band
            # (with a narrow tail window, farther candidates simply
            # keep their exact m — no garbage reads)
            exact = 4 * first_round
            m4 = m4_ref[pl.ds(t * SUB, SUB), :]
            ln0 = jnp.minimum(jnp.where(c >= 0, m4, 0), lim)
            act0 = ((c >= 0) & (m4 >= exact) & (lim > exact)
                    & (c >= cand_start * (SUB * LANES))
                    ).astype(jnp.int32)

        def round_body(r, state):
            ln, act = state
            alive = jnp.max(act) > 0

            def live(ln=ln, act=act, r=r):
                d = 4 * r                     # uniform: active ⇒ ln == 4r
                wc = _gather_window(w4_ref, jnp.clip(c + d, 0, n - 1),
                                    cand_start, win_groups)
                wp = _gather_window(w4_ref, jnp.clip(e + d, 0, n - 1),
                                    pos_start, pos_groups)
                x = wc ^ wp
                tz = jnp.where(x == 0, 4,
                               jnp.where(x & 0xFF, 0,
                                         jnp.where(x & 0xFFFF, 1,
                                                   jnp.where(x & 0xFFFFFF,
                                                             2, 3))))
                ln2 = jnp.minimum(ln + jnp.where(act > 0, tz, 0), lim)
                act2 = act * ((x == 0) & (ln2 < lim)).astype(jnp.int32)
                return ln2, act2

            def dead(ln=ln, act=act):
                return ln, act

            return jax.lax.cond(alive, live, dead)

        ln, _act = jax.lax.fori_loop(first_round, max_rounds, round_body,
                                     (ln0, act0))
        out_ref[pl.ds(t * SUB, SUB), :] = jnp.where(c >= 0, ln, 0)
        return 0

    jax.lax.fori_loop(0, groups, vreg_step, 0)


@functools.partial(jax.jit,
                   static_argnames=("max_rounds", "window", "m_exact"))
def match_lengths_pallas(blocks: jnp.ndarray, cand: jnp.ndarray,
                         n_valid: jnp.ndarray,
                         max_rounds: int = 32,
                         window: int = 32768,
                         m4: jnp.ndarray | None = None,
                         m_exact: int = 4) -> jnp.ndarray:
    """(B, 65536) uint8 blocks + (B, 65536) int32 candidates →
    (B, n) int32 match lengths (see module docstring for the exact
    clip semantics).  B members run one per grid program; n must be a
    multiple of 1024 (8 sublanes × 128 lanes).

    ``window``: maximum candidate distance the caller guarantees
    (multiple of 1024; candidates farther back MUST already be -1).
    The sweep visits window//1024 + 2 row groups per round, so a
    shrunk match window cuts the kernel cost near-linearly.

    ``m4``: optional (B, n) int32 EXACT shared-prefix lengths
    (<= ``m_exact``, e.g. from ops/sort_match payload compares) — the
    first ``m_exact // 4`` rounds' full-window sweeps are skipped and
    extension runs only where m4 == m_exact, under the same
    4*max_rounds total cap.  With m_exact == 12 the caller may also
    NARROW ``window`` below the matcher's true window: candidates
    outside the narrow band are detected in-kernel and keep their
    exact length (ratio cost = only the rare long-AND-far tails;
    bench corpus: 12% of >=13 tail bytes lie past 8 KiB)."""
    bsz, n = blocks.shape
    assert n % (SUB * LANES) == 0
    assert window % 1024 == 0 and window > 0
    assert m_exact % 4 == 0 and 4 <= m_exact <= 24
    rows = n // LANES
    groups = rows // SUB
    win_groups = min(window // 1024 + 2, groups)
    d = blocks.astype(jnp.uint32)
    pad = jnp.zeros((bsz, 3), jnp.uint32)
    dd = jnp.concatenate([d, pad], axis=1)
    w4 = (dd[:, :n] | (dd[:, 1:n + 1] << 8) | (dd[:, 2:n + 2] << 16)
          | (dd[:, 3:n + 3] << 24)).astype(jnp.int32)

    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_nv = pl.BlockSpec((bsz, 1), lambda b: (0, 0),
                           memory_space=pltpu.SMEM)

    first_round = 0 if m4 is None else m_exact // 4
    m4_arr = (cand if m4 is None        # unused dummy, same spec
              else m4.astype(jnp.int32))

    def kernel(w4_r, cand_r, m4_r, nv_r, out_r):
        _lcp_kernel(max_rounds, groups, win_groups, first_round,
                    w4_r.at[0], cand_r.at[0], m4_r.at[0], nv_r,
                    out_r.at[0])

    out = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[spec, spec, spec, spec_nv],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bsz, rows, LANES), jnp.int32),
        interpret=_interp(),
    )(w4.reshape(bsz, rows, LANES), cand.reshape(bsz, rows, LANES),
      m4_arr.reshape(bsz, rows, LANES),
      n_valid.astype(jnp.int32).reshape(bsz, 1))
    return out.reshape(bsz, n)
