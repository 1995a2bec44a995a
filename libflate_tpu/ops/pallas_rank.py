"""Pallas TPU fused rank + token-field gather kernel.

The decode chain maps every output position p to its covering token
(``token_id(p) = #{token starts <= p} - 1``) and then gathers that
token's fields.  Round 3 did the rank in XLA (bucket one-hots + in-
bucket compares, ~7 ms per 8 MiB — the chain's second-largest stage)
and the gather in ops/pallas_gather.gather_two (~1 ms).  This kernel
fuses both into one pass over the output positions (~1 ms total):

* XLA precomputes only the cheap coarse half: ``cex[r]`` = number of
  tokens starting before output position 128*r (fused one-hot counts
  over the token array + a tiny cumsum).
* Per 1024-position output vreg the kernel loads a 16-row (2048-token)
  window of the token-start and packed-token tables — every token id
  the vreg can touch provably lies inside it (<= 1024 tokens start
  within 1024 positions).
* The in-bucket rank is a 128-wide binary search run as 8 per-element
  lane shuffles on a per-row window of SORTED starts, materialized
  with a two-step sublane-then-lane shuffle: ``take_along_axis`` along
  sublanes with a row-constant index vector composes with a lane
  shuffle into a full (row, lane) gather — the trick that makes all
  window reads single-vreg work instead of 8-row broadcast sweeps.

Parity: infrastructure for the reference decode hot loop
(src/deflate/decode.rs:112-130 + libflate_lz77/src/lib.rs:164-194),
re-expressed as batched rank/gather.
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
WIN = 16                      # token-table rows per out-vreg window


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _sel16(w0, w1, rsel):
    """rows[j, l] = W[rsel_j, l] for a 16-row window held as two
    stacked (8, 128) vregs; rsel must be row-constant (the sublane
    take_along composes only then)."""
    lo = jnp.take_along_axis(w0, jnp.clip(rsel, 0, SUB - 1), axis=0)
    hi = jnp.take_along_axis(w1, jnp.clip(rsel - SUB, 0, SUB - 1),
                             axis=0)
    return jnp.where(rsel < SUB, lo, hi)


def _rank_one(v, cex_at, lo_at, st_ref, pk_ref, emit, nout, out_cap):
    """One out-vreg's rank + gather (+ fused mod-collapse when emit ==
    "src").  ``cex_at(i)`` / ``lo_at(v)`` read the member's SMEM rows;
    callers interleave several of these per loop iteration — the fine
    search is a mostly-dependent shuffle chain, so independent vregs
    overlap it (the bitonic phase-A lesson)."""
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
    zeros = jnp.zeros((SUB, LANES), jnp.int32)
    lo = lo_at(v)
    w0 = st_ref[pl.ds(lo, SUB), :]
    w1 = st_ref[pl.ds(lo + SUB, SUB), :]
    p0 = pk_ref[pl.ds(lo, SUB), :]
    p1 = pk_ref[pl.ds(lo + SUB, SUB), :]

    cexv = zeros
    for j in range(SUB):
        cexv = jnp.where(iota_s == j, cex_at(v * SUB + j),
                         cexv)
    offs = cexv - lo * LANES              # row-constant, >= 1

    # S[j, k] = starts[cex_j + k]: two-step (sublane, lane) gather
    flat = offs + iota_l                  # [1, 2048)
    ra = offs >> 7                        # row-constant
    rowa = _sel16(w0, w1, ra)
    rowb = _sel16(w0, w1, ra + 1)
    lane = flat & (LANES - 1)
    s_win = jnp.where((flat >> 7) == ra,
                      jnp.take_along_axis(rowa, lane, axis=1),
                      jnp.take_along_axis(rowb, lane, axis=1))

    # fine = #{k: S[j, k] <= p} — coarse counting + binary tail.
    # 8 INDEPENDENT static-index probes count complete 16-blocks
    # <= p; a 4-probe binary search resolves within the block
    # (dependent chain of 4, hidden by the cross-vreg interleave).
    # The round-3 shape was 8 + 15 independent probes — the binary
    # tail trades 11 probes for 4 chain links.
    p = v * 1024 + iota_s * LANES + iota_l
    fh = zeros
    for m in range(SUB):
        sval = jnp.take_along_axis(
            s_win, jnp.full((SUB, LANES), 16 * m + 15, jnp.int32),
            axis=1)
        fh = fh + (sval <= p).astype(jnp.int32)
    base16 = fh << 4
    off = zeros
    for step in (8, 4, 2, 1):
        idx = jnp.minimum(base16 + off + step - 1, LANES - 1)
        sval = jnp.take_along_axis(s_win, idx, axis=1)
        off = off + jnp.where(sval <= p, step, 0)
    fine = jnp.where(fh == SUB, LANES, base16 + off)

    li = offs - 1 + fine                  # window-local token id
    # per-row the ids span <= 129 -> two window rows; the lower one
    # is row-constant (ids are monotone along the row: lane 0 min)
    lmin = jnp.take_along_axis(li, zeros, axis=1)
    qa = lmin >> 7
    sh = li & (LANES - 1)
    in_a = (li >> 7) == qa
    sa = _sel16(w0, w1, qa)
    sb = _sel16(w0, w1, qa + 1)
    pa = _sel16(p0, p1, qa)
    pb = _sel16(p0, p1, qa + 1)
    o_s = jnp.where(in_a, jnp.take_along_axis(sa, sh, axis=1),
                    jnp.take_along_axis(sb, sh, axis=1))
    o_p = jnp.where(in_a, jnp.take_along_axis(pa, sh, axis=1),
                    jnp.take_along_axis(pb, sh, axis=1))
    if emit == "fields":
        return o_s, o_p

    # emit == "src": fold the mod-collapse (ops/device_expand's
    # XLA tail) into the kernel — src/lit land directly, no extra
    # 8M-element XLA pass between rank and resolve.
    d = (o_p >> 9) & 0xFFFF
    av = o_p & 511
    is_lit = d == 0
    rel = p - o_s                 # [0, 257] on live positions
    dm = jnp.maximum(d, 1)
    # rel % dm via f32 reciprocal + two +-1 fixups (exact: rel and
    # dm are small, the quotient is off by at most one ULP-round)
    q = (rel.astype(jnp.float32) / dm.astype(jnp.float32)
         ).astype(jnp.int32)
    r = rel - q * dm
    r = r + jnp.where(r < 0, dm, 0)
    r = r - jnp.where(r >= dm, dm, 0)
    src = jnp.where(is_lit, p, r + o_s - d)
    lit = jnp.where(is_lit, av & 255, 0)
    live = p < nout
    src = jnp.where(live, jnp.clip(src, 0, out_cap - 1), p)
    lit = jnp.where(live, lit, 0)
    return src, lit


def _rank_kernel(cex_ref, lo_ref, st_ref, pk_ref, os_ref, op_ref, *,
                 n_vregs: int, ilp: int = 2, emit: str = "fields",
                 nout_ref=None, out_cap: int = 0):
    while n_vregs % ilp:          # largest power-of-two divisor <= ilp
        ilp //= 2
    nout = nout_ref[0, 0, 0] if nout_ref is not None else 0

    def vreg(i, _):
        outs = [_rank_one(i * ilp + j,
                          lambda k: cex_ref[0, k, 0],
                          lambda v: lo_ref[0, v, 0],
                          st_ref, pk_ref, emit, nout, out_cap)
                for j in range(ilp)]
        for j, (o_s, o_p) in enumerate(outs):
            os_ref[pl.ds((i * ilp + j) * SUB, SUB), :] = o_s
            op_ref[pl.ds((i * ilp + j) * SUB, SUB), :] = o_p
        return 0

    jax.lax.fori_loop(0, n_vregs // ilp, vreg, 0)


@functools.partial(jax.jit, static_argnames=("out_cap", "ilp"))
def rank_gather_fields(starts: jnp.ndarray, pk: jnp.ndarray,
                       valid: jnp.ndarray, out_cap: int, ilp: int = 8):
    """Fused output-position -> covering-token rank + 2-field gather.

    Args:
        starts: (B, T) int32 token output start positions, monotone
            over valid tokens (every token emits >= 1 byte).
        pk: (B, T) int32 packed token words.
        valid: (B, T) bool token-slot validity.
        out_cap: static output capacity (multiple of 1024).

    Returns (tok_start, tok_pk): (B, out_cap) int32 — for each output
    position, its covering token's start and packed word.
    """
    return _rank_call(starts, pk, valid, None, out_cap, ilp, "fields")


@functools.partial(jax.jit, static_argnames=("out_cap", "ilp"))
def rank_emit_src(starts: jnp.ndarray, pk: jnp.ndarray,
                  valid: jnp.ndarray, n_out: jnp.ndarray, out_cap: int,
                  ilp: int = 8):
    """rank_gather_fields + fused mod-collapse: emits per-position
    (src, lit) ready for ops/pallas_expand.resolve_packed — literals
    and padding are fixpoints ``src[p] == p``, matches point at the
    PRE-TOKEN source ``(p - start) % d + start - d``.  ``n_out`` (B,)
    masks positions past each member's true output length."""
    return _rank_call(starts, pk, valid, n_out, out_cap, ilp, "src")


def _rank_call(starts, pk, valid, n_out, out_cap, ilp, emit):
    bsz, t = starts.shape
    assert out_cap % 1024 == 0
    big = jnp.int32(out_cap + 2)
    st = jnp.where(valid, starts, big)

    # coarse ranks at every 128-position boundary.  The bucket id
    # factors as hi * 16 + lo, so the T x nb one-hot compare sweep
    # (the decode chain's largest XLA term, ~1 ms / 8 MiB) becomes
    # T x (nb/16 + 16) compares whose outer product is contracted on
    # the MXU: cnt[hi, lo] = sum_t oh_hi[t, hi] * oh_lo[t, lo].
    # bf16 one-hots are exact (0/1) and counts accumulate in f32
    # (T <= ~32 Ki << 2^24), so the int32 round-trip is lossless.
    nb = out_cap // 128
    glo = 16
    nhi = -(-nb // glo)
    sbk = jnp.where(valid, starts >> 7, nhi * glo)  # sentinel: hi == nhi
    oh_hi = ((sbk >> 4)[:, :, None]
             == jnp.arange(nhi, dtype=jnp.int32)[None, None, :]
             ).astype(jnp.bfloat16)
    oh_lo = ((sbk & (glo - 1))[:, :, None]
             == jnp.arange(glo, dtype=jnp.int32)[None, None, :]
             ).astype(jnp.bfloat16)
    cnt = jnp.einsum("bth,btl->bhl", oh_hi, oh_lo,
                     preferred_element_type=jnp.float32)
    cnt = cnt.reshape(bsz, nhi * glo)[:, :nb].astype(jnp.int32)
    cex = jnp.cumsum(cnt, axis=1) - cnt           # starts before bucket

    # token tables padded so every window [lo, lo+16) is in range
    n_vregs = out_cap // 1024
    rows_t = -(-t // LANES) + WIN + SUB
    pad = rows_t * LANES - t
    st_tab = jnp.pad(st, ((0, 0), (0, pad)), constant_values=out_cap + 2)
    pk_tab = jnp.pad(pk.astype(jnp.int32), ((0, 0), (0, pad)))

    # 8-aligned window base per out-vreg: covers token ids
    # [cex[8v] - 1, cex[8v] + 1023 + 127] (<= 1024 starts per vreg)
    lo = jnp.clip((jnp.maximum(cex[:, ::SUB] - 1, 0) >> 10) << 3,
                  0, rows_t - WIN).astype(jnp.int32)

    spec_t = pl.BlockSpec((1, rows_t, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, out_cap // LANES, LANES),
                          lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    # per-program SMEM blocks: 3-D shapes whose last two dims equal the
    # array dims keep Mosaic's block rules AND the 1 MiB SMEM budget
    spec_cex = pl.BlockSpec((1, nb, 1), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    spec_lo = pl.BlockSpec((1, n_vregs, 1), lambda b: (b, 0, 0),
                           memory_space=pltpu.SMEM)

    kern = functools.partial(_rank_kernel, n_vregs=n_vregs, ilp=ilp,
                             emit=emit, out_cap=out_cap)

    shape = jax.ShapeDtypeStruct((bsz, out_cap // LANES, LANES),
                                 jnp.int32)
    if emit == "fields":
        def kfn(cex_r, lo_r, st_r, pk_r, os_r, op_r):
            kern(cex_r, lo_r, st_r.at[0], pk_r.at[0], os_r.at[0],
                 op_r.at[0])

        ins = [cex.reshape(bsz, nb, 1), lo.reshape(bsz, n_vregs, 1),
               st_tab.reshape(bsz, rows_t, LANES),
               pk_tab.reshape(bsz, rows_t, LANES)]
        in_specs = [spec_cex, spec_lo, spec_t, spec_t]
    else:
        spec_no = pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.SMEM)

        def kfn(cex_r, lo_r, no_r, st_r, pk_r, os_r, op_r):
            kern(cex_r, lo_r, st_r.at[0], pk_r.at[0], os_r.at[0],
                 op_r.at[0], nout_ref=no_r)

        ins = [cex.reshape(bsz, nb, 1), lo.reshape(bsz, n_vregs, 1),
               n_out.astype(jnp.int32).reshape(bsz, 1, 1),
               st_tab.reshape(bsz, rows_t, LANES),
               pk_tab.reshape(bsz, rows_t, LANES)]
        in_specs = [spec_cex, spec_lo, spec_no, spec_t, spec_t]
    o_s, o_p = pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=in_specs,
        out_specs=[spec_o, spec_o],
        out_shape=[shape, shape],
        interpret=_interp(),
    )(*ins)
    return (o_s.reshape(bsz, out_cap), o_p.reshape(bsz, out_cap))
