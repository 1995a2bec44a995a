#!/usr/bin/env python
"""Ablate the rank kernel's internals on synthetic token data."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from _prof import setup_jax, slope_ms, sync_read  # noqa: E402

jax = setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from libflate_tpu.ops.pallas_rank import (  # noqa: E402
    LANES, SUB, WIN, _sel16)


def make_kernel(ablate):
    def _rank_kernel(cex_ref, lo_ref, st_ref, pk_ref, os_ref, op_ref, *,
                     n_vregs: int):
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 1)
        zeros = jnp.zeros((SUB, LANES), jnp.int32)

        def vreg(v, _):
            lo = lo_ref[0, v, 0]
            w0 = st_ref[pl.ds(lo, SUB), :]
            w1 = st_ref[pl.ds(lo + SUB, SUB), :]
            p0 = pk_ref[pl.ds(lo, SUB), :]
            p1 = pk_ref[pl.ds(lo + SUB, SUB), :]

            cexv = zeros
            if "cex" not in ablate:
                for j in range(SUB):
                    cexv = jnp.where(iota_s == j,
                                     cex_ref[0, v * SUB + j, 0], cexv)
            offs = cexv - lo * LANES

            if "swin" not in ablate:
                flat = offs + iota_l
                ra = offs >> 7
                rowa = _sel16(w0, w1, ra)
                rowb = _sel16(w0, w1, ra + 1)
                lane = flat & (LANES - 1)
                s_win = jnp.where((flat >> 7) == ra,
                                  jnp.take_along_axis(rowa, lane, axis=1),
                                  jnp.take_along_axis(rowb, lane, axis=1))
            else:
                s_win = w0

            p = v * 1024 + iota_s * LANES + iota_l
            fine = zeros
            if "search" not in ablate:
                for step in (128, 64, 32, 16, 8, 4, 2, 1):
                    cand = fine + step
                    sval = jnp.take_along_axis(
                        s_win, jnp.clip(cand - 1, 0, LANES - 1), axis=1)
                    fine = jnp.where((cand <= LANES) & (sval <= p), cand,
                                     fine)

            li = offs - 1 + fine
            if "fields" not in ablate:
                lmin = jnp.take_along_axis(li, zeros, axis=1)
                qa = lmin >> 7
                sh = li & (LANES - 1)
                in_a = (li >> 7) == qa
                sa = _sel16(w0, w1, qa)
                sb = _sel16(w0, w1, qa + 1)
                pa = _sel16(p0, p1, qa)
                pb = _sel16(p0, p1, qa + 1)
                os_ref[pl.ds(v * SUB, SUB), :] = jnp.where(
                    in_a, jnp.take_along_axis(sa, sh, axis=1),
                    jnp.take_along_axis(sb, sh, axis=1))
                op_ref[pl.ds(v * SUB, SUB), :] = jnp.where(
                    in_a, jnp.take_along_axis(pa, sh, axis=1),
                    jnp.take_along_axis(pb, sh, axis=1))
            else:
                os_ref[pl.ds(v * SUB, SUB), :] = s_win
                op_ref[pl.ds(v * SUB, SUB), :] = fine + li
            return 0

        jax.lax.fori_loop(0, n_vregs, vreg, 0)

    return _rank_kernel


@functools.partial(jax.jit, static_argnames=("out_cap", "ablate"))
def run(cex, lo, st_tab, pk_tab, out_cap, ablate=()):
    bsz, rows_t, _ = st_tab.shape
    nb = cex.shape[1]
    n_vregs = out_cap // 1024
    spec_t = pl.BlockSpec((1, rows_t, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, out_cap // LANES, LANES),
                          lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_cex = pl.BlockSpec((1, nb, 1), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    spec_lo = pl.BlockSpec((1, n_vregs, 1), lambda b: (b, 0, 0),
                           memory_space=pltpu.SMEM)
    kern = functools.partial(make_kernel(ablate), n_vregs=n_vregs)

    def kfn(cex_r, lo_r, st_r, pk_r, os_r, op_r):
        kern(cex_r, lo_r, st_r.at[0], pk_r.at[0], os_r.at[0],
             op_r.at[0])

    shape = jax.ShapeDtypeStruct((bsz, out_cap // LANES, LANES),
                                 jnp.int32)
    return pl.pallas_call(
        kfn, grid=(bsz,),
        in_specs=[spec_cex, spec_lo, spec_t, spec_t],
        out_specs=[spec_o, spec_o],
        out_shape=[shape, shape],
    )(cex, lo, st_tab, pk_tab)[0]


def main():
    bsz, out_cap = 128, 65536
    t = 6656
    rng = np.random.default_rng(0)
    # synthetic monotone starts, ~4 bytes/token
    lens = rng.integers(1, 9, (bsz, t))
    ends = np.cumsum(lens, 1)
    starts = (ends - lens).clip(0, out_cap - 1).astype(np.int32)
    nb = out_cap // 128
    cex = np.zeros((bsz, nb), np.int32)
    for b in range(4):          # cex only needs plausible values
        cex[b] = np.searchsorted(starts[b], np.arange(nb) * 128)
    cex[4:] = cex[:4].repeat(31, 0)
    rows_t = -(-t // LANES) + WIN + SUB
    pad = rows_t * LANES - t
    st_tab = np.pad(starts, ((0, 0), (0, pad)),
                    constant_values=out_cap + 2)
    pk_tab = st_tab.copy()
    lo = ((np.maximum(cex[:, ::SUB] - 1, 0) >> 10) << 3).clip(
        0, rows_t - WIN).astype(np.int32)

    cex_d = jax.device_put(jnp.asarray(cex.reshape(bsz, nb, 1)))
    lo_d = jax.device_put(jnp.asarray(lo.reshape(bsz, -1, 1)))
    st_d = jax.device_put(jnp.asarray(st_tab.reshape(bsz, rows_t, LANES)))
    pk_d = jax.device_put(jnp.asarray(pk_tab.reshape(bsz, rows_t, LANES)))

    nbytes = bsz * out_cap
    for ab in [(), ("search",), ("swin", "search"), ("fields",),
               ("search", "fields"), ("swin", "search", "fields"),
               ("cex", "swin", "search", "fields")]:
        fn = lambda ab=ab: run(cex_d, lo_d, st_d, pk_d, out_cap, ab)
        ms = slope_ms(fn, n=8)
        print(f"  ablate={','.join(ab) or 'none':28s} {ms:7.2f} ms "
              f"({nbytes/1e9/(ms/1000):5.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
