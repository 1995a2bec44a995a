#!/usr/bin/env python
"""Fine-grained decode-chain profiling: rank-kernel vs its XLA prep,
resolve far modes (list vs band vs skip), far_rowlists cost."""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from _prof import corpus, setup_jax, slope_ms, sync_read  # noqa: E402

jax = setup_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

MB = int(os.environ.get("PROF_MB", "8"))


def main():
    from libflate_tpu.formats import pgzf
    data = corpus(MB)
    stream = pgzf.compress(data, member_size=64 * 1024, engine="tpu")
    prep = pgzf._prepare_sync_device(stream)[0]
    from libflate_tpu.ops import pallas_sync_decode as psd
    out = psd.sync_decode(prep["staged"], prep["sb"], prep["counts"],
                          prep["lit_t"], prep["dist_t"], prep["k_tok"],
                          root_bits=prep["root_bits"])
    p_, bsz, max_nc = prep["p"], prep["bsz"], prep["max_nc"]
    k_tok, member_cap = prep["k_tok"], prep["member_cap"]
    n_tokens = prep["n_tokens"]
    toks = out.reshape(p_, k_tok, psd.SUBLANES, psd.LANES)
    toks = toks.transpose(0, 2, 3, 1).reshape(p_ * psd.SLOTS, k_tok)
    packed = jax.device_put(
        np.asarray(toks[:bsz * max_nc].reshape(bsz, max_nc * k_tok)))
    nb = len(data)

    @functools.partial(jax.jit, static_argnums=(2,))
    def prep_xla(packed, n_tokens, out_cap):
        t = packed.shape[1]
        a = packed & 511
        b = (packed >> 9) & 0xFFFF
        tidx = jnp.arange(t, dtype=jnp.int32)
        valid = tidx[None, :] < n_tokens[:, None]
        is_match = valid & (b > 0)
        lens = jnp.where(valid, jnp.where(is_match, a, 1), 0)
        ends = jnp.cumsum(lens, axis=1)
        starts = ends - lens
        pk = jnp.where(valid, jnp.where(is_match, packed, a), 0)
        return jnp.minimum(starts, out_cap - 1), pk, valid

    @functools.partial(jax.jit, static_argnums=(2,))
    def coarse_xla(packed, n_tokens, out_cap):
        starts, pk, valid = prep_xla(packed, n_tokens, out_cap)
        bsz = starts.shape[0]
        nb_ = out_cap // 128
        sbk = jnp.where(valid, starts >> 7, nb_)
        cnt = jnp.zeros((bsz, nb_), jnp.int32)
        tile = min(128, nb_)
        for r0 in range(0, nb_, tile):
            r = jnp.arange(r0, r0 + tile, dtype=jnp.int32)
            oh = (sbk[:, :, None] == r[None, None, :]).astype(jnp.int32)
            cnt = jax.lax.dynamic_update_slice(
                cnt, jnp.sum(oh, axis=1), (0, r0))
        return jnp.cumsum(cnt, axis=1) - cnt

    @functools.partial(jax.jit, static_argnums=(2,))
    def rank_full(packed, n_tokens, out_cap):
        from libflate_tpu.ops.pallas_rank import rank_gather_fields
        starts, pk, valid = prep_xla(packed, n_tokens, out_cap)
        return rank_gather_fields(starts, pk, valid, out_cap)[0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def srcs(packed, n_tokens, out_cap):
        from libflate_tpu.ops.pallas_rank import rank_gather_fields
        starts, pk, valid = prep_xla(packed, n_tokens, out_cap)
        tok_start, tok_pk = rank_gather_fields(starts, pk, valid,
                                               out_cap)
        tok_d = (tok_pk >> 9) & 0xFFFF
        tok_a = tok_pk & 511
        pos = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
        is_lit = tok_d == 0
        rel = pos - tok_start
        src = jnp.where(is_lit, pos,
                        rel % jnp.maximum(tok_d, 1) + tok_start - tok_d)
        src = jnp.clip(src, 0, out_cap - 1)
        lit = jnp.where(is_lit, tok_a & 255, 0)
        return src, lit

    src, lit = srcs(packed, n_tokens, member_cap)
    sync_read(src)
    src = jax.device_put(np.asarray(src))
    lit = jax.device_put(np.asarray(lit))

    from libflate_tpu.ops.pallas_expand import far_rowlists, resolve_packed

    rowlists_jit = jax.jit(far_rowlists)

    stages = {
        "xla_prep(starts)": lambda: prep_xla(packed, n_tokens,
                                             member_cap)[0],
        "xla_coarse(cex)": lambda: coarse_xla(packed, n_tokens,
                                              member_cap),
        "rank_kernel_full": lambda: rank_full(packed, n_tokens,
                                              member_cap),
        "far_rowlists": lambda: rowlists_jit(src)[1],
        "resolve[list]": lambda: resolve_packed(src, lit),
        "resolve[band]": lambda: resolve_packed(src, lit,
                                                far_mode="band"),
        "resolve[nofar]": lambda: resolve_packed(src, lit,
                                                 skip=("far",)),
    }
    for name, fn in stages.items():
        ms = slope_ms(fn, n=8)
        print(f"  {name:18s} {ms:8.2f} ms  "
              f"({nb/1e9/(ms/1000):6.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
