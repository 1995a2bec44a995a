#!/usr/bin/env python
"""Stage breakdown of the FULL device decode chain (8 MiB default).

Reproduces / extends the docs/ROADMAP.md round-3 table:
sync kernel | reorder | token_id rank | field gathers | resolve | CRC.

Run on the real TPU (plain python; one process at a time).
"""
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
    print(f"[prof] {MB} MiB corpus; device encode (warm-up may compile)",
          flush=True)
    stream = pgzf.compress(data, member_size=64 * 1024, engine="tpu")
    print(f"[prof] ratio {len(stream)/len(data):.4f}", flush=True)
    groups = pgzf._prepare_sync_device(stream)
    assert len(groups) == 1, [g["bsz"] for g in groups]
    prep = groups[0]

    # correctness gate first
    plain, n_out, err, crc_f = pgzf._run_sync_chain(prep)
    assert not bool(np.asarray(err).any())
    from libflate_tpu.ops.checksum import crc32_from_padded_f
    crcs = crc32_from_padded_f(np.asarray(crc_f), prep["isizes"],
                               prep["member_cap"])
    assert (crcs == prep["crcs_expected"]).all(), "CRC mismatch"
    print("[prof] chain bit-exact", flush=True)

    from libflate_tpu.ops import pallas_sync_decode as psd

    def sync_only():
        return psd.sync_decode(prep["staged"], prep["sb"], prep["counts"],
                               prep["lit_t"], prep["dist_t"],
                               prep["k_tok"], root_bits=prep["root_bits"])

    def chain():
        return pgzf._run_sync_chain(prep)[3]

    p_, bsz, max_nc = prep["p"], prep["bsz"], prep["max_nc"]
    k_tok, member_cap = prep["k_tok"], prep["member_cap"]
    n_tokens = prep["n_tokens"]
    out = sync_only()
    sync_read(out)

    # --- partial chains (jitted once each) ---------------------------
    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
    def upto_packed(out, n_tokens, p_, bsz, max_nc, k_tok, member_cap):
        toks = out.reshape(p_, k_tok, psd.SUBLANES, psd.LANES)
        toks = toks.transpose(0, 2, 3, 1).reshape(p_ * psd.SLOTS, k_tok)
        return toks[:bsz * max_nc].reshape(bsz, max_nc * k_tok)

    @functools.partial(jax.jit, static_argnums=(2,))
    def upto_gather(packed, n_tokens, out_cap):
        from libflate_tpu.ops.pallas_rank import rank_gather_fields
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
        tok_start, tok_pk = rank_gather_fields(
            jnp.minimum(starts, out_cap - 1), pk, valid, out_cap)
        return tok_start, tok_pk

    @functools.partial(jax.jit, static_argnums=(2,))
    def full_expand(packed, n_tokens, out_cap):
        from libflate_tpu.ops.device_expand import expand_members
        return expand_members(packed, n_tokens, out_cap)[0]

    packed = upto_packed(out, n_tokens, p_, bsz, max_nc, k_tok,
                         member_cap)
    sync_read(packed)
    packed = jax.device_put(np.asarray(packed))

    stages = {
        "sync_kernel": sync_only,
        "full_chain": chain,
        "reorder(packed)": lambda: upto_packed(
            out, n_tokens, p_, bsz, max_nc, k_tok, member_cap),
        "rank+gather": lambda: upto_gather(packed, n_tokens,
                                           member_cap)[0],
        "expand_members": lambda: full_expand(packed, n_tokens,
                                              member_cap),
    }
    nb = len(data)
    for name, fn in stages.items():
        ms = slope_ms(fn, n=8)
        print(f"  {name:18s} {ms:8.2f} ms  "
              f"({nb/1e9/(ms/1000):6.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
