#!/usr/bin/env python
"""Stage breakdown of the device encode kernel chain (8 MiB default).

Stages: hash candidates | +LCP lengths | +parse | +fields | +pack |
+stitch (the full _encode_batch_sync_cols chain the bench measures).
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
CHAIN = int(os.environ.get("PROF_CHAIN", "1"))


def main():
    from libflate_tpu.ops import pipeline as pp
    from libflate_tpu.ops.pallas_lz77 import prefix_candidates_pallas
    from libflate_tpu.ops.pallas_sync_decode import SYNC_TOKENS

    data = corpus(MB)
    n = 8 << 20
    blocks = jax.device_put(jnp.asarray(
        np.frombuffer(data[:n], np.uint8).reshape(128, 65536)))
    nv = jax.device_put(jnp.full((128,), 65536, jnp.int32))
    bf = jax.device_put(jnp.ones((128,), jnp.int32))

    # full chain (what the bench slope-times) ---------------------------
    cols, small = pp._encode_batch_sync_cols(blocks, nv, bf, SYNC_TOKENS,
                                             chain=CHAIN)
    small_np = np.asarray(small)
    n_ch = cols.shape[1]
    starts = small_np[:, -(n_ch + 1):].astype(np.int64)
    word0 = starts[:, :n_ch] >> 5
    nw = int(np.max(np.maximum(
        (starts[:, 1:] + 31) // 32 - word0, 0), initial=1))
    nw = min(-(-max(nw, 1) // 16) * 16, cols.shape[2])
    w_out = int(small_np[:, 0].max(initial=1) + 31) // 32 + 1
    w_out = -(-w_out // 2048) * 2048
    word0_d = jax.device_put(jnp.asarray(word0.astype(np.int32)))
    from libflate_tpu.ops.pallas_stitch import stitch_cols_pallas

    def full():
        c, s = pp._encode_batch_sync_cols(blocks, nv, bf, SYNC_TOKENS,
                                          chain=CHAIN)
        return stitch_cols_pallas(c[:, :, :nw], word0_d, w_out)

    # stages ------------------------------------------------------------
    def hash_only():
        return prefix_candidates_pallas(blocks)

    def sort_only():
        from libflate_tpu.ops.sort_match import sort_candidates
        return sort_candidates(blocks)[0]

    import jax.numpy as _jnp
    from libflate_tpu.ops.pallas_sort import sort_keys, sort_pairs
    key0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(-2**31, 2**31, (128, 65536),
                                          dtype=np.int64).astype(np.int32)))
    pos0 = jax.device_put(jnp.broadcast_to(
        jnp.arange(65536, dtype=jnp.int32)[None], (128, 65536)))

    def sort1():
        return sort_pairs(key0, pos0, tiebreak=True)[0]

    def sort1_nt():
        return sort_pairs(key0, pos0)[0]

    def sort2():
        return sort_keys(key0)

    cand = sort_only()
    sync_read(cand)
    cand = jax.device_put(np.asarray(cand))

    def lengths():
        return pp._lengths_stage(blocks, nv, cand, True, True, 32768,
                                 CHAIN)[1]

    from libflate_tpu.ops.sort_match import sort_candidates as _sc
    _c4, _m4 = _sc(blocks)
    sync_read(_m4)
    _c4 = jax.device_put(np.asarray(_c4))
    _m4 = jax.device_put(np.asarray(_m4))

    def lengths_m4():
        from libflate_tpu.ops.sort_match import M_EXACT
        return pp._lengths_stage(blocks, nv, _c4, True, True, 32768,
                                 CHAIN, _m4, M_EXACT)[1]

    @jax.jit
    def parse(cand2, lengths2):
        from libflate_tpu.ops.pallas_parse import parse_tokens_pallas
        return parse_tokens_pallas(blocks, nv, cand2, lengths2, 384)[0]

    cand2, lengths2 = pp._lengths_stage(blocks, nv, cand, True, True,
                                        32768, CHAIN)
    sync_read(lengths2)
    cand2 = jax.device_put(np.asarray(cand2))
    lengths2 = jax.device_put(np.asarray(lengths2))

    def tok():
        return pp._tokenize_padded(blocks, nv, chain=CHAIN)[0]

    a, b, valid, cnt, _ovf = pp._tokenize_padded(blocks, nv, chain=CHAIN)
    for x in (a, b, valid, cnt):
        sync_read(x)
    a = jax.device_put(np.asarray(a))
    b = jax.device_put(np.asarray(b))
    valid = jax.device_put(np.asarray(valid))
    cnt = jax.device_put(np.asarray(cnt))

    def fields():
        return pp._fields_batch_shared(a, b, cnt, bf, valid=valid)[0]

    vals, widths = pp._fields_batch_shared(a, b, cnt, bf, valid=valid)
    sync_read(widths)
    vals = jax.device_put(np.asarray(vals))
    widths = jax.device_put(np.asarray(widths))

    def pack():
        return pp._pack_chunks_device(vals, widths)[0]

    nb = len(data)
    stages = {
        "full_chain": full,
        "hash_cand": hash_only,
        "sort_cand": sort_only,
        "sort1(pairs+tb)": sort1,
        "sort1(pairs)": sort1_nt,
        "sort2(keys)": sort2,
        "lcp_lengths": lengths,
        "lcp_m4": lengths_m4,
        "parse": lambda: parse(cand2, lengths2),
        "tokenize(h+l+p)": tok,
        "fields": fields,
        "pack": pack,
    }
    for name, fn in stages.items():
        ms = slope_ms(fn, n=6)
        print(f"  {name:18s} {ms:8.2f} ms  "
              f"({nb/1e9/(ms/1000):6.3f} GB/s)", flush=True)

    if os.environ.get("PROF_RATIO", "1") == "1":
        from libflate_tpu.formats import pgzf
        stream = pgzf.compress(data, member_size=64 * 1024,
                               engine="tpu")
        back = pgzf.decompress(stream, engine="native")
        assert back == data, "round-trip mismatch"
        print(f"  ratio {len(stream)/len(data):.4f} (round-trip ok)",
              flush=True)


if __name__ == "__main__":
    main()
