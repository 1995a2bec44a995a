#!/usr/bin/env python
"""Virtual-mesh weak/strong-scaling overhead of the sharded codec.

BASELINE.md's third bar is ">=85% linear to 2 hosts"; real multi-chip
hardware is not available in this container, so this bounds the
COLLECTIVE/SERIAL fraction on an N-virtual-device CPU mesh instead:
fixed total bytes, the flagship shared-table sync encode (histogram
all-reduce across shards + package-merge replicated) and the
chunk-parallel sync decode, timed at mesh sizes 1/2/4/8.

CPU-mesh caveat: all "devices" share the same 4 cores, so absolute
times cannot show speedup — what this DOES measure is the extra work
a bigger mesh adds (collective ops, replicated table builds, sharding
glue).  If t(N) stays ~flat vs t(1) while per-device data shrinks N x,
the collective fraction is bounded by the observed inflation.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/scaling_mesh.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np


def main():
    import hashlib
    import jax
    jax.config.update("jax_platforms", "cpu")
    # CPU-feature-keyed cache dir (NOT the TPU .jax_cache): AOT CPU
    # executables from another physical host SIGILL on load — see
    # tests/conftest.py
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/repo/.jax_cache_cpu-"
        + hashlib.sha256(flags.encode()).hexdigest()[:8])
    import bench
    from libflate_tpu.parallel.mesh import make_mesh
    from libflate_tpu.parallel.sharding import (decode_sync_sharded,
                                                encode_sync_sharded)

    total_mb = float(os.environ.get("SCALE_MB", "2"))
    bsz = 32                                  # members, fixed total
    n = int(total_mb * (1 << 20)) // bsz
    data = bench.make_corpus(max(1, int(total_mb + 1)))
    blocks = np.frombuffer(data[:bsz * n], np.uint8).reshape(bsz, n)
    n_valid = np.full((bsz,), n, np.int32)
    bfinal = np.ones((bsz,), np.int32)
    K = 64

    print(f"fixed total {bsz}x{n} bytes, K={K}")
    rows = []
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        # warm (compile)
        words, bits, cnt, offs = encode_sync_sharded(
            blocks, n_valid, bfinal, K, mesh)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            words, bits, cnt, offs = encode_sync_sharded(
                blocks, n_valid, bfinal, K, mesh)
        t_enc = (time.perf_counter() - t0) / reps

        # chunk table for the sharded sync decode (host, excluded)
        from libflate_tpu.ops.deflate_encode import splice_blocks_host
        from libflate_tpu.serial.bitio import BitReader
        from libflate_tpu.serial.deflate import (
            read_dynamic_header_lengths)
        lit_l = np.zeros((1, 286), np.int32)
        dist_l = np.zeros((1, 30), np.int32)
        max_nc = max(1, int(-(-cnt.max() // K)))
        c_n = bsz * max_nc
        ch_bits = np.zeros((c_n,), np.int32)
        ch_cnts = np.zeros((c_n,), np.int32)
        bodies = []
        for i in range(bsz):
            body = splice_blocks_host(words[i:i + 1], bits[i:i + 1])
            r = BitReader(body)
            r.read_bits(3)
            ll, dl = read_dynamic_header_lengths(r)
            if i == 0:
                lit_l[0], dist_l[0] = ll, dl
            bodies.append(np.frombuffer(
                body + b"\x00" * ((-len(body)) % 4),
                np.uint8).view("<u4"))
        w_max = max(len(a) for a in bodies) + 64
        dec_words = np.zeros((bsz, w_max), np.uint32)
        for i, arr in enumerate(bodies):
            dec_words[i, :len(arr)] = arr
            for j in range(max_nc):
                ch_bits[i * max_nc + j] = offs[i, min(
                    j, offs.shape[1] - 1)]
                ch_cnts[i * max_nc + j] = min(
                    max(int(cnt[i]) - j * K, 0), K)
        ch_words = np.repeat(dec_words, max_nc, axis=0)
        pad = (-c_n) % nd
        if pad:
            ch_words = np.pad(ch_words, ((0, pad), (0, 0)))
            ch_bits2 = np.pad(ch_bits, (0, pad))
            ch_cnts2 = np.pad(ch_cnts, (0, pad))
        else:
            ch_bits2, ch_cnts2 = ch_bits, ch_cnts
        decode_sync_sharded(ch_words, ch_bits2, ch_cnts2, lit_l,
                            dist_l, K, mesh)
        t0 = time.perf_counter()
        for _ in range(reps):
            toks = decode_sync_sharded(ch_words, ch_bits2, ch_cnts2,
                                       lit_l, dist_l, K, mesh)
        t_dec = (time.perf_counter() - t0) / reps
        rows.append((nd, t_enc, t_dec))
        print(f"  mesh={nd}: encode {t_enc * 1000:8.1f} ms   "
              f"sync-decode {t_dec * 1000:8.1f} ms", flush=True)

    e1, d1 = rows[0][1], rows[0][2]
    for nd, te, td in rows[1:]:
        print(f"  mesh={nd}: encode inflation {te / e1:5.2f}x, decode "
              f"inflation {td / d1:5.2f}x vs 1-device (same total "
              f"bytes; shared 4-core host)")
    print("collective/serial fraction bound: the histogram all-reduce "
          "+ replicated package-merge + sharding glue account for at "
          "most (inflation - 1) of the 1-device time at each mesh "
          "size.")


if __name__ == "__main__":
    main()
