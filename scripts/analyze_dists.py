#!/usr/bin/env python
"""Offline analysis of LZ77 source-pointer structure on the bench corpus.

Questions this answers (drives the resolve-kernel far-sweep redesign):
- per 1024-position sub-block: how many distinct 4 KiB history groups do
  the direct-far sources hit (the sweep's real work), vs the [min,max]
  band the kernel currently scans?
- how much of the far mass would a larger in-register superblock absorb?
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    mb = int(os.environ.get("PROF_MB", "4"))
    data = bench.make_corpus(mb)
    from libflate_tpu import native
    member = 64 * 1024
    n_members = len(data) // member

    # tokens from the device-equivalent encoder class (lazy single-slot)
    stats = {"sub_blocks": 0, "far_pos": 0, "pos": 0,
             "band_groups": 0, "hit_groups": 0, "sib_hits_4k": 0,
             "far_16k": 0, "hit_groups_16k": 0, "band_rows512": 0,
             "hit_rows512": 0}
    from libflate_tpu.serial.deflate import EncodeOptions
    from libflate_tpu.formats import pgzf
    stream = pgzf.compress(data, member_size=member, engine="native")
    # decode back to tokens via native inflate token dump? Simpler:
    # re-tokenize with the serial-parity path on a few members only.
    from libflate_tpu.serial.lz77 import greedy_tokens

    rng = np.random.default_rng(0)
    take = min(n_members, 16)
    for mi in rng.choice(n_members, take, replace=False):
        chunk = data[mi * member:(mi + 1) * member]
        toks = greedy_tokens(chunk)
        # build per-position src (mod-collapse), as device_expand does
        n = len(chunk)
        src = np.arange(n, dtype=np.int64)
        pos = 0
        for a, d in toks:
            if d == 0:
                pos += 1
            else:
                ln = a
                p = np.arange(pos, pos + ln)
                src[pos:pos + ln] = (p - pos) % d + pos - d
                pos += ln
        assert pos == n
        for s0 in range(0, n, 1024):
            sub = src[s0:s0 + 1024]
            sb = s0 // 4096
            far = sub[(sub >> 12) < sb]
            stats["sub_blocks"] += 1
            stats["pos"] += 1024
            stats["far_pos"] += len(far)
            if len(far):
                g = np.unique(far >> 12)
                stats["band_groups"] += int(g.max() - g.min() + 1)
                stats["hit_groups"] += len(g)
                r = np.unique(far >> 9)
                stats["band_rows512"] += int(r.max() - r.min() + 1)
                stats["hit_rows512"] += len(r)
            # 16 KiB superblock variant
            sb16 = s0 // 16384
            far16 = sub[(sub >> 14) < sb16]
            stats["far_16k"] += len(far16)
            if len(far16):
                g = np.unique(far16 >> 12)
                stats["hit_groups_16k"] += len(g)
            # sibling 1-KiB blocks hit within same 4 KiB superblock
            insb = sub[((sub >> 12) == sb) & (sub < s0)]
            if len(insb):
                stats["sib_hits_4k"] += len(np.unique(insb >> 10))

    sb_n = stats["sub_blocks"]
    print(f"members sampled: {take}, sub-blocks: {sb_n}")
    print(f"far positions: {stats['far_pos']/stats['pos']:.3f} of all")
    print(f"band groups (4KiB) per sub-block: "
          f"{stats['band_groups']/sb_n:.2f} scanned vs "
          f"{stats['hit_groups']/sb_n:.2f} actually hit")
    print(f"512B rows: band {stats['band_rows512']/sb_n:.2f} vs hit "
          f"{stats['hit_rows512']/sb_n:.2f}")
    print(f"16KiB-super: far positions {stats['far_16k']/stats['pos']:.3f}"
          f" of all; hit 4KiB groups/sub-block "
          f"{stats['hit_groups_16k']/sb_n:.2f}")
    print(f"sibling 1KiB blocks hit per sub-block (4KiB super): "
          f"{stats['sib_hits_4k']/sb_n:.2f}")


if __name__ == "__main__":
    main()
