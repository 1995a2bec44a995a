"""Sharded (multi-chip) encode/decode over a jax.sharding.Mesh.

The codec pipelines in libflate_tpu.ops are written block-elementwise
over the leading batch axis, so multi-chip execution is pure data
parallelism: annotate the block axis with a NamedSharding and jit — XLA
partitions every stage (sort, scan, scatter, matmul) per shard with no
cross-device traffic except the host-edge gather.  Checksums fold
across shards with the exact CRC-combine operator (log-depth, ICI-sized
payloads of 4 bytes per shard).

This is the TPU-native replacement for what a CPU library would do with
threads — the reference has no parallel path at all (SURVEY.md §2.3).

Example (8 virtual devices work too — set
``XLA_FLAGS=--xla_force_host_platform_device_count=8``)::

    from libflate_tpu.parallel.mesh import make_mesh
    from libflate_tpu.parallel.sharding import (encode_sync_sharded,
                                                shard_crc32)

    mesh = make_mesh(8)                    # 1-D "blocks" axis
    blocks = corpus.reshape(64, 65536)     # 64 members, 8 per device
    words, bits, counts, offsets = encode_sync_sharded(
        blocks, n_valid, bfinal, k=256, mesh=mesh)
    whole = combine_shard_crcs(per_shard_crcs, shard_lengths)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deflate_decode import (decode_symbols, expand_tokens_device,
                                  tables_from_lengths)
from ..ops.pipeline import _encode_batch
from ..utils.checksum import crc32_combine
from .mesh import block_sharding, make_mesh


@functools.lru_cache(maxsize=8)
def _sharded_encode_fn(mesh_key, block_type: str):
    mesh = mesh_key
    sh = block_sharding(mesh)
    return jax.jit(
        functools.partial(_encode_batch, block_type=block_type),
        in_shardings=(sh, sh, sh),
        out_shardings=(sh, sh),
    )


def encode_blocks_sharded(blocks: np.ndarray, n_valid: np.ndarray,
                          bfinal: np.ndarray, mesh=None,
                          block_type: str = "dynamic"):
    """Data-parallel block encode across the mesh.

    blocks: (B, n) uint8 — B must be a multiple of the mesh size.
    Returns host numpy (words (B, W), bits (B,)).
    """
    mesh = mesh or make_mesh()
    fn = _sharded_encode_fn(mesh, block_type)
    sh = block_sharding(mesh)
    blocks_d = jax.device_put(jnp.asarray(blocks), sh)
    nv_d = jax.device_put(jnp.asarray(n_valid), sh)
    bf_d = jax.device_put(jnp.asarray(bfinal), sh)
    words, bits = fn(blocks_d, nv_d, bf_d)
    return np.asarray(words), np.asarray(bits)


def decode_members_sharded(words: np.ndarray, starts: np.ndarray,
                           lit_lengths: np.ndarray,
                           dist_lengths: np.ndarray,
                           out_cap: int, mesh=None):
    """Data-parallel member decode across the mesh.

    All inputs batched on the leading (member) axis, B divisible by the
    mesh size.  Returns (out (B, out_cap) uint8, n_out (B,), err (B,)).
    """
    mesh = mesh or make_mesh()
    sh = block_sharding(mesh)

    @functools.partial(jax.jit,
                       in_shardings=(sh, sh, sh, sh),
                       out_shardings=(sh, sh, sh),
                       static_argnums=(4,))
    def _run(w, s, ll, dl, cap):
        lit_t, dist_t = tables_from_lengths(ll, dl)
        a, b, nt, _end, err = decode_symbols(w, s, lit_t, dist_t, cap + 2)
        out, n_out, xerr = expand_tokens_device(a, b, nt, cap)
        return out, n_out, err | xerr

    out, n_out, err = _run(
        jax.device_put(jnp.asarray(words), sh),
        jax.device_put(jnp.asarray(starts), sh),
        jax.device_put(jnp.asarray(lit_lengths), sh),
        jax.device_put(jnp.asarray(dist_lengths), sh),
        out_cap)
    return np.asarray(out), np.asarray(n_out), np.asarray(err)


def encode_sync_sharded(blocks: np.ndarray, n_valid: np.ndarray,
                        bfinal: np.ndarray, k: int, mesh=None):
    """Flagship path, mesh-sharded: shared-table sync encode.

    The PGZF production pipeline's XLA twin — batch-global histograms
    (the per-shard sums cross shard boundaries, so XLA inserts
    all-reduce collectives over the mesh axis), one shared Huffman
    header per member, and the per-member sync offsets (the "LS" index
    the sync decode kernel consumes).

    Returns host numpy (words (B, W) uint32, bits (B,), n_tokens (B,),
    offsets (B, S) int32).
    """
    from ..ops.pipeline import _encode_batch_sync
    mesh = mesh or make_mesh()
    sh = block_sharding(mesh)

    @functools.partial(jax.jit, static_argnums=(3,),
                       in_shardings=(sh, sh, sh),
                       out_shardings=(sh, sh, sh, sh, sh))
    def _run(b, nv, bf, kk):
        return _encode_batch_sync(b, nv, bf, kk)

    words, bits, cnt, offsets, _ovf = _run(
        jax.device_put(jnp.asarray(blocks), sh),
        jax.device_put(jnp.asarray(n_valid), sh),
        jax.device_put(jnp.asarray(bfinal), sh), k)
    return (np.asarray(words), np.asarray(bits), np.asarray(cnt),
            np.asarray(offsets))


def decode_sync_sharded(words: np.ndarray, chunk_bits: np.ndarray,
                        chunk_counts: np.ndarray,
                        lit_lengths: np.ndarray, dist_lengths: np.ndarray,
                        k: int, mesh=None):
    """Chunk-parallel sync decode across the mesh (XLA twin of
    ops/pallas_sync_decode): every K-token chunk decodes independently
    from its LS bit offset, chunks data-parallel over the mesh.

    words: (C, W) uint32 per-chunk word views (replicate the member's
    words per chunk); chunk_bits: (C,) int32 absolute start bits;
    chunk_counts: (C,) tokens per chunk (<= k); lit/dist lengths are
    the SHARED code set (1, 286)/(1, 30).

    Returns packed tokens (C, k) int32 (a | b<<9).
    """
    from ..ops.deflate_decode import _symbol_step
    mesh = mesh or make_mesh()
    sh = block_sharding(mesh)
    c_n = words.shape[0]

    @functools.partial(jax.jit, static_argnums=(5,),
                       in_shardings=(sh, sh, sh, None, None),
                       out_shardings=sh)
    def _run(w, s, cnts, ll, dl, kk):
        lit_t, dist_t = tables_from_lengths(ll, dl)
        lit_t = jnp.broadcast_to(lit_t, (w.shape[0], lit_t.shape[1]))
        dist_t = jnp.broadcast_to(dist_t, (w.shape[0], dist_t.shape[1]))

        def step(carry, i):
            pos = carry
            a, b, new_pos, _eob, _bad = _symbol_step(w, pos, lit_t,
                                                     dist_t)
            active = i < cnts
            pos = jnp.where(active, new_pos, pos)
            tok = jnp.where(active,
                            jnp.clip(a, 0, 511) | (b << 9), 0)
            return pos, tok

        _, toks = jax.lax.scan(step, s.astype(jnp.int32),
                               jnp.arange(kk, dtype=jnp.int32))
        return jnp.transpose(toks)                 # (C, k)

    return np.asarray(_run(
        jax.device_put(jnp.asarray(words), sh),
        jax.device_put(jnp.asarray(chunk_bits), sh),
        jax.device_put(jnp.asarray(chunk_counts), sh),
        jnp.asarray(lit_lengths), jnp.asarray(dist_lengths), k))


def combine_shard_crcs(crcs: list[int], lengths: list[int]) -> int:
    """Fold ordered per-shard CRCs into the stream CRC (host edge)."""
    total = 0
    acc_len = 0
    for c, ln in zip(crcs, lengths):
        if acc_len == 0:
            total, acc_len = c, ln
        else:
            total = crc32_combine(total, c, ln)
            acc_len += ln
    return total
