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
