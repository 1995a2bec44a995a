"""Pallas TPU greedy-parse kernels: jump maps → emitted token rows.

The greedy LZ77 parse (reference: libflate_lz77/src/default.rs:69-109 —
``p += max(1, len[p])``) is the encode pipeline's last left-to-right
dependency.  The XLA formulation (ops/lz77.greedy_parse_marks: pointer
doubling + lockstep walk + scatter compaction) is gather/scatter-bound
at ~85 M elem/s; these kernels reuse the decode side's chunk-orbit
decomposition (ops/pallas_decode) where every gather is a VMEM
row-group shuffle:

* ``parse_chunk_exits`` — backward DP per 512-position chunk: for every
  in-chunk position, the first orbit position outside the chunk.  A
  jump advances by at most MAX_MATCH=258 < 512, so a successor lies at
  most 33 8-row tiles ahead — in-tile pointer doubling plus a bounded
  select over already-finalized tiles below.
* ``parse_entries`` — (XLA) threads chunk entries: the orbit position at
  each chunk boundary.  A chunk exit always lands in the next chunk
  (jump ≤ 258 < 512), so a 1-step scan suffices.
* ``parse_walk_emit`` — walks the orbit inside each chunk from its
  entry, writing each visited position's packed token to the next
  sequential output row.  Compaction falls out of the walk: chunk c's
  tokens occupy rows [512c, 512c+k), the rest are -1.  A chunk emits at
  most 512 tokens (every token consumes ≥ 1 position), so the walk can
  never overflow its block — no fallback path needed.

Token packing (int32): a | (b << 9), a = literal byte or match length
(9 bits), b = distance (16 bits); -1 marks an empty row.  Positions at
or past a member's valid byte count carry tok = -1 and emit as holes.

Layout: (P positions, 128 member lanes) — members ride lanes, as in
pallas_lz77 / pallas_decode.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _gather512

LANES = 128
SUB = 8
CHUNK = 512
MAX_JUMP = 258                      # MAX_MATCH
_TILES = CHUNK // SUB               # 64
_K_BELOW = (SUB - 1 + MAX_JUMP) // SUB   # 33 tiles of look-ahead


def _interp() -> bool:
    return os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"


def _exit_kernel(jump_ref, out_ref):
    j = pl.program_id(0)
    base = j * CHUNK

    def tile_step(i, _):
        t = _TILES - 1 - i
        r0 = t * SUB
        v = jump_ref[pl.ds(r0, SUB), :]
        done = (v >= base + CHUNK).astype(jnp.int32)

        # (a) in-tile chains: 3 doublings resolve any chain within the
        # 8-row tile (jump is strictly increasing, no cycles)
        for _ in range(3):
            local = jnp.clip(v - (base + r0), 0, SUB - 1)
            in_tile = ((done == 0) & (v >= base + r0)
                       & (v < base + r0 + SUB))
            v2 = jnp.take_along_axis(v, local, axis=0)
            d2 = jnp.take_along_axis(done, local, axis=0)
            new_done = jnp.where((d2 != 0) | (v2 >= base + CHUNK), 1, 0)
            done = jnp.where(in_tile, new_done, done)
            v = jnp.where(in_tile, v2, v)

        # (b) successors in already-finalized tiles below: one hop reads
        # the final exit.  v - (base+r0) ∈ [SUB, SUB-1+MAX_JUMP] here.
        acc = v
        for k in range(1, _K_BELOW + 1):
            gr0 = r0 + k * SUB
            gr0c = jnp.minimum(gr0, CHUNK - SUB)
            ex_rows = out_ref[pl.ds(gr0c, SUB), :]
            local = jnp.clip(v - (base + gr0c), 0, SUB - 1)
            cand = jnp.take_along_axis(ex_rows, local, axis=0)
            hit = ((done == 0) & (v >= base + gr0)
                   & (v < base + gr0 + SUB) & (gr0 < CHUNK))
            acc = jnp.where(hit, cand, acc)
        out_ref[pl.ds(r0, SUB), :] = jnp.where(done != 0, v, acc)
        return 0

    jax.lax.fori_loop(0, _TILES, tile_step, 0)


@functools.partial(jax.jit, static_argnames=())
def parse_chunk_exits(jump: jnp.ndarray) -> jnp.ndarray:
    """(P, 128) absolute jump targets → (P, 128) chunk exits.

    exit[p] = first position on p's orbit outside p's 512-chunk.
    P must be a multiple of 512; jumps must satisfy p < jump[p] ≤
    p + MAX_JUMP.
    """
    p_total, lanes = jump.shape
    assert lanes == LANES and p_total % CHUNK == 0
    spec = pl.BlockSpec((CHUNK, LANES), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _exit_kernel,
        grid=(p_total // CHUNK,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((p_total, LANES), jnp.int32),
        interpret=_interp(),
    )(jump)


@functools.partial(jax.jit, static_argnames=())
def parse_entries(exits: jnp.ndarray) -> jnp.ndarray:
    """(P, 128) chunk exits → (n_chunks, 128) orbit entry per chunk.

    entry[0] = 0; entry[t+1] = exits[entry[t]] (which lies in chunk
    t+1 because a jump cannot skip a whole chunk).
    """
    p_total, lanes = exits.shape
    n_chunks = p_total // CHUNK

    def step(e, _):
        nxt = jnp.take_along_axis(exits, jnp.clip(e, 0, p_total - 1),
                                  axis=0)
        return nxt, e[0]

    e0 = jnp.zeros((1, lanes), jnp.int32)
    _, entries = jax.lax.scan(step, e0, None, length=n_chunks)
    return entries


_WALK_SLICES = 8
_STEPS = CHUNK // _WALK_SLICES       # 64 steps per guarded slice


def _walk_kernel(cap, n_c, jump_ref, tok_ref, ent_ref, out_ref,
                 ovf_ref, cur_ref, emit_ref):
    # n_c chunks walk per grid program: each chunk's step loop is a
    # serially dependent cursor chain (gather -> next cursor), but the
    # chunks are independent and interleave for ILP (the member-
    # interleave lesson from the resolve/stitch kernels)
    j = pl.program_id(0)
    bases = [(j * n_c + c) * CHUNK for c in range(n_c)]
    neg = jnp.full((SUB, LANES), -1, jnp.int32)
    for r in range(n_c * _TILES):
        emit_ref[pl.ds(r * SUB, SUB), :] = neg

    cur_ref[:] = ent_ref[0]
    jks = [jump_ref[pl.ds(c * CHUNK, CHUNK), :] for c in range(n_c)]
    tks = [tok_ref[pl.ds(c * CHUNK, CHUNK), :] for c in range(n_c)]

    for sl in range(_WALK_SLICES):
        cur0 = cur_ref[:]
        alive = jnp.zeros((), jnp.bool_)
        for c in range(n_c):
            cc = cur0[c:c + 1, :]
            alive = alive | jnp.any((cc >= bases[c])
                                    & (cc < bases[c] + CHUNK))

        @pl.when(alive)
        def _walk(sl=sl):
            # the cursor advances >= 1 per emitted token, so after
            # 64*sl walk steps every in-chunk cursor sits at local
            # >= 64*sl — the gathers statically skip groups below
            # 8*sl (a skipped slice implies every lane already left
            # the chunk, so later slices' bounds still hold; the
            # union alive gate only ADDS steps, never skips live ones)
            fg = sl * (_STEPS // SUB)

            def step(i, cs):
                outs = []
                for c in range(n_c):
                    cc = cs[c:c + 1, :]
                    in_chunk = ((cc >= bases[c])
                                & (cc < bases[c] + CHUNK))
                    local = jnp.clip(cc - bases[c], 0, CHUNK - 1)
                    tv = _gather512(tks[c], local, first_group=fg)
                    nv = _gather512(jks[c], local, first_group=fg)
                    emit_ref[pl.ds(c * CHUNK + sl * _STEPS + i, 1),
                             :] = jnp.where(in_chunk, tv, -1)
                    outs.append(jnp.where(in_chunk, nv, cc))
                return jnp.concatenate(outs, axis=0)

            cur_ref[:] = jax.lax.fori_loop(0, _STEPS, step, cur_ref[:])

    ovf_rows = []
    for c in range(n_c):
        for r in range(cap // SUB):
            out_ref[pl.ds(c * cap + r * SUB, SUB), :] = emit_ref[
                pl.ds(c * CHUNK + r * SUB, SUB), :]
        ovf = jnp.zeros((1, LANES), jnp.int32)
        for r in range(cap // SUB, _TILES):
            rows = emit_ref[pl.ds(c * CHUNK + r * SUB, SUB), :]
            ovf = jnp.maximum(ovf,
                              jnp.max((rows >= 0).astype(jnp.int32),
                                      axis=0, keepdims=True))
        ovf_rows.append(ovf)
    ovf_ref[0] = jnp.concatenate(ovf_rows, axis=0)


@functools.partial(jax.jit, static_argnames=("cap",))
def parse_walk_emit(jump: jnp.ndarray, tok: jnp.ndarray,
                    entries: jnp.ndarray, cap: int = CHUNK):
    """Emit tokens in orbit order, compacted per chunk.

    jump/tok: (P, 128); entries: (n_chunks, 128).  Returns
    (out, ovf): out (n_chunks*cap, 128) int32 — chunk c's tokens at
    rows [cap*c, cap*c+k) in stream order, -1 rows elsewhere (holes
    keep downstream fields at width 0); ovf (n_chunks, 128) int32 —
    1 where a chunk emitted more than ``cap`` tokens (those tokens are
    DROPPED from ``out``; callers must fall back to cap=512, which is
    lossless because a 512-position chunk emits at most 512 tokens).

    ``cap`` trades slot-padding waste for a fallback: greedy parses
    emit ~1 token per 4 positions on compressible data, so cap=256
    halves every downstream field/pack array while overflowing only on
    literal-dense chunks.
    """
    p_total, lanes = jump.shape
    assert lanes == LANES and p_total % CHUNK == 0
    assert cap % SUB == 0 and 0 < cap <= CHUNK
    n_chunks = p_total // CHUNK
    # measured on the v5e: n_c=1 4.90 ms / 8 MiB, 2 -> 5.17, 4 -> 5.27,
    # 8 -> 5.52 — the union alive gate's wasted steps beat the chunk
    # ILP here (unlike resolve/stitch), so single-chunk stays default
    n_c = int(os.environ.get("LIBFLATE_WALK_CHUNKS", "1"))
    while n_chunks % n_c:
        n_c //= 2
    spec = pl.BlockSpec((n_c * CHUNK, LANES), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((n_c * cap, LANES), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)
    # entries ride a (1, n_c, LANES) trailing block: Mosaic requires
    # the last two block dims divisible by (8, 128) OR equal to the
    # array's — a leading grid axis keeps the (n_c, LANES) rows legal.
    spec_ent = pl.BlockSpec((1, n_c, LANES), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_ovf = pl.BlockSpec((1, n_c, LANES), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    out, ovf = pl.pallas_call(
        functools.partial(_walk_kernel, cap, n_c),
        grid=(n_chunks // n_c,),
        in_specs=[spec, spec, spec_ent],
        out_specs=[spec_out, spec_ovf],
        out_shape=[jax.ShapeDtypeStruct((n_chunks * cap, LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((n_chunks // n_c, n_c, LANES),
                                        jnp.int32)],
        scratch_shapes=[pltpu.VMEM((n_c, LANES), jnp.int32),
                        pltpu.VMEM((n_c * CHUNK, LANES), jnp.int32)],
        interpret=_interp(),
    )(jump, tok, entries.reshape(-1, n_c, LANES))
    return out, ovf.reshape(n_chunks, LANES)


@functools.partial(jax.jit, static_argnames=("cap",))
def parse_tokens_pallas(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                        cand: jnp.ndarray, lengths: jnp.ndarray,
                        cap: int = CHUNK):
    """Batch greedy parse + emit, kernel-backed.

    blocks: (B, n) uint8; n_valid: (B,); cand/lengths: (B, n) int32
    (lengths already 0 where < MIN_MATCH, clipped to n_valid).

    Returns (a, b, valid, n_tokens, overflow): padded token arrays
    (B, m) int32 with m = n*cap/512 — token slots in stream order with
    holes (valid False) interleaved; overflow (B,) bool marks members
    whose tokens did not fit under ``cap`` slots per 512-position
    chunk (their a/b/cnt are INCOMPLETE — re-encode with cap=512).
    """
    bsz, n = blocks.shape
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    is_m = lengths >= 3
    in_data = idx < n_valid[:, None]
    a_src = jnp.where(is_m, lengths, blocks.astype(jnp.int32))
    b_src = jnp.where(is_m, idx - cand, 0)
    tok = jnp.where(in_data, a_src | (b_src << 9), -1)
    jump = jnp.minimum(idx + jnp.where(is_m, lengths, 1), n)

    jump_t = jnp.transpose(jump).astype(jnp.int32)
    tok_t = jnp.transpose(tok).astype(jnp.int32)
    exits = parse_chunk_exits(jump_t)
    entries = parse_entries(exits)
    out_t, ovf_t = parse_walk_emit(jump_t, tok_t, entries, cap)

    out = jnp.transpose(out_t)
    valid = out >= 0
    a = jnp.where(valid, out & 511, 0)
    b = jnp.where(valid, out >> 9, 0)
    n_tokens = jnp.sum(valid.astype(jnp.int32), axis=1)
    overflow = jnp.any(ovf_t != 0, axis=0)
    return a, b, valid, n_tokens, overflow
