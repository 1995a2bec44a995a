"""Pallas TPU speculative bitwise DEFLATE decoder (shared-table mode).

The per-symbol scan decoder (ops/deflate_decode.decode_symbols) is
bound by per-stream HBM gathers: each stream's bit cursor diverges, so
every step gathers words and table entries at stream-specific offsets
(~85 M gathers/s under XLA).  This kernel removes *all* gathers from
the hot path by decoding **speculatively at every bit position**:

* 128 member streams ride the lanes; all lanes process the SAME bit
  position range per step, so word fetches are static slices, not
  gathers.
* The Huffman tables are SHARED across the batch (the PGZF shared-table
  encode mode transmits one batch-global code set in every member
  header, "broadcast shared code tables").  A 12-bit root table is 32
  VMEM rows; lookups are lane-shuffle row-group selects.
* For each bit position p the kernel emits the decoded token (packed)
  and ``nextL[p]`` — the bit position of the next litlen symbol if a
  litlen symbol starts at p.  Following the ``nextL`` chain from each
  stream's first symbol yields exactly the true token boundaries
  (Massively-Parallel Lossless Data Decompression's speculation idea,
  flattened to bit granularity).

Token packing (int32):  a | (b << 9) | (eob << 25) | (bad << 26)
  a: literal byte or match length (9 bits), b: distance (16 bits).

Chain-follow + token compaction live in deflate_decode / the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import constants as C

LANES = 128
SUBLANES = 8
POS_PER_PROG = 2048          # bit positions handled by one grid program
ROOT_BITS = 12               # litlen root (shared tables, limit 12)
DIST_ROOT_BITS = 8           # distance root (30 symbols, limit 8)

EOB_FLAG = 1 << 25
BAD_FLAG = 1 << 26

_LEN_BASE_ROW = np.zeros((1, LANES), np.int32)
_LEN_BASE_ROW[0, :29] = C.LENGTH_BASE
_LEN_EXTRA_ROW = np.zeros((1, LANES), np.int32)
_LEN_EXTRA_ROW[0, :29] = C.LENGTH_EXTRA
_DIST_BASE_ROW = np.zeros((1, LANES), np.int32)
_DIST_BASE_ROW[0, :30] = C.DIST_BASE
_DIST_EXTRA_ROW = np.zeros((1, LANES), np.int32)
_DIST_EXTRA_ROW[0, :30] = C.DIST_EXTRA


def _shared_lut(rows, idx, n_groups: int):
    """Shared-table lookup: rows (G,128) VMEM array; idx (8,128) int32."""
    lane = idx & (LANES - 1)
    group = idx >> 7
    acc = jnp.zeros_like(idx)
    for r in range(n_groups):
        row = jnp.broadcast_to(rows[r, :][None, :], (SUBLANES, LANES))
        cand = jnp.take_along_axis(row, lane, axis=1)
        acc = jnp.where(group == r, cand, acc)
    return acc


def _window(words_ref, tile_bit_base, r_iota):
    """64-bit window (lo, hi u32 pair) at bit position base+r per lane."""
    row0 = tile_bit_base // 32
    w = words_ref[pl.ds(row0, 4), :]                    # (4, 128) u32
    sh = (tile_bit_base % 32 + r_iota).astype(jnp.uint32)  # (8,128) 0..39
    # normalize: when sh >= 32 step to the next word
    carry = (sh >= 32).astype(jnp.int32)
    shm = jnp.where(sh >= 32, sh - 32, sh)
    w0 = jnp.where(carry == 0, w[0][None, :], w[1][None, :])
    w1 = jnp.where(carry == 0, w[1][None, :], w[2][None, :])
    w2 = jnp.where(carry == 0, w[2][None, :], w[3][None, :])
    inv = (jnp.uint32(31) - shm)
    lo = (w0 >> shm) | ((w1 << inv) << jnp.uint32(1))
    hi = (w1 >> shm) | ((w2 << inv) << jnp.uint32(1))
    return lo, hi


def _bits_at(lo, hi, k, nbits_mask):
    """Extract bits [k, k+n) from the 64-bit window; k (8,128) 0..31."""
    k = k.astype(jnp.uint32)
    inv = jnp.uint32(31) - k
    v = (lo >> k) | ((hi << inv) << jnp.uint32(1))
    return (v & nbits_mask).astype(jnp.int32)


def _decode_kernel(words_ref, lit_ref, dist_ref, lb_ref, le_ref,
                   db_ref, de_ref, tok_ref, next_ref):
    g = pl.program_id(1)
    lit_rows = lit_ref[:]
    dist_rows = dist_ref[:]
    lb = lb_ref[:]
    le = le_ref[:]
    db = db_ref[:]
    de = de_ref[:]

    def tile(t, _):
        bit_base = g * POS_PER_PROG + t * SUBLANES
        r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        p = bit_base + r
        lo, hi = _window(words_ref, bit_base, r)

        e = _shared_lut(lit_rows, (lo & ((1 << ROOT_BITS) - 1)
                                   ).astype(jnp.int32),
                        (1 << ROOT_BITS) // LANES)
        w = e & 15
        sym = e >> 4
        bad = e == 0
        is_len = sym > 256
        is_eob = sym == 256
        li = jnp.clip(sym - 257, 0, 28)
        lnx = _shared_lut(le, li, 1)
        lbase = _shared_lut(lb, li, 1)
        length = lbase + _bits_at(lo, hi, w,
                                  ((jnp.uint32(1) << lnx.astype(jnp.uint32))
                                   - 1))
        k2 = w + jnp.where(is_len, lnx, 0)
        didx = _bits_at(lo, hi, k2, jnp.uint32((1 << DIST_ROOT_BITS) - 1))
        de2 = _shared_lut(dist_rows, didx, (1 << DIST_ROOT_BITS) // LANES)
        dw = de2 & 15
        dsym = jnp.clip(de2 >> 4, 0, 29)
        dbad = is_len & (de2 == 0)
        dnx = _shared_lut(de, dsym, 1)
        dbase = _shared_lut(db, dsym, 1)
        k3 = k2 + dw
        dist = dbase + _bits_at(lo, hi, k3,
                                ((jnp.uint32(1) << dnx.astype(jnp.uint32))
                                 - 1))
        total = jnp.where(is_len, k3 + dnx, w)

        a = jnp.where(is_len, length, sym)
        b = jnp.where(is_len, dist, 0)
        tok = (jnp.clip(a, 0, 511) | (jnp.clip(b, 0, 65535) << 9)
               | jnp.where(is_eob, EOB_FLAG, 0)
               | jnp.where(bad | dbad, BAD_FLAG, 0))
        nxt = jnp.where(is_eob | bad | dbad, p, p + total)

        tok_ref[pl.ds(t * SUBLANES, SUBLANES), :] = tok
        next_ref[pl.ds(t * SUBLANES, SUBLANES), :] = nxt
        return 0

    jax.lax.fori_loop(0, POS_PER_PROG // SUBLANES, tile, 0)


CHAIN_CHUNK = 512        # bit positions per chunk-exit program
MAX_JUMP = 48            # max bits per symbol (12+5+12+13 < 48)


def _chunk_exit_kernel(next_ref, out_ref):
    """Backward DP: out[l] = first orbit position outside this chunk
    (or the terminal/fixed position), for every l in a 512-row chunk.

    Row l's successor lies in (l, l+MAX_JUMP] — at most 6 vregs ahead —
    so a reverse sweep over 8-row tiles needs only (a) 3 pointer-doubling
    rounds *within* the tile (8-deep dynamic_gather) and (b) a 7-group
    select over already-computed rows below.
    """
    g = pl.program_id(1)
    base = g * CHAIN_CHUNK
    n_tiles = CHAIN_CHUNK // SUBLANES

    def tile_step(i, _):
        t = n_tiles - 1 - i
        r0 = t * SUBLANES
        rows = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
        abs_pos = base + r0 + rows
        v = next_ref[pl.ds(r0, SUBLANES), :]
        # done as int32: Mosaic's dynamic_gather has no 1-bit lanes
        done = ((v >= base + CHAIN_CHUNK) | (v <= abs_pos)
                ).astype(jnp.int32)

        # (a) in-tile chains: after 3 doublings every live pointer has
        # left the tile or reached a terminal
        for _ in range(3):
            local = jnp.clip(v - (base + r0), 0, SUBLANES - 1)
            in_tile = ((done == 0) & (v >= base + r0)
                       & (v < base + r0 + SUBLANES))
            v2 = jnp.take_along_axis(v, local, axis=0)
            d2 = jnp.take_along_axis(done, local, axis=0)
            new_done = jnp.where(
                (d2 != 0) | (v2 >= base + CHAIN_CHUNK) | (v2 <= v), 1, 0)
            done = jnp.where(in_tile, new_done, done)
            v = jnp.where(in_tile, v2, v)

        # (b) rows below the tile are final: select over 7 row-groups.
        # r0 is traced, so clamp reads at the chunk boundary; the `hit`
        # guard is false there anyway (done covers v >= chunk end).
        acc = v
        for k in range(1, 8):
            gr0 = r0 + k * SUBLANES
            gr0c = jnp.minimum(gr0, CHAIN_CHUNK - SUBLANES)
            ex_rows = out_ref[pl.ds(gr0c, SUBLANES), :]
            local = jnp.clip(v - (base + gr0c), 0, SUBLANES - 1)
            cand = jnp.take_along_axis(ex_rows, local, axis=0)
            hit = ((done == 0) & (v >= base + gr0)
                   & (v < base + gr0 + SUBLANES)
                   & (gr0 < CHAIN_CHUNK))
            acc = jnp.where(hit, cand, acc)
        out_ref[pl.ds(r0, SUBLANES), :] = jnp.where(done != 0, v, acc)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_step, 0)


@functools.partial(jax.jit, static_argnames=())
def chunk_exit_maps(next_l: jnp.ndarray) -> jnp.ndarray:
    """Per-position chunk-exit maps for (G, P, 128) next pointers.

    P must be a multiple of CHAIN_CHUNK.  exit[p] = first position on
    the orbit of p outside p's 512-chunk (terminals stay put).
    """
    g_, p_total, lanes = next_l.shape
    assert lanes == LANES and p_total % CHAIN_CHUNK == 0
    grid = (g_, p_total // CHAIN_CHUNK)
    spec = pl.BlockSpec((1, CHAIN_CHUNK, LANES), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)

    def kernel(next_r, out_r):
        _chunk_exit_kernel(next_r.at[0], out_r.at[0])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g_, p_total, LANES), jnp.int32),
    )(next_l)


MAX_EMIT = 128           # token slots per 512-bit chunk (2x typical)
EMIT_ROWS = MAX_EMIT + 8  # + one 8-row stripe carrying the count
EMIT_INVALID = -1   # plain int: a jnp scalar would be a captured constant


def _gather512(chunk_rows, local, n_groups: int = CHAIN_CHUNK // SUBLANES,
               first_group: int = 0):
    """Gather chunk_rows[(local), lane] for local (1,128) in [0,512).

    Row-group select: 64 groups × one 8-deep per-lane dynamic_gather.
    ``first_group`` statically skips groups the caller can prove below
    every ``local`` (the parse walk's monotone cursor: after 64*sl
    steps the cursor's group is >= 8*sl — halves the sweep on average).
    """
    idx8 = jnp.broadcast_to(local, (SUBLANES, LANES))
    grp = local >> 3
    # 8 interleaved select-accumulators + an OR tree: each local
    # matches exactly ONE group (non-matching contributions stay 0),
    # so the dependent chain is n_groups/8 + 3 deep instead of
    # n_groups — the serial walk step's latency bound
    accs = [jnp.zeros((1, LANES), jnp.int32) for _ in range(SUBLANES)]
    for k in range(first_group, n_groups):
        rows = chunk_rows[k * SUBLANES:(k + 1) * SUBLANES, :]
        sub = jnp.clip(idx8 - k * SUBLANES, 0, SUBLANES - 1)
        cand = jnp.take_along_axis(rows, sub, axis=0)[0:1, :]
        q = k & (SUBLANES - 1)
        accs[q] = jnp.where(grp == k, cand, accs[q])
    while len(accs) > 1:
        accs = [accs[i] | accs[i + 1] for i in range(0, len(accs), 2)]
    return accs[0]


def _walk_emit_kernel(next_ref, tok_ref, entries_ref, out_ref):
    """Per chunk: walk the token chain from the chunk's entry position,
    writing each token to a *sequential* output row — compaction falls
    out of the walk, no scatter needed.

    Output block layout (EMIT_ROWS, 128): rows [0, MAX_EMIT) tokens
    (EMIT_INVALID where the walk had already left the chunk), row
    MAX_EMIT = emitted count, or -1 on overflow (caller falls back).
    """
    c = pl.program_id(1)
    base = c * CHAIN_CHUNK
    nxt = next_ref[:]                       # (512, 128)
    tk = tok_ref[:]
    cursor = entries_ref[pl.ds(c, 1), :]    # (1, 128) absolute positions

    def step(i, cur):
        in_chunk = (cur >= base) & (cur < base + CHAIN_CHUNK)
        local = jnp.clip(cur - base, 0, CHAIN_CHUNK - 1)
        tokv = _gather512(tk, local)
        nv = _gather512(nxt, local)
        out_ref[pl.ds(i, 1), :] = jnp.where(in_chunk, tokv, EMIT_INVALID)
        # terminals (EOB/bad) have nv == cur and stay, but they leave
        # the chunk logically once emitted: advance to a sentinel so the
        # same token is not emitted twice
        moved = jnp.where(nv == cur, jnp.int32(0x7FFFFFF0), nv)
        return jnp.where(in_chunk, moved, cur)

    cur = jax.lax.fori_loop(0, MAX_EMIT, step, cursor)
    # overflow flag stripe (count itself is reconstructed by the caller
    # from valid rows); built by concat — .at[].set lowers to scatter,
    # which Mosaic lacks
    still_in = (cur >= base) & (cur < base + CHAIN_CHUNK)
    flag = jnp.where(still_in, jnp.int32(-1), jnp.int32(0))
    count_row = jnp.concatenate(
        [flag, jnp.zeros((SUBLANES - 1, LANES), jnp.int32)], axis=0)
    out_ref[pl.ds(MAX_EMIT, SUBLANES), :] = count_row


@functools.partial(jax.jit, static_argnames=())
def walk_emit(next_l: jnp.ndarray, tok: jnp.ndarray,
              entries: jnp.ndarray):
    """Token emission for (G, P, 128) speculative outputs.

    entries: (G, n_chunks, 128) — orbit position at each chunk start
    (from the chunk-exit composition).  Returns (G, n_chunks*EMIT_ROWS,
    128) int32 blocks per chunk: MAX_EMIT token rows + a flag stripe.
    """
    g_, p_total, lanes = next_l.shape
    assert lanes == LANES and p_total % CHAIN_CHUNK == 0
    n_chunks = p_total // CHAIN_CHUNK
    grid = (g_, n_chunks)
    spec_chunk = pl.BlockSpec((1, CHAIN_CHUNK, LANES),
                              lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    spec_entries = pl.BlockSpec((1, n_chunks, LANES),
                                lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, EMIT_ROWS, LANES),
                            lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def kernel(next_r, tok_r, ent_r, out_r):
        _walk_emit_kernel(next_r.at[0], tok_r.at[0], ent_r.at[0],
                          out_r.at[0])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_chunk, spec_chunk, spec_entries],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((g_, n_chunks * EMIT_ROWS, LANES),
                                       jnp.int32),
    )(next_l, tok, entries)


@functools.partial(jax.jit, static_argnames=())
def speculative_decode_positions(words: jnp.ndarray,
                                 lit_table: jnp.ndarray,
                                 dist_table: jnp.ndarray):
    """Per-bit-position speculative decode.

    Args:
        words: (G, W, 128) uint32 — word r of stream l in group g is
            ``words[g, r, l]`` (streams are lanes).  W must satisfy
            8·(W-4) ≥ decoded position range.
        lit_table / dist_table: (4096,) int32 shared root tables
            (entry = sym<<4 | width, 0 invalid), built with limit 12.

    Returns (tok, nextL): (G, P, 128) int32 with P = 8·W - 64.
    """
    g_, w_, lanes = words.shape
    assert lanes == LANES
    p_total = 32 * w_ - 128          # leave 4 words of look-ahead
    assert p_total % POS_PER_PROG == 0

    lit_rows = lit_table.reshape((1 << ROOT_BITS) // LANES, LANES)
    dist_rows = dist_table.reshape((1 << DIST_ROOT_BITS) // LANES, LANES)

    grid = (g_, p_total // POS_PER_PROG)
    spec_words = pl.BlockSpec((1, w_, LANES), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    spec_tab = pl.BlockSpec(((1 << ROOT_BITS) // LANES, LANES),
                            lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    spec_dtab = pl.BlockSpec(((1 << DIST_ROOT_BITS) // LANES, LANES),
                             lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, POS_PER_PROG, LANES),
                            lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def kernel(words_r, lit_r, dist_r, lb_r, le_r, db_r, de_r,
               tok_r, next_r):
        _decode_kernel(words_r.at[0], lit_r, dist_r, lb_r, le_r,
                       db_r, de_r, tok_r.at[0], next_r.at[0])

    tok, nxt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_words, spec_tab, spec_dtab,
                  spec_row, spec_row, spec_row, spec_row],
        out_specs=[spec_out, spec_out],
        out_shape=[jax.ShapeDtypeStruct((g_, p_total, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((g_, p_total, LANES), jnp.int32)],
    )(words, lit_rows, dist_rows,
      jnp.asarray(_LEN_BASE_ROW), jnp.asarray(_LEN_EXTRA_ROW),
      jnp.asarray(_DIST_BASE_ROW), jnp.asarray(_DIST_EXTRA_ROW))
    return tok, nxt
