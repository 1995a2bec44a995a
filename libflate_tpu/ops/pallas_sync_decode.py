"""Pallas TPU sync-point DEFLATE decoder (indexed shared-table mode).

The speculative decoder (ops/pallas_decode) pays for unknown symbol
boundaries by decoding EVERY bit position (~5-20x wasted work) and then
resolving chains.  But this framework controls its own container: the
PGZF encoder can simply RECORD the bit offset of every K-th token in a
gzip EXTRA subfield (id ``b"LS"``, ~100 B per 64 KiB member, ignored by
stock tools).  Decode then needs zero speculation:

* Every K-token chunk decodes independently — thousands of chunks run
  in lockstep as (8 sublanes x 128 lanes) = 1024 slots per grid program.
* Chunk bits are pre-staged column-contiguous (host byte gather), so
  every slot starts at word 0 of its own column: the initial window
  load is a static slice.
* Each slot keeps an 8-word (256-bit) bit window in vregs; a masked
  shift-by-4 refill per token step replaces per-symbol HBM gathers.
* The shared litlen / 8-bit distance root tables (the PGZF
  shared-table encode caps code lengths at 10/8, so the litlen root is
  8 lane-shuffle row groups; ``root_bits`` widens to 12 for legacy
  streams) live in VMEM, as in the speculative kernel.

Output: token i of every slot lands on output row i — PERFECTLY compact
per chunk (chunks have exactly K tokens, short-last aside), so the
compaction/stitch phase of the speculative path disappears entirely.

Token packing matches native.expand_batch packed mode:
``tok = a | (b << 9)`` (a: literal byte / match length; b: distance,
0 for literals).

Parity: this replaces the reference's sequential symbol loop
(src/deflate/decode.rs:112-130 + huffman.rs:157-179) with an
index-parallel decomposition; correctness oracles are the serial and
native engines.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import constants as C
from .pallas_decode import (DIST_ROOT_BITS, LANES, ROOT_BITS, SUBLANES,
                            _DIST_BASE_ROW, _DIST_EXTRA_ROW, _LEN_BASE_ROW,
                            _LEN_EXTRA_ROW, _shared_lut)

SLOTS = SUBLANES * LANES          # 1024 chunk slots per grid program
SYNC_TOKENS = 256                 # K: tokens per sync chunk (encoder side)
WINDOW = 8                        # window words per slot (256 bits)


def _bits_local(lo, hi, k, mask):
    """Extract bits [k, k+n) from a per-slot 64-bit window (k in 0..55)."""
    k = k.astype(jnp.uint32)
    inv = jnp.uint32(31) - k
    v = (lo >> k) | ((hi << inv) << jnp.uint32(1))
    return (v & mask).astype(jnp.int32)


def _debug_checks() -> bool:
    """Kernel invariant checks (SURVEY §5 debug_assert parity).

    The reference encodes invariants as debug_assert! (src/bit.rs,
    src/huffman.rs); here LIBFLATE_DEBUG_CHECKS=1 compiles poison marks
    into the kernel: a slot whose cursor escapes its staged window
    (corrupt LS index / bitstream) tags its tokens with bit 30, which
    the host translates into a typed DeflateError instead of silently
    expanding garbage.  Off the hot path by default (trace-time flag).
    """
    import os
    return os.environ.get("LIBFLATE_DEBUG_CHECKS") == "1"


DEBUG_POISON = 1 << 30


def _sync_kernel(staged_ref, sb_ref, cnt_ref, lit_ref, dist_ref,
                 lb_ref, le_ref, db_ref, de_ref, out_ref,
                 *, k_tokens: int, d_words: int, root_bits: int = ROOT_BITS,
                 debug: bool = False):
    lit_rows = lit_ref[:]
    dist_rows = dist_ref[:]
    lb = lb_ref[:]
    le = le_ref[:]
    db = db_ref[:]
    de = de_ref[:]
    cnt = cnt_ref[:]

    # initial window: planes [0, 8) — static slices (every chunk's bits
    # start at word 0 of its own staged column)
    w_init = tuple(staged_ref[pl.ds(j * SUBLANES, SUBLANES), :].astype(
        jnp.uint32) for j in range(WINDOW))
    cursor0 = sb_ref[:]                       # in-word start bit, [0, 32)
    wb0 = jnp.zeros((SUBLANES, LANES), jnp.int32)

    def step(i, carry):
        cursor, wb, w = carry[0], carry[1], list(carry[2:])

        # ---- refill: when the cursor entered the window's upper half,
        # shift down 4 words and fetch the next 4 planes (masked sweep)
        need = (cursor >> 5) - wb >= 4
        for j in range(4):
            w[j] = jnp.where(need, w[j + 4], w[j])
        wb = wb + jnp.where(need, 4, 0)
        tgt = wb + 4                          # multiple of 4
        for g in range(1, d_words // 4):
            hit = need & (tgt == g * 4)
            for j in range(4):
                q = g * 4 + j
                if q >= d_words:
                    continue
                plane = staged_ref[pl.ds(q * SUBLANES, SUBLANES), :].astype(
                    jnp.uint32)
                w[4 + j] = jnp.where(hit, plane, w[4 + j])

        # ---- local 64-bit window at the cursor
        cin = cursor - (wb << 5)              # [0, 128)
        ksel = cin >> 5                       # word within w0..w3
        lo = w[0]
        hi = w[1]
        h2 = w[2]
        for j in range(1, 4):
            sel = ksel == j
            lo = jnp.where(sel, w[j], lo)
            hi = jnp.where(sel, w[j + 1], hi)
            h2 = jnp.where(sel, w[j + 2], h2)
        r = (cin & 31).astype(jnp.uint32)
        inv = jnp.uint32(31) - r
        lo64 = (lo >> r) | ((hi << inv) << jnp.uint32(1))
        hi64 = (hi >> r) | ((h2 << inv) << jnp.uint32(1))

        # ---- decode one symbol (same math as the speculative kernel)
        e = _shared_lut(lit_rows,
                        (lo64 & ((1 << root_bits) - 1)).astype(jnp.int32),
                        (1 << root_bits) // LANES)
        width = e & 15
        sym = e >> 4
        is_len = sym > 256
        li = jnp.clip(sym - 257, 0, 28)
        lnx = _shared_lut(le, li, 1)
        lbase = _shared_lut(lb, li, 1)
        length = lbase + _bits_local(
            lo64, hi64, width,
            ((jnp.uint32(1) << lnx.astype(jnp.uint32)) - 1))
        k2 = width + jnp.where(is_len, lnx, 0)
        didx = _bits_local(lo64, hi64, k2,
                           jnp.uint32((1 << DIST_ROOT_BITS) - 1))
        de2 = _shared_lut(dist_rows, didx, (1 << DIST_ROOT_BITS) // LANES)
        dw = de2 & 15
        dsym = jnp.clip(de2 >> 4, 0, 29)
        dnx = _shared_lut(de, dsym, 1)
        dbase = _shared_lut(db, dsym, 1)
        k3 = k2 + dw
        dist = dbase + _bits_local(
            lo64, hi64, k3,
            ((jnp.uint32(1) << dnx.astype(jnp.uint32)) - 1))
        total = jnp.where(is_len, k3 + dnx, width)

        a = jnp.where(is_len, length, sym)
        b = jnp.where(is_len, dist, 0)
        tok = jnp.clip(a, 0, 511) | (jnp.clip(b, 0, 65535) << 9)
        if debug:
            # invariant: the cursor must stay within the staged window
            # (it cannot if the LS index or the bitstream is corrupt)
            escaped = cursor + 55 > d_words * 32
            tok = jnp.where(escaped, tok | DEBUG_POISON, tok)

        active = i < cnt
        out_ref[pl.ds(i * SUBLANES, SUBLANES), :] = jnp.where(
            active, tok, 0)
        cursor = jnp.where(active, cursor + total, cursor)
        return (cursor, wb, *w)

    jax.lax.fori_loop(0, k_tokens, step, (cursor0, wb0, *w_init))


@functools.partial(jax.jit, static_argnames=("k_tokens", "root_bits"))
def sync_decode(staged: jnp.ndarray, start_bits: jnp.ndarray,
                counts: jnp.ndarray, lit_table: jnp.ndarray,
                dist_table: jnp.ndarray, k_tokens: int = SYNC_TOKENS,
                root_bits: int = ROOT_BITS):
    """Decode P*1024 independent K-token chunks.

    Args:
        staged: (P, D*8, 128) uint32 — chunk slot (p, s, l) owns words
            ``staged[p, r*8+s, l]``; its first token starts at bit
            ``start_bits[p, s, l]`` of word 0.  D must be a multiple of 4
            and cover the chunk's bit extent + 2 words of slack.
        start_bits: (P, 8, 128) int32 in [0, 32).
        counts: (P, 8, 128) int32 — tokens to decode per slot (<= K).
        lit_table: (2**root_bits,) int32 shared litlen root (the
            shared-table encoder caps code lengths at
            pipeline.SHARED_MAX_LEN=10; legacy streams may need 12).
        dist_table: (256,) int32 shared 8-bit distance root.

    Returns:
        (P, K*8, 128) int32 — packed token i of slot (p, s, l) at
        ``out[p, i*8+s, l]``; rows past a slot's count are zero.
    """
    p_, rows, lanes = staged.shape
    assert lanes == LANES and rows % (4 * SUBLANES) == 0
    d_words = rows // SUBLANES

    lit_rows = lit_table.astype(jnp.int32).reshape(
        (1 << root_bits) // LANES, LANES)
    dist_rows = dist_table.astype(jnp.int32).reshape(
        (1 << DIST_ROOT_BITS) // LANES, LANES)

    grid = (p_,)
    spec_staged = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    spec_slot = pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_tab = pl.BlockSpec(((1 << root_bits) // LANES, LANES),
                            lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_dtab = pl.BlockSpec(((1 << DIST_ROOT_BITS) // LANES, LANES),
                             lambda i: (0, 0), memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, k_tokens * SUBLANES, LANES),
                            lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_sync_kernel, k_tokens=k_tokens,
                             d_words=d_words, root_bits=root_bits,
                             debug=_debug_checks())

    def kernel(staged_r, sb_r, cnt_r, lit_r, dist_r, lb_r, le_r, db_r,
               de_r, out_r):
        kern(staged_r.at[0], sb_r.at[0], cnt_r.at[0], lit_r, dist_r,
             lb_r, le_r, db_r, de_r, out_r.at[0])

    import os
    interpret = os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_staged, spec_slot, spec_slot, spec_tab, spec_dtab,
                  spec_row, spec_row, spec_row, spec_row],
        out_specs=spec_out,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((p_, k_tokens * SUBLANES, LANES),
                                       jnp.int32),
    )(staged, start_bits.astype(jnp.int32), counts.astype(jnp.int32),
      lit_rows, dist_rows,
      jnp.asarray(_LEN_BASE_ROW), jnp.asarray(_LEN_EXTRA_ROW),
      jnp.asarray(_DIST_BASE_ROW), jnp.asarray(_DIST_EXTRA_ROW))


# ---------------------------------------------------------------------------
# Host-side staging helpers (numpy; byte-scale work)
# ---------------------------------------------------------------------------
def stage_chunks(data: bytes | np.ndarray, abs_bit_offsets: np.ndarray,
                 extents_bits: np.ndarray, d_words: int):
    """Stage chunk bit ranges into kernel layout.

    Args:
        data: the full byte buffer containing every chunk's bits.
        abs_bit_offsets: (S,) int64 absolute bit offset of each chunk's
            first token within ``data``.
        extents_bits: (S,) int64 bit length of each chunk (token bits).
        d_words: staging depth (multiple of 4, >= max needed words + 2).

    Returns:
        (staged (P, D*8, 128) uint32, start_bits (P, 8, 128) int32) with
        P = ceil(S / 1024); slot s maps to (p, s % 1024 // 128,
        s % 128)... NOTE: mapping is (p = s // 1024, sub = (s % 1024)
        // 128, lane = s % 128).
    """
    buf = np.frombuffer(bytes(data), np.uint8) if isinstance(
        data, (bytes, bytearray)) else np.asarray(data, np.uint8)
    s_n = len(abs_bit_offsets)
    p_ = max(1, -(-s_n // SLOTS))
    s_pad = p_ * SLOTS

    offs = np.zeros(s_pad, np.int64)
    offs[:s_n] = abs_bit_offsets
    word_byte = (offs >> 5) << 2              # aligned down to a word
    start_bits = (offs & 31).astype(np.int32)

    # sanity: the window must cover start_bit + extent + decode slack
    need = (np.asarray(extents_bits, np.int64)
            + (offs[:s_n] & 31) + 64 + 31) >> 5
    if s_n and int(need.max()) > d_words:
        raise ValueError(f"d_words={d_words} too small, need "
                         f"{int(need.max())}")

    nbytes = d_words * 4
    idx = word_byte[:, None] + np.arange(nbytes, dtype=np.int64)[None, :]
    np.clip(idx, 0, len(buf) - 1, out=idx)
    raw = buf[idx]                            # (S_pad, D*4) bytes
    words = raw.view("<u4")                   # (S_pad, D)
    # slot (p, sub, lane) -> staged[p, r*8+sub, lane]
    staged = words.reshape(p_, SUBLANES, LANES, d_words).transpose(
        0, 3, 1, 2).reshape(p_, d_words * SUBLANES, LANES)
    sb = start_bits.reshape(p_, SUBLANES, LANES)
    return np.ascontiguousarray(staged), sb


def gather_tokens(out: np.ndarray, n_slots: int, k_tokens: int
                  ) -> np.ndarray:
    """(P, K*8, 128) kernel output -> (S, K) slot-major token rows."""
    p_ = out.shape[0]
    toks = out.reshape(p_, k_tokens, SUBLANES, LANES).transpose(
        0, 2, 3, 1).reshape(p_ * SLOTS, k_tokens)
    return toks[:n_slots]
