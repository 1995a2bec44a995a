"""End-to-end device DEFLATE pipelines + the "tpu" backend engine.

Encode: bytes → fixed-size independent blocks (data-parallel axis) →
vmapped tokenize (ops.lz77) → vmapped entropy encode (ops.deflate_encode)
→ host bit-splice.  Every block is a self-contained DEFLATE block (the
reference's per-flush LZ77 reset — libflate_lz77/src/default.rs:69-109 —
proves per-block independence; SURVEY.md §2.3.1), so blocks scale across
lanes, cores and chips without cross-talk.

The number of blocks is padded to the next power of two to bound XLA
recompilations across input sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import constants as C
from .deflate_encode import encode_block, splice_blocks_host
from .lz77 import tokenize_block

#: device-side block size: large enough to amortize per-block tables,
#: small enough to expose parallelism (and bound sort sizes)
DEVICE_BLOCK_SIZE = 64 * 1024


@functools.partial(jax.jit, static_argnames=())
def _tokenize_batch(blocks: jnp.ndarray, n_valid: jnp.ndarray):
    n = blocks.shape[1]
    return jax.vmap(lambda blk, nv: tokenize_block(blk, nv, n + 1))(
        blocks, n_valid)


#: LCP extension round cap on the hash path (4 bytes per round).
#: Kernel cost scales with rounds (a tile stays live while ANY lane
#: extends), and dist-1 runs — the dominant source of long matches —
#: are exact via the arithmetic RLE rule (here and in
#: lz77.tokenize_block_from_cand), so a low cap only truncates rare
#: non-RLE matches past cap*4 bytes.  Bench-corpus A/B (LCP kernel
#: slope / ratio): 8 rounds 45.7 ms / 0.3394, 6 rounds 41.2 / 0.3395,
#: 4 rounds 27.6 / 0.3420 — 6 is the knee (ratio cost +0.0001).
KERNEL_LCP_ROUNDS = 6


@functools.partial(jax.jit, static_argnames=())
def _tokenize_tail(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                   cand: jnp.ndarray):
    from .lz77 import tokenize_block_from_cand
    n = blocks.shape[1]
    return jax.vmap(
        lambda blk, nv, cd: tokenize_block_from_cand(
            blk, nv, n + 1, cd, max_rounds=KERNEL_LCP_ROUNDS)
    )(blocks, n_valid, cand)


def _tokenize_batch_any(blocks: jnp.ndarray, n_valid: jnp.ndarray):
    """Hash-kernel candidates (Pallas) when available, else the
    sort-based path.  The kernel replaces the encode pipeline's
    dominant cost (64 Ki-key argsort per member)."""
    from .pallas_lz77 import LANES, prefix_candidates_pallas
    if _use_pallas() and blocks.shape[0] == LANES:
        cand = prefix_candidates_pallas(blocks)
        return _tokenize_tail(blocks, n_valid, cand)
    return _tokenize_batch(blocks, n_valid)


def _compose_cand(cand: jnp.ndarray, prev: jnp.ndarray,
                  window: int) -> jnp.ndarray:
    """One hash-chain step: the candidate OF the candidate.

    The single-slot table's candidate array IS the chain — cand[q] is
    the bucket occupant evicted when q inserted — so composing it k
    times walks the same predecessor chain the reference's zlib-style
    matchers walk (colliding wrong-key entries are links too; the LCP
    scores them 0 and the best-of select skips them).  One Pallas
    gather per level (window-local indices ride the 64-row skip)."""
    from .pallas_gather import flatten_rows, gather_rows
    bsz, n = cand.shape
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    r = gather_rows(flatten_rows(cand),
                    flatten_rows(jnp.clip(prev, 0, n - 1)))
    r = r.reshape(bsz, n)
    ok = (prev >= 0) & (r >= 0) & (idx - r <= window)
    return jnp.where(ok, r, -1)


#: LCP-kernel sweep window for rounds >= 3 when the sort matcher's
#: exact 12-byte lengths are available: only matches BOTH longer than
#: 12 AND farther than this lose their tail (bench corpus: 12% of the
#: >=13 tail bytes — ratio cost ~1e-4) while the kernel sweep shrinks
#: from 34 to 10 row groups.
LCP_TAIL_WINDOW = 8192


@functools.partial(jax.jit, static_argnames=("lazy", "use_kernel",
                                              "window", "chain",
                                              "m_exact", "lcp_rounds"))
def _lengths_stage(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                   cand: jnp.ndarray, lazy: bool = False,
                   use_kernel: bool = False, window: int = 32768,
                   chain: int = 1, m4: jnp.ndarray | None = None,
                   m_exact: int = 4, lcp_rounds: int | None = None):
    """Candidate masking + LCP (+ TOO_FAR / lazy heuristics).

    ``use_kernel`` routes the LCP through the Pallas member-in-VMEM
    kernel (ops/pallas_lcp, 88 ms vs 724 ms XLA per 8 MiB on the v5e,
    length-identical under the same round cap).

    ``lazy=True`` applies two elementwise ratio heuristics before the
    parse (both produce valid DEFLATE token choices, verified by
    round-trip): the zlib TOO_FAR rule (len-3 matches beyond 4 KiB cost
    more than 3 literals under typical codes) and one-step lazy
    matching — defer to position p+1 when its match is strictly longer
    (reference analog: zlib deflate_slow; measured −0.007 ratio on the
    bench corpus).
    """
    from .lz77 import match_lengths
    n = blocks.shape[1]
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    cand = jnp.where(idx < n_valid[:, None], cand, -1)

    def lcp(c, m4_=None):
        if use_kernel:
            from .pallas_lcp import match_lengths_pallas
            first = (m_exact // 4) if m4_ is not None else 0
            # device default with the sort matcher's exact >= 16-byte
            # lengths: SKIP the extension kernel — lengths cap at
            # m_exact (dist-1 runs stay exact via the RLE arithmetic
            # below; ratio 0.3207 vs 0.3150 extended, bench corpus)
            rounds = (lcp_rounds if lcp_rounds is not None
                      else (first if (m4_ is not None and m_exact >= 16)
                            else KERNEL_LCP_ROUNDS))
            if m4_ is not None and rounds <= first:
                return jnp.where(c >= 0, m4_, 0)
            win = window
            if m4_ is not None and m_exact >= 12:
                win = min(window, LCP_TAIL_WINDOW)
            return match_lengths_pallas(blocks, c, n_valid,
                                        max_rounds=max(rounds, first + 1),
                                        window=win, m4=m4_,
                                        m_exact=m_exact)
        return jax.vmap(
            lambda d, cc: match_lengths(
                d, cc,
                max_rounds=(lcp_rounds if lcp_rounds is not None
                            else KERNEL_LCP_ROUNDS))
        )(blocks, c)

    # exact first-word prefix lengths from the sort matcher let the
    # kernel skip round 0's full-window sweep (only valid for the
    # ORIGINAL candidates — chain compositions start from scratch)
    m4 = m4 if use_kernel else None

    if chain > 1:
        # hash-chain candidates via composition; best-of on true LCPs
        # (ties -> the nearer candidate: fewer distance bits).
        # Parity: DefaultLz77EncoderBuilder max_chain / zlib chains.
        lengths = lcp(cand, m4)
        deeper = cand
        for _ in range(chain - 1):
            deeper = _compose_cand(cand, deeper, window)
            ld = lcp(deeper)
            upd = ld > lengths
            cand = jnp.where(upd, deeper, cand)
            lengths = jnp.where(upd, ld, lengths)
    # dist-1 (RLE) matches — the common source of long matches — are
    # exact by arithmetic: LCP(i, i-1) = run end - i, where a run end
    # is the first j >= i with data[j] != data[j+1].  With runs handled
    # here, the gather path's round cap can stay low — one long match
    # per 1024-lane tile otherwise drags the whole tile through every
    # round (measured: rounds, not window width, bound the LCP kernel).
    neq = jnp.concatenate(
        [blocks[:, 1:] != blocks[:, :-1],
         jnp.ones((blocks.shape[0], 1), jnp.bool_)], axis=1)
    first_neq = jax.lax.associative_scan(
        jnp.minimum, jnp.where(neq, idx, n), reverse=True, axis=1)
    rle_len = jnp.clip(first_neq + 1 - idx, 0, C.MAX_MATCH)
    is_rle = (cand == idx - 1) & jnp.concatenate(
        [jnp.zeros((blocks.shape[0], 1), jnp.bool_),
         ~neq[:, :-1]], axis=1)
    if chain <= 1:
        lengths = lcp(cand, m4)
    lengths = jnp.where(is_rle, jnp.maximum(lengths, rle_len), lengths)
    lengths = jnp.minimum(lengths, jnp.maximum(n_valid[:, None] - idx, 0))
    lengths = jnp.where(lengths >= C.MIN_MATCH, lengths, 0)
    if lazy:
        lengths = jnp.where((lengths == 3) & (idx - cand > 4096),
                            0, lengths)
        nxt = jnp.concatenate(
            [lengths[:, 1:], jnp.zeros((lengths.shape[0], 1),
                                       lengths.dtype)], axis=1)
        lengths = jnp.where((nxt > lengths) & (lengths > 0), 0, lengths)
    return cand, lengths


#: token-slot budget per 512-position parse chunk (ops/pallas_parse).
#: Greedy parses emit ~1 token / 4 positions on compressible data
#: (bench corpus: mean 139, p99.9 318, max 361 per chunk), so 384
#: trims every downstream field/pack array by 25% with zero observed
#: overflow; literal-dense chunks that do blow the budget are detected
#: in-kernel and the batch is re-encoded losslessly at cap=512.
PARSE_CAP = 384


def _tokenize_padded(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                     lazy: bool | None = None, cap: int | None = None,
                     window: int | None = None,
                     chain: int | None = None,
                     lcp_rounds: int | None = None):
    """Kernel-backed tokenize returning PADDED stream-order tokens.

    Returns (a, b, valid, n_tokens, overflow) with token arrays of
    shape (B, n*cap/512) — token slots in stream order with hole slots
    (valid False) interleaved; downstream fields give holes width 0,
    so the packed bits equal the compacted stream's.  Greedy-parse +
    compaction run as Pallas kernels (ops/pallas_parse) instead of XLA
    pointer-doubling + scatters.  ``overflow`` (B,) flags members that
    did not fit the per-chunk slot budget (re-encode with cap=512).

    ``lazy``/``cap``/``window`` come from EncodeOptions through the
    encode entry points (parity: the reference's builder surface,
    src/deflate/encode.rs:17-128 + DefaultLz77EncoderBuilder); the
    LIBFLATE_DEVICE_GREEDY / LIBFLATE_PARSE_CAP / LIBFLATE_DEVICE_WINDOW
    env vars are A/B overrides filling UNSET (None) knobs — an explicit
    argument (e.g. the overflow re-encode's cap=512) always wins.
    """
    import os
    from .pallas_lz77 import prefix_candidates_pallas
    from .pallas_parse import parse_tokens_pallas
    if lazy is None:
        lazy = os.environ.get("LIBFLATE_DEVICE_GREEDY") != "1"
    if cap is None:
        cap = int(os.environ.get("LIBFLATE_PARSE_CAP", str(PARSE_CAP)))
    if window is None:
        window = int(os.environ.get("LIBFLATE_DEVICE_WINDOW", "32768"))
    if chain is None:
        chain = int(os.environ.get("LIBFLATE_DEVICE_CHAIN", "1"))
    if lcp_rounds is None:
        _lr = os.environ.get("LIBFLATE_LCP_ROUNDS")
        lcp_rounds = int(_lr) if _lr else None
    # default candidate source on real TPUs: sort-based back-scan
    # (exact 4-byte prefix grouping, chain-quality candidates — ratio
    # 0.3260 vs the hash kernel's 0.3395 on the bench corpus, beating
    # the reference's greedy class apples-to-apples; ops/sort_match).
    # LIBFLATE_DEVICE_MATCHER=hash selects the round-3 per-lane
    # hash-table kernel (faster, worse ratio).  CPU interpret runs
    # default to hash — the interpreted bitonic network is minutes-slow
    # at production shapes (sort_match has its own small-shape tests).
    matcher_env = os.environ.get("LIBFLATE_DEVICE_MATCHER")
    m4 = None
    m_exact = 4
    if matcher_env == "sort" or (matcher_env is None and _use_pallas()):
        from .sort_match import M_EXACT, sort_candidates
        cand, m4 = sort_candidates(blocks, window=window)
        m_exact = M_EXACT
    else:
        cand = prefix_candidates_pallas(blocks, window=window)
    n = blocks.shape[1]
    use_kernel = n % 1024 == 0 and os.environ.get(
        "LIBFLATE_XLA_LCP") != "1"
    cand, lengths = _lengths_stage(blocks, n_valid, cand, lazy,
                                   use_kernel, window, chain, m4,
                                   m_exact, lcp_rounds)
    return parse_tokens_pallas(blocks, n_valid, cand, lengths, cap)


def _device_knobs(options) -> dict:
    """EncodeOptions -> device tokenizer kwargs (lazy/cap/window).

    Only knobs the caller actually changed from their defaults are
    passed down, so env-var A/Bs keep working for default options while
    explicitly-set options win over the env vars.
    """
    if options is None:
        return {}
    knobs = {}
    if getattr(options, "parse_cap", None) is not None:
        knobs["cap"] = int(options.parse_cap)
    if getattr(options, "window_size", C.MAX_DISTANCE) != C.MAX_DISTANCE:
        knobs["window"] = int(options.window_size)
    if getattr(options, "lazy", True) is False:
        knobs["lazy"] = False
    if getattr(options, "matcher", "greedy") == "chain":
        knobs["chain"] = max(1, int(getattr(options, "max_chain", 1)))
    if getattr(options, "lcp_rounds", None) is not None:
        knobs["lcp_rounds"] = int(options.lcp_rounds)
    return knobs


def _use_padded_parse(blocks: jnp.ndarray) -> bool:
    from .pallas_lz77 import LANES
    import os
    if blocks.shape[0] != LANES:
        return False
    return (_use_pallas()
            or os.environ.get("LIBFLATE_PALLAS_INTERPRET") == "1")


@functools.partial(jax.jit, static_argnames=("block_type",))
def _fields_batch(a, b, cnt, bfinal, block_type: str):
    from .deflate_encode import encode_block_fields
    return jax.vmap(
        lambda aa, bb, cc, ff: encode_block_fields(aa, bb, cc, ff,
                                                   block_type)
    )(a, b, cnt, bfinal)


@functools.partial(jax.jit, static_argnames=())
def _pack_batch(values, widths):
    from .bitpack import pack_fields
    return jax.vmap(pack_fields)(values, widths)


@functools.partial(jax.jit, static_argnames=())
def _fields_batch_pallas(a, b, cnt, bfinal):
    """Dynamic-block field build with the Pallas token-field kernel.

    Header/code-length fields (≤339 per block) stay in XLA; the
    gather-bound token fields run in pallas_fields.token_fields_pallas.
    """
    from .deflate_encode import (_encoder_tables, dynamic_header_fields,
                                 token_histograms_jax)
    from .huffman import package_merge_lengths
    from .pallas_fields import token_fields_pallas

    bsz, m = a.shape
    lit_freq, dist_freq = jax.vmap(token_histograms_jax)(a, b, cnt)
    lit_lengths = jax.vmap(
        lambda f: package_merge_lengths(f, 15))(lit_freq)
    dist_lengths = jax.vmap(
        lambda f: package_merge_lengths(f, 15))(dist_freq)
    lit_rev, lit_w = jax.vmap(_encoder_tables)(lit_lengths)
    dist_rev, dist_w = jax.vmap(_encoder_tables)(dist_lengths)
    hdrv, hdrw, lenv, lenw = jax.vmap(dynamic_header_fields)(
        lit_lengths, dist_lengths, bfinal)

    pad = (-m) % 1024
    def padm(x):
        return jnp.pad(x, ((0, 0), (0, pad)))
    lit_rev288 = jnp.pad(lit_rev, ((0, 0), (0, 2)))
    lit_w288 = jnp.pad(lit_w, ((0, 0), (0, 2)))
    f1v, f1w, f2v, f2w = token_fields_pallas(
        padm(a), padm(b), cnt, lit_rev288, lit_w288, dist_rev, dist_w)
    f1v, f1w = f1v[:, :m], f1w[:, :m]
    f2v, f2w = f2v[:, :m], f2w[:, :m]

    tokv = jnp.stack([f1v, f2v], axis=2).reshape(bsz, 2 * m)
    tokw = jnp.stack([f1w, f2w], axis=2).reshape(bsz, 2 * m)
    eobv = lit_rev[:, 256:257]
    eobw = lit_w[:, 256:257]
    values = jnp.concatenate([hdrv, lenv, tokv, eobv], axis=1)
    widths = jnp.concatenate([hdrw, lenw, tokw, eobw], axis=1)
    return values, widths


#: shared-table litlen code-length cap.  10 keeps the sync decode
#: kernel's root LUT at 8 lane-shuffle row groups (vs 32 at 12-bit;
#: measured 2.84 vs 2.30 Gtok/s) for a ratio cost of +0.04% on the
#: bench corpus (package-merge redistributes the tail symbols).
SHARED_MAX_LEN = 10


@functools.partial(jax.jit, static_argnames=("max_len", "use_kernel"))
def _shared_stats(a, b, valid, max_len: int = SHARED_MAX_LEN,
                  use_kernel: bool = False):
    """Batch-global histogram → one shared code set + encoder tables.

    ``valid``: (B, M) bool slot mask (padded parse) — compacted callers
    pass ``idx < cnt``.  ``use_kernel`` routes the histogram through the
    Pallas per-lane bin table (ops/pallas_hist) instead of XLA
    scatter-adds (267 ms → ~10 ms per 8 MiB on the v5e).
    """
    from .deflate_encode import _encoder_tables, token_histograms_masked
    from .huffman import package_merge_lengths

    if use_kernel:
        from .pallas_hist import shared_histograms_pallas
        lit_sum, dist_sum = shared_histograms_pallas(a, b, valid)
        lit_freq, dist_freq = lit_sum[None, :], dist_sum[None, :]
    else:
        lit_freq, dist_freq = jax.vmap(token_histograms_masked)(a, b,
                                                                valid)
    lit_lengths = package_merge_lengths(jnp.sum(lit_freq, axis=0), max_len)
    # distance alphabet is 30 symbols: an 8-bit cap costs <0.1% ratio
    # and keeps the decoder's distance root table at 2 lane-shuffle
    # row groups instead of 32
    dist_lengths = package_merge_lengths(jnp.sum(dist_freq, axis=0),
                                         min(max_len, 8))
    lit_rev, lit_w = _encoder_tables(lit_lengths)
    dist_rev, dist_w = _encoder_tables(dist_lengths)
    return lit_lengths, dist_lengths, lit_rev, lit_w, dist_rev, dist_w


@jax.jit
def _shared_header(lit_lengths, dist_lengths):
    from .deflate_encode import dynamic_header_fields
    return dynamic_header_fields(lit_lengths, dist_lengths, jnp.int32(1))


@jax.jit
def _shared_tokens_xla(a, b, valid, lit_rev, lit_w, dist_rev, dist_w):
    from .deflate_encode import token_fields_xla
    return jax.vmap(
        lambda aa, bb, vv: token_fields_xla(
            aa, bb, vv, lit_rev, lit_w, dist_rev, dist_w)
    )(a, b, valid)


@jax.jit
def _shared_assemble(f1v, f1w, f2v, f2w, hdrv, hdrw, lenv, lenw,
                     eob_v, eob_w):
    bsz, m = f1v.shape
    tokv = jnp.stack([f1v, f2v], axis=2).reshape(bsz, 2 * m)
    tokw = jnp.stack([f1w, f2w], axis=2).reshape(bsz, 2 * m)
    rep = lambda t: jnp.broadcast_to(t[None, :], (bsz, t.shape[0]))
    values = jnp.concatenate(
        [rep(hdrv), rep(lenv), tokv,
         jnp.broadcast_to(eob_v[None, None], (bsz, 1))], axis=1)
    widths = jnp.concatenate(
        [rep(hdrw), rep(lenw), tokw,
         jnp.broadcast_to(eob_w[None, None], (bsz, 1))], axis=1)
    return values, widths


@jax.jit
def _shared_tokens_kernel(a, b, valid, lit_rev, lit_w, dist_rev,
                          dist_w, hdrv, hdrw, lenv, lenw):
    """Hole-mask + pad + table broadcast + pallas token fields + field
    assembly under ONE jit — op-by-op eager glue between the jitted
    pieces measured ~5 ms of per-dispatch overhead per 8 MiB batch on
    the axon relay (half the fields stage)."""
    from .pallas_fields import token_fields_pallas

    bsz, m = a.shape
    pad = (-m) % 1024
    padm = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
    rep = lambda t, n: jnp.broadcast_to(t[None, :], (bsz, n))
    a_holes = jnp.where(valid, a, -1)     # hole sentinel for kernel
    f1v, f1w, f2v, f2w = token_fields_pallas(
        padm(a_holes), padm(b), jnp.full((bsz,), m, jnp.int32),
        rep(jnp.pad(lit_rev, (0, 2)), 288),
        rep(jnp.pad(lit_w, (0, 2)), 288),
        rep(dist_rev, 30), rep(dist_w, 30))
    return _shared_assemble(f1v[:, :m], f1w[:, :m], f2v[:, :m],
                            f2w[:, :m], hdrv, hdrw, lenv, lenw,
                            lit_rev[256], lit_w[256])


@jax.jit
def _valid_from_count(a, cnt):
    m = a.shape[1]
    return jnp.arange(m, dtype=jnp.int32)[None, :] < cnt[:, None]


def _fields_batch_shared(a, b, cnt, bfinal, max_len: int = SHARED_MAX_LEN,
                         valid=None):
    """Field build with ONE shared Huffman table for the whole batch.

    The batch-global histogram yields a single litlen/dist code set that
    every member's header transmits identically (streams stay 100%
    standard; headers across members become byte-identical).  This is
    the encode half of the "broadcast shared code tables" design: the
    decoder detects identical headers and runs the shared-table
    speculative kernel.  ``max_len`` (SHARED_MAX_LEN) bounds code
    length so decode root tables stay lane-shuffle-sized; ratio cost
    of the cap is ≈0.04-1%.

    ``valid``: optional (B, M) slot mask for padded stream-order tokens
    (pallas_parse); None means the compacted ``idx < cnt`` layout.

    Split into several small jits — one fused graph costs minutes of
    XLA TPU compile time (see _encode_batch).
    """
    bsz, m = a.shape
    del bfinal  # every member is one final block; header assumes BFINAL=1
    if valid is None:
        valid = _valid_from_count(a, cnt)
    (lit_lengths, dist_lengths, lit_rev, lit_w,
     dist_rev, dist_w) = _shared_stats(a, b, valid, max_len,
                                       _use_pallas())
    hdrv, hdrw, lenv, lenw = _shared_header(lit_lengths, dist_lengths)

    if _use_pallas():
        return _shared_tokens_kernel(a, b, valid, lit_rev, lit_w,
                                     dist_rev, dist_w, hdrv, hdrw,
                                     lenv, lenw)
    f1v, f1w, f2v, f2w = _shared_tokens_xla(a, b, valid, lit_rev,
                                            lit_w, dist_rev, dist_w)
    return _shared_assemble(f1v, f1w, f2v, f2w, hdrv, hdrw, lenv, lenw,
                            lit_rev[256], lit_w[256])


def _use_pallas() -> bool:
    import os
    if os.environ.get("LIBFLATE_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _encode_batch(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                  bfinal: jnp.ndarray, block_type: str):
    """(B, n) uint8 blocks → (B, W) uint32 words + (B,) bit counts.

    Three separate jit stages (tokenize / field build / bit pack): one
    fused graph sends XLA-TPU compile time pathological (≈390 s for a
    64 KiB block vs ≈20 s split), while steady-state cost is identical.
    """
    if block_type == "shared" and _use_padded_parse(blocks):
        # cap=512 here: this entry point has no overflow-fallback plumbing
        a, b, valid, cnt, _ovf = _tokenize_padded(blocks, n_valid,
                                                  cap=512)
        values, widths = _fields_batch_shared(a, b, cnt, bfinal,
                                              valid=valid)
        return _pack_batch(values, widths)
    a, b, cnt = _tokenize_batch_any(blocks, n_valid)
    if block_type == "shared":
        values, widths = _fields_batch_shared(a, b, cnt, bfinal)
    elif block_type == "dynamic" and _use_pallas():
        values, widths = _fields_batch_pallas(a, b, cnt, bfinal)
    else:
        values, widths = _fields_batch(a, b, cnt, bfinal, block_type)
    return _pack_batch(values, widths)


@functools.partial(jax.jit, static_argnames=("k",))
def _sync_offsets_batch(widths: jnp.ndarray, k: int):
    """Bit offsets of every k-th token boundary from the field widths.

    In the shared/dynamic field layout, token t occupies fields
    [F0 + 2t, F0 + 2t + 2) with F0 = N_HEADER_FIELDS + N_LENGTH_FIELDS.
    Returns (B, S) int32 absolute bit offsets of tokens 0, k, 2k, …
    (S = ceil(max_tokens / k) + 1; entries past a member's token count
    saturate at the end-of-tokens offset).
    """
    from .deflate_encode import N_HEADER_FIELDS, N_LENGTH_FIELDS
    f0 = N_HEADER_FIELDS + N_LENGTH_FIELDS
    m = (widths.shape[1] - f0 - 1) // 2
    slots = -(-m // k) + 1
    idx = f0 + 2 * k * jnp.arange(slots, dtype=jnp.int32)
    idx = jnp.clip(idx, 1, widths.shape[1])
    cum = jnp.cumsum(widths.astype(jnp.int32), axis=1)
    return cum[:, idx - 1]                   # offset of field f = cum[f-1]


@functools.partial(jax.jit, static_argnames=())
def _pack_chunks_device(values: jnp.ndarray, widths: jnp.ndarray):
    """Kernel-backed pack: assembled fields → per-chunk word columns.

    Cuts each member's field stream (header + tokens + EOB — every
    interleaved pair is <= 38 bits under the shared 12/8 code caps)
    into 512-field slot-chunks and packs 1024 of them per grid program
    (ops/pallas_pack).  Returns (cols (B, n_ch, D_OUT) int32 word
    columns, starts (B, n_ch+1) int32 absolute bit offsets, bits (B,)):
    chunk j's words OR into the member stream at word starts[j] >> 5
    (the kernel pre-aligns to starts[j] & 31; boundary words overlap by
    construction and OR cleanly).
    """
    from .pallas_pack import F_CH, SLOTS, pack_slots
    bsz, m = values.shape
    m_pad = -(-m // F_CH) * F_CH
    pad = m_pad - m
    v = jnp.pad(values.astype(jnp.int32), ((0, 0), (0, pad)))
    w = jnp.pad(widths.astype(jnp.int32), ((0, 0), (0, pad)))
    n_ch = m_pad // F_CH

    cum = jnp.cumsum(w, axis=1)
    bits = cum[:, -1]
    idx = F_CH * jnp.arange(n_ch, dtype=jnp.int32)
    starts0 = jnp.where(idx > 0, cum[:, jnp.maximum(idx - 1, 0)], 0)
    starts = jnp.concatenate([starts0, bits[:, None]], axis=1)

    s_n = bsz * n_ch
    s_pad = -(-s_n // SLOTS) * SLOTS
    fv = v.reshape(s_n, F_CH)
    fw = w.reshape(s_n, F_CH)
    k0 = (starts[:, :n_ch] & 31).reshape(s_n)
    if s_pad != s_n:
        fv = jnp.pad(fv, ((0, s_pad - s_n), (0, 0)))
        fw = jnp.pad(fw, ((0, s_pad - s_n), (0, 0)))
        k0 = jnp.pad(k0, (0, s_pad - s_n))
    cols = pack_slots(fv, fw, k0)[:s_n]
    return cols.reshape(bsz, n_ch, -1), starts, bits


@functools.partial(jax.jit, static_argnames=("w_out",))
def _stitch_cols_device(cols: jnp.ndarray, word0: jnp.ndarray,
                        w_out: int) -> jnp.ndarray:
    """Device stitch: OR chunk word columns into member word rows.

    Every output word's contributions occupy disjoint bit ranges (each
    chunk writes only bits [start_j, end_j) of its aligned words and
    zeros elsewhere), so a scatter-ADD is exactly OR — and word-level
    scatter is ~60x fewer elements than the XLA field-level pack.

    cols: (B, n_ch, nw) int32 (ops/pallas_pack columns, sliced to the
    widest real chunk); word0: (B, n_ch) int32 = starts >> 5.
    Returns (B, w_out) uint32 member word rows.
    """
    bsz, n_ch, nw = cols.shape
    idx = word0[:, :, None] + jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    out = jnp.zeros((bsz, w_out), jnp.uint32)
    b_idx = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None, None], idx.shape)
    return out.at[b_idx, idx].add(cols.astype(jnp.uint32), mode="drop")


def stitch_chunk_cols(cols: np.ndarray, starts: np.ndarray,
                      bits: np.ndarray) -> np.ndarray:
    """Host stitch: OR each chunk column into its member's word row.

    cols: (B, n_ch, nw) uint32/int32 (word q of chunk j = bits
    [32q, 32(q+1)) of the chunk's aligned stream — zero outside the
    chunk's [starts[j] & 31, +extent) bit range).  starts: (B, n_ch+1)
    absolute bit offsets; bits: (B,) total bits.  Returns (B, W)
    uint32 member word rows (splice_blocks_host input layout).
    """
    cols = cols.astype(np.uint32, copy=False)
    bsz, n_ch, nw = cols.shape
    w_out = int((int(bits.max(initial=0)) + 31) // 32) + 1
    out = np.zeros((bsz, w_out), np.uint32)
    word0 = (starts[:, :n_ch].astype(np.int64) >> 5)
    for i in range(bsz):
        for j in range(n_ch):
            if starts[i, j] >= starts[i, j + 1]:
                continue
            b0 = int(word0[i, j])
            n = min(int((int(starts[i, j + 1]) + 31) // 32) - b0, nw)
            out[i, b0:b0 + n] |= cols[i, j, :n]
    return out


@functools.partial(jax.jit, static_argnames=("k", "cap"))
def _sync_offsets_padded(widths: jnp.ndarray, valid: jnp.ndarray,
                         k: int, cap: int | None = None):
    """Sync offsets for the padded stream-order token layout.

    Exploits the parse-kernel invariant that a chunk's valid tokens
    occupy a PREFIX of its ``cap`` slots (ops/pallas_parse walk-emit):
    the k·j-th token's chunk comes from a searchsorted over the tiny
    per-chunk counts and its slot is chunk_base + within-chunk rank —
    no 8M-element valid cumsum, and the width cumsum runs per chunk
    (axis 2·cap) instead of over the whole field row.  Saturates at
    the end-of-tokens offset like _sync_offsets_batch.  Falls back to
    the generic full-cumsum path when ``cap`` is unknown.
    """
    from .deflate_encode import N_HEADER_FIELDS, N_LENGTH_FIELDS
    f0 = N_HEADER_FIELDS + N_LENGTH_FIELDS
    bsz, m = valid.shape
    slots = -(-m // k) + 1
    if cap is None or m % cap or widths.shape[1] < f0 + 2 * m:
        cum = jnp.cumsum(widths.astype(jnp.int32), axis=1)
        cv = jnp.cumsum(valid.astype(jnp.int32), axis=1)
        targets = k * jnp.arange(slots, dtype=jnp.int32) + 1
        slot_idx = jax.vmap(
            lambda c: jnp.searchsorted(c, targets, side="left"))(cv)
        fidx = jnp.clip(f0 + 2 * slot_idx, 1, widths.shape[1])
        return jnp.take_along_axis(cum, fidx - 1, axis=1)

    nc = m // cap
    w32 = widths.astype(jnp.int32)
    cnt_c = jnp.sum(valid.reshape(bsz, nc, cap), axis=2,
                    dtype=jnp.int32)
    cum_c = jnp.cumsum(cnt_c, axis=1)
    total = cum_c[:, -1:]
    t = (k * jnp.arange(slots, dtype=jnp.int32))[None, :]
    c_j = jax.vmap(
        lambda cc: jnp.searchsorted(cc, t[0], side="right"))(cum_c)
    c_j = jnp.minimum(c_j, nc - 1)
    prev = jnp.where(
        c_j > 0,
        jnp.take_along_axis(cum_c, jnp.maximum(c_j - 1, 0), axis=1), 0)
    r_j = jnp.clip(t - prev, 0, cap)

    wch = w32[:, f0:f0 + 2 * m].reshape(bsz, nc, 2 * cap)
    cumw = jnp.cumsum(wch, axis=2)
    chunk_bits = cumw[:, :, -1]
    hdr = jnp.sum(w32[:, :f0], axis=1, keepdims=True)
    chunk_start = hdr + jnp.cumsum(chunk_bits, axis=1) - chunk_bits
    flat = cumw.reshape(bsz, nc * 2 * cap)
    within = jnp.where(
        r_j > 0,
        jnp.take_along_axis(
            flat,
            jnp.clip(c_j * 2 * cap + 2 * r_j - 1, 0,
                     nc * 2 * cap - 1), axis=1), 0)
    off = jnp.take_along_axis(chunk_start, c_j, axis=1) + within
    # past-the-end targets saturate at the end-of-tokens offset
    # (before the trailing EOB field — the generic path's cum at
    # fidx = f0 + 2m)
    end = (jnp.sum(w32[:, :f0], axis=1, keepdims=True)
           + jnp.sum(chunk_bits, axis=1, keepdims=True))
    return jnp.where(t >= total, end, off)


def _encode_batch_sync(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                       bfinal: jnp.ndarray, k: int,
                       cap: int | None = None,
                       lazy: bool | None = None,
                       window: int | None = None,
                       chain: int | None = None,
                       lcp_rounds: int | None = None):
    """Shared-table batch encode that also returns the sync index.

    Returns (words (B, W), bits (B,), n_tokens (B,), offsets (B, S),
    overflow (B,)) — ``offsets[i, j]`` is the absolute bit position of
    member i's token ``k*j`` (the input to the PGZF "LS" subfield /
    sync decode kernel); ``overflow`` flags members whose parse
    exceeded the per-chunk slot budget (their words/bits are
    INCOMPLETE — re-encode them with cap=512).
    """
    if _use_padded_parse(blocks):
        a, b, valid, cnt, ovf = _tokenize_padded(blocks, n_valid,
                                                 lazy=lazy, cap=cap,
                                                 window=window,
                                                 chain=chain,
                                                 lcp_rounds=lcp_rounds)
        values, widths = _fields_batch_shared(a, b, cnt, bfinal,
                                              valid=valid)
        words, bits = _pack_batch(values, widths)
        cap_eff = valid.shape[1] * 512 // blocks.shape[1]
        offsets = _sync_offsets_padded(widths, valid, k, cap_eff)
        return words, bits, cnt, offsets, ovf
    a, b, cnt = _tokenize_batch_any(blocks, n_valid)
    values, widths = _fields_batch_shared(a, b, cnt, bfinal)
    words, bits = _pack_batch(values, widths)
    offsets = _sync_offsets_batch(widths, k)
    return words, bits, cnt, offsets, jnp.zeros(
        (blocks.shape[0],), jnp.bool_)


@jax.jit
def _pack_small(bits, cnt, crc_f, ovf, offsets):
    """Pack the per-member scalar outputs into ONE device array.

    Every host read of a device array pays a full tunnel round trip in
    this container (~28 ms); bits/counts/CRCs/overflow/sync-offsets
    together are a few KiB, so one packed (B, 4+S) int32 D2H replaces
    five.
    """
    return jnp.concatenate(
        [bits.astype(jnp.int32)[:, None], cnt.astype(jnp.int32)[:, None],
         crc_f[:, None], ovf.astype(jnp.int32)[:, None],
         offsets.astype(jnp.int32)], axis=1)


def _use_pack_kernel() -> bool:
    """Pallas slot-pack + device stitch (default) vs the XLA scatter
    pack.  Byte-identical; measured 52 ms vs 156 ms kernel-side and
    0.38 s vs 0.44 s e2e per 8 MiB (LIBFLATE_PACK_KERNEL=0 opts out)."""
    import os
    return os.environ.get("LIBFLATE_PACK_KERNEL", "1") != "0"


def use_cols_encoder(blocks) -> bool:
    """True when _encode_batch_sync_cols should handle this batch:
    the pack kernel is enabled AND the padded Pallas parse it builds
    on is available (real TPU, or CPU interpret mode)."""
    return _use_pack_kernel() and _use_padded_parse(blocks)


def _encode_batch_sync_cols(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                            bfinal: jnp.ndarray, k: int,
                            cap: int | None = None,
                            lazy: bool | None = None,
                            window: int | None = None,
                            chain: int | None = None,
                            lcp_rounds: int | None = None):
    """Shared-table sync encode via the Pallas pack kernel.

    Like _encode_batch_sync_packed but the bit pack runs in
    ops/pallas_pack (masked-sweep slot packer) instead of the XLA
    scatter; the words come back as per-chunk COLUMNS for the host to
    stitch (ops.pipeline.stitch_chunk_cols).

    Returns (cols (B, n_ch, D_OUT), small (B, 4 + S + n_ch + 1)) with
    small rows = [bits, n_tokens, crc_f_raw, overflow,
    sync_offsets x S, chunk_starts x (n_ch + 1)].
    """
    a, b, valid, cnt, ovf = _tokenize_padded(blocks, n_valid, lazy=lazy,
                                             cap=cap, window=window,
                                             chain=chain,
                                             lcp_rounds=lcp_rounds)
    values, widths = _fields_batch_shared(a, b, cnt, bfinal,
                                          valid=valid)
    cols, starts, bits = _pack_chunks_device(values, widths)
    small = _sync_cols_tail(blocks, widths, valid, bits, cnt, ovf,
                            starts, k)
    return cols, small


@functools.partial(jax.jit, static_argnames=("k",))
def _sync_cols_tail(blocks, widths, valid, bits, cnt, ovf, starts, k):
    """Overflow flags + sync offsets + member CRCs + the packed small
    row, under one jit (eager glue costs ~0.5 ms per op on the relay).

    Pack-kernel invariant (ops/pallas_pack.d_out_for sizing): single
    field <= 28 bits and every adjacent pair <= 38, else flushed words
    can silently fall past the column depth.  Surfaced as bit 1 of the
    overflow flag; the host raises instead of emitting a corrupt
    stream (reference parity: debug_assert! in src/bit.rs:26-27)."""
    from .checksum import crc32_f_rows
    wbad = (jnp.any(widths > 28, axis=1)
            | jnp.any(widths[:, :-1] + widths[:, 1:] > 38, axis=1))
    flags = ovf.astype(jnp.int32) | (wbad.astype(jnp.int32) << 1)
    cap_eff = valid.shape[1] * 512 // blocks.shape[1]
    offsets = _sync_offsets_padded(widths, valid, k, cap_eff)
    crc_f = crc32_f_rows(blocks)
    return jnp.concatenate(
        [bits.astype(jnp.int32)[:, None],
         cnt.astype(jnp.int32)[:, None], crc_f[:, None],
         flags[:, None], offsets.astype(jnp.int32),
         starts.astype(jnp.int32)], axis=1)


def _encode_batch_sync_packed(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                              bfinal: jnp.ndarray, k: int,
                              cap: int | None = None,
                              lazy: bool | None = None,
                              window: int | None = None,
                              chain: int | None = None,
                              lcp_rounds: int | None = None):
    """_encode_batch_sync + fused member CRCs, small outputs packed.

    Returns (words (B, W) uint32, small (B, 4+S) int32) with small rows
    = [bits, n_tokens, crc_f_raw, overflow, sync_offsets...].  The CRC
    f-values are computed over the full zero-padded rows already
    resident on device (no host re-staging, no second H2D); the caller
    folds the padding out with ops.checksum.crc32_from_padded_f.
    Members with overflow=1 must be re-encoded at cap=512.
    """
    from .checksum import crc32_f_rows
    words, bits, cnt, offsets, ovf = _encode_batch_sync(
        blocks, n_valid, bfinal, k, cap, lazy=lazy, window=window,
        chain=chain, lcp_rounds=lcp_rounds)
    crc_f = crc32_f_rows(blocks)
    return words, _pack_small(bits, cnt, crc_f, ovf, offsets)


@functools.partial(jax.jit, static_argnames=("block_type",))
def _encode_batch_literal(blocks: jnp.ndarray, n_valid: jnp.ndarray,
                          bfinal: jnp.ndarray, block_type: str):
    """Literal-only (no LZ77) batch encode — parity with matcher='none'."""
    n = blocks.shape[1]

    def one(block, nv, bf):
        a = block.astype(jnp.int32)
        b = jnp.zeros((n,), jnp.int32)
        return encode_block(a, b, nv, bf, block_type)

    return jax.vmap(one)(blocks, n_valid, bfinal)


def deflate_device(data: bytes, options=None,
                   device_block_size: int | None = None) -> bytes:
    """Compress to a complete raw DEFLATE stream on the device."""
    from ..serial.deflate import EncodeOptions
    opts = options or EncodeOptions()
    if opts.block_type == "stored":
        from ..serial.deflate import deflate as _serial_deflate
        return _serial_deflate(bytes(data), opts)

    raw = np.frombuffer(bytes(data), np.uint8)
    bs = min(opts.block_size, device_block_size or DEVICE_BLOCK_SIZE)
    n_blocks = max(1, -(-len(raw) // bs))
    b_pad = 1 << (n_blocks - 1).bit_length()

    blocks = np.zeros((b_pad, bs), np.uint8)
    n_valid = np.zeros((b_pad,), np.int32)
    for i in range(n_blocks):
        chunk = raw[i * bs:(i + 1) * bs]
        blocks[i, :len(chunk)] = chunk
        n_valid[i] = len(chunk)
    bfinal = np.zeros((b_pad,), np.int32)
    bfinal[n_blocks - 1] = 1

    fn = (_encode_batch_literal if opts.matcher == "none"
          else _encode_batch)
    words, bits = fn(jnp.asarray(blocks), jnp.asarray(n_valid),
                     jnp.asarray(bfinal), opts.block_type)
    words = np.asarray(words[:n_blocks])
    bits = np.asarray(bits[:n_blocks])
    return splice_blocks_host(words, bits)


def _register_engine() -> None:
    from .. import backend
    from ..utils import checksum as ck
    from .checksum import adler32_jax, crc32_jax

    def _crc32(data, crc=0):
        arr = jnp.asarray(np.frombuffer(bytes(data), np.uint8))
        v = int(crc32_jax(arr))
        if crc:
            v = ck.crc32_combine(crc, v, len(data))
        return v

    def _adler32(data, adler=1):
        arr = jnp.asarray(np.frombuffer(bytes(data), np.uint8))
        v = int(adler32_jax(arr))
        if adler != 1:
            v = ck.adler32_combine(adler, v, len(data))
        return v

    from .deflate_decode import inflate_device

    backend.register(backend.Engine(
        name="tpu",
        deflate=lambda data, opts=None: deflate_device(bytes(data), opts),
        inflate=lambda data: inflate_device(bytes(data)),
        crc32=_crc32,
        adler32=_adler32,
    ))


_register_engine()
