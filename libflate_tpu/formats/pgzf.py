"""PGZF — parallel gzip: multi-member gzip with a member-size index.

The TPU framework's scale-out container.  Input is split into fixed-size
chunks; every chunk becomes an independent, fully standard gzip member
whose header carries an EXTRA subfield (id ``b"LF"``, payload = u32 LE
total member byte length).  Properties:

* **100% gzip-compatible** — any stock tool (or the reference's
  MultiDecoder, src/gzip.rs:1052-1167) decodes a PGZF stream unchanged;
  the index subfield rides the standard FEXTRA mechanism
  (≙ ExtraField, src/gzip.rs:466-541).  Same trick as htslib's BGZF.
* **Boundary discovery without decoding** — member starts are found by
  jumping sizes, so decode parallelizes across members (chips, cores,
  lanes) with zero speculation.
* **Per-member CRC/ISIZE** keeps fault isolation: a corrupt shard is
  detected and reported by member index.

Encode: members are tokenized + entropy-coded as one batched device
call; CRCs are computed by the batched GF(2) kernel; headers/trailers
are assembled on the host (byte-scale work).
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

from ..spec import constants as C
from . import gzip as fgzip

INDEX_ID = b"LF"
SYNC_ID = b"LS"
DEFAULT_MEMBER_SIZE = 64 * 1024


def _member_header(member_len_placeholder: int, mtime: int = 0,
                   sync_payload: bytes | None = None) -> bytes:
    """Indexed member header: LF (member size) + optional LS (sync index).

    LF must stay first — its u32 size slot sits at a fixed offset
    (_SIZE_OFFSET) so the assembled member can be patched in place."""
    subs = [fgzip.ExtraSubField(INDEX_ID,
                                struct.pack("<I", member_len_placeholder))]
    if sync_payload is not None:
        subs.append(fgzip.ExtraSubField(SYNC_ID, sync_payload))
    hdr = fgzip.Header(mtime=mtime, os=C.GZIP_OS_UNIX,
                       extra=fgzip.ExtraField(subs))
    return hdr.encode()


_HEADER_LEN = len(_member_header(0))
_SIZE_OFFSET = _HEADER_LEN - 4          # u32 sits at the end of EXTRA


def _sync_payload(k: int, n_tokens: int, offsets: np.ndarray) -> bytes:
    """Serialize the "LS" sync-index subfield.

    Layout (LE): u8 version=1 | u8 flags=0 | u16 K | u32 n_tokens |
    u32 first_bit | u16 n_chunks | u16 deltas[n_chunks-1] — deltas are
    bit distances between consecutive chunk starts (each covers K
    tokens; max 42-bit tokens keep K*42 < 2^16 for K <= 1024).
    """
    n_chunks = max(0, -(-n_tokens // k))
    first_bit = int(offsets[0])
    deltas64 = (np.diff(offsets[:n_chunks]).astype(np.int64)
                if n_chunks > 1 else np.zeros(0, np.int64))
    if len(deltas64) and int(deltas64.max()) > 0xFFFF:
        # cannot happen for this encoder (K*42-bit worst-case symbols
        # < 2^16 for K <= 1024) — guard against silent u16 wrap anyway
        return None
    return (struct.pack("<BBHIIH", 1, 0, k, n_tokens, first_bit, n_chunks)
            + deltas64.astype("<u2").tobytes())


def _chunk_spans(sync, ref: "MemberRef"):
    """Validated chunk spans for one member's LS index.

    Returns (starts, ends, counts) int64 arrays of bit offsets relative
    to the member body / token counts per chunk.  Raises ImportError on
    a corrupt or empty index (callers fall back to non-sync paths).
    """
    k, n_tokens, first_bit, n_chunks, deltas = sync
    body_bits = (ref.end - 8 - ref.body) * 8
    if n_chunks <= 0 or n_tokens <= 0 or n_chunks != -(-n_tokens // k):
        raise ImportError("empty or inconsistent sync index")
    starts = np.zeros(n_chunks, np.int64)
    starts[0] = first_bit
    if n_chunks > 1:
        starts[1:] = first_bit + np.cumsum(deltas.astype(np.int64))
    ends = np.empty(n_chunks, np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = body_bits
    if (ends < starts).any() or starts[-1] >= body_bits:
        raise ImportError("corrupt sync index")
    counts = np.minimum(k, n_tokens - k * np.arange(n_chunks, dtype=np.int64))
    return starts, ends, counts


def _tracer():
    """StageTimer when LIBFLATE_TRACE is set (utils.profiling); else None."""
    import os
    if not os.environ.get("LIBFLATE_TRACE"):
        return None
    from ..utils.profiling import StageTimer
    return StageTimer()


def _maybe_stage(timer, name: str):
    import contextlib
    return timer.stage(name) if timer else contextlib.nullcontext()


def _trace_report(timer, label: str) -> None:
    if timer:
        import sys
        print(f"[libflate-trace] {label}\n{timer.report()}",
              file=sys.stderr, flush=True)


def _maybe_jax_trace():
    """LIBFLATE_TRACE=jax wraps the codec call in a jax.profiler trace
    (SURVEY §5 tracing parity; view with TensorBoard/xprof at
    LIBFLATE_TRACE_DIR or /tmp/libflate_trace).  Any other value keeps
    the lightweight wall-clock StageTimer only."""
    import contextlib
    if os.environ.get("LIBFLATE_TRACE") != "jax":
        return contextlib.nullcontext()
    from ..utils.profiling import device_trace
    return device_trace(os.environ.get("LIBFLATE_TRACE_DIR",
                                       "/tmp/libflate_trace"))


def _parse_sync(hdr: "fgzip.Header"):
    """Parse an LS subfield; None when absent/foreign/malformed."""
    if hdr.extra is None:
        return None
    for sub in hdr.extra.subfields:
        if sub.id != SYNC_ID or len(sub.data) < 14:
            continue
        ver, _flags, k, n_tokens, first_bit, n_chunks = struct.unpack_from(
            "<BBHIIH", sub.data, 0)
        if ver != 1 or k == 0 or k > 1024:
            return None
        if len(sub.data) != 14 + 2 * max(0, n_chunks - 1):
            return None
        deltas = np.frombuffer(sub.data, "<u2", offset=14)
        return k, n_tokens, first_bit, n_chunks, deltas
    return None


def compress(data: bytes, member_size: int = DEFAULT_MEMBER_SIZE,
             options=None, engine: str | None = None,
             n_threads: int = 0) -> bytes:
    """Compress into an indexed multi-member gzip stream.

    Engines: "tpu" (device block-parallel), "native" (threaded C++),
    None/"auto" (native if available, else device, else serial).

    Example (any stock gzip tool can read the result, and decode
    parallelizes over members):

        >>> data = b"to be or not to be, " * 4096
        >>> stream = compress(data, member_size=16 * 1024)
        >>> decompress(stream) == data
        True
        >>> import gzip as stdgz                  # stock-tool check
        >>> stdgz.decompress(stream) == data
        True
    """
    data = bytes(data)
    # default: lazy + hash-chain matching at depth 128 (zlib-6-class;
    # ratio 0.298 on the bench corpus, under libflate's 0.300 published
    # ratio while ~4x its encode speed).  matcher="greedy" matches the
    # reference's single-candidate strategy, matcher="lazy" is the
    # chainless middle ground, matcher="chain" honours options.max_chain.
    matcher = getattr(options, "matcher", "") if options else ""
    lazy = matcher != "greedy"
    if matcher == "chain":
        max_chain = getattr(options, "max_chain", 128)
    elif matcher in ("greedy", "lazy"):
        max_chain = 1
    else:
        max_chain = 128
    if engine in ("native", None, "auto"):
        try:
            return _compress_native(data, member_size, n_threads, lazy,
                                    max_chain)
        except ImportError:
            pass
    if engine in ("tpu", None, "auto"):
        try:
            with _maybe_jax_trace():
                return _compress_device(data, member_size, options)
        except ImportError:
            pass
    chunks = [data[i:i + member_size]
              for i in range(0, max(len(data), 1), member_size)]
    out = bytearray()
    for chunk in chunks:
        body = fgzip.compress(chunk, options=options, engine=engine)
        # re-wrap with indexed header
        member = _reheader(body, chunk)
        out += member
    return bytes(out)


def _compress_native(data: bytes, member_size: int,
                     n_threads: int = 0, lazy: bool = False,
                     max_chain: int = 1) -> bytes:
    from .. import native
    if not native.available():
        raise ImportError("native engine unavailable")
    n = len(data)
    n_members = max(1, -(-n // member_size))
    offs = np.zeros(n_members + 1, np.uint64)
    for i in range(n_members):
        offs[i + 1] = min(n, (i + 1) * member_size)
    bodies, crcs = native.deflate_batch(data, offs, n_threads=n_threads,
                                        lazy=lazy, max_chain=max_chain)
    out = bytearray()
    for i in range(n_members):
        nv = int(offs[i + 1] - offs[i])
        member = bytearray(_member_header(0))
        member += bodies[i]
        member += struct.pack("<II", int(crcs[i]), nv)
        struct.pack_into("<I", member, _SIZE_OFFSET, len(member))
        out += member
    return bytes(out)


def _reheader(plain_gzip: bytes, chunk: bytes) -> bytes:
    # strip the 10-byte plain header, prepend indexed header, patch size
    payload = plain_gzip[10:]
    member = bytearray(_member_header(0) + payload)
    struct.pack_into("<I", member, _SIZE_OFFSET, len(member))
    return bytes(member)


def _compress_device(data: bytes, member_size: int, options) -> bytes:
    import jax.numpy as jnp

    from ..ops.checksum import crc32_batch_jax
    from ..ops.deflate_encode import splice_blocks_host
    from ..ops.pipeline import _encode_batch
    from ..serial.deflate import EncodeOptions

    opts = options or EncodeOptions()
    if opts.matcher == "none" or opts.block_type == "stored":
        raise ImportError("device path handles compressed members only")

    n = len(data)
    raw = np.frombuffer(data, np.uint8)
    n_members = max(1, -(-n // member_size))
    # fixed device batch: every call compiles exactly one shape, reused
    # for any input size (unbounded shapes made XLA recompile per size).
    # 128 = the decode kernel's lane count, so one encode batch = one
    # decode group = one shared Huffman table.
    DEV_BATCH = 128
    n_batches = -(-n_members // DEV_BATCH)
    b_pad = n_batches * DEV_BATCH

    blocks = np.zeros((b_pad, member_size), np.uint8)
    n_valid = np.zeros((b_pad,), np.int32)
    for i in range(n_members):
        chunk = raw[i * member_size:(i + 1) * member_size]
        blocks[i, :len(chunk)] = chunk
        n_valid[i] = len(chunk)
    bfinal = np.ones((DEV_BATCH,), np.int32)  # every member: 1 final block

    # shared-table mode: one batch-global Huffman code set, transmitted
    # identically in every member header — enables the shared-table
    # parallel decoders while staying 100% standard gzip.  The member
    # -level stored fallback below covers incompressible chunks.
    btype = "shared" if opts.block_type == "dynamic" else opts.block_type
    sync = btype == "shared"
    words_l, bits_l, crcs_l, cnt_l, offs_l = [], [], [], [], []
    bfinal_j = jnp.asarray(bfinal)

    from ..ops.pipeline import _device_knobs
    knobs = _device_knobs(opts)

    def _dispatch(g):
        """Launch batch g's device compute (async dispatch)."""
        sl = slice(g * DEV_BATCH, (g + 1) * DEV_BATCH)
        if sync:
            from ..ops.pallas_sync_decode import SYNC_TOKENS
            from ..ops.pipeline import (_encode_batch_sync_cols,
                                        _encode_batch_sync_packed,
                                        use_cols_encoder)
            blocks_j = jnp.asarray(blocks[sl])
            kernel_pack = use_cols_encoder(blocks_j)
            enc = (_encode_batch_sync_cols if kernel_pack
                   else _encode_batch_sync_packed)
            return enc(blocks_j, jnp.asarray(n_valid[sl]), bfinal_j,
                       SYNC_TOKENS, **knobs)
        return _encode_batch(jnp.asarray(blocks[sl]),
                             jnp.asarray(n_valid[sl]), bfinal_j, btype)

    # Double-buffered dispatch/drain: batch g+1's device compute
    # overlaps batch g's D2H drain, and at most TWO batches' worst-case
    # device buffers (~5x input bytes each) are live — dispatching every
    # batch up front made device memory linear in input size.
    from ..ops.checksum import crc32_from_padded_f
    pend = {0: _dispatch(0)} if n_batches else {}
    for g in range(n_batches):
        if g + 1 < n_batches:
            pend[g + 1] = _dispatch(g + 1)
        sl = slice(g * DEV_BATCH, (g + 1) * DEV_BATCH)
        w, rest = pend.pop(g)
        if sync:
            from ..ops.pipeline import (_stitch_cols_device,
                                        use_cols_encoder)
            kernel_pack = use_cols_encoder(blocks[sl])
            small = np.asarray(rest)
            if (small[:, 3] & 1).any():
                # a literal-dense member blew the per-chunk token-slot
                # budget (ops/pipeline.PARSE_CAP): its words are
                # incomplete.  Re-encode the batch at cap=512, which a
                # 512-position chunk can never overflow.
                from ..ops.pallas_sync_decode import SYNC_TOKENS
                from ..ops.pipeline import (_encode_batch_sync_cols,
                                            _encode_batch_sync_packed)
                enc = (_encode_batch_sync_cols if kernel_pack
                       else _encode_batch_sync_packed)
                w, small_d = enc(
                    jnp.asarray(blocks[sl]), jnp.asarray(n_valid[sl]),
                    bfinal_j, SYNC_TOKENS,
                    **{**knobs, "cap": 512})
                small = np.asarray(small_d)
            if (small[:, 3] & 2).any():
                # a field wider than the pack kernel's d_out sizing
                # invariant (ops/pallas_pack.d_out_for) — would corrupt
                # the stream silently; fail loudly instead
                from ..serial.deflate import DeflateError
                raise DeflateError(
                    "internal: field width exceeds the pack kernel's "
                    "slot-depth invariant (single field > 28 bits or "
                    "adjacent pair > 38)")
            bts_np = small[:, 0]
            cnt_l.append(small[:, 1])
            crcs_l.append(crc32_from_padded_f(small[:, 2], n_valid[sl],
                                              member_size))
            if kernel_pack:
                # per-chunk word columns: slice to the widest REAL
                # chunk (columns are worst-case deep), then OR them
                # into member word rows on device; `w` falls through
                # to the common sliced-words D2H below
                n_ch = w.shape[1]
                starts = small[:, -(n_ch + 1):].astype(np.int64)
                offs_l.append(small[:, 4:-(n_ch + 1)])
                word0 = starts[:, :n_ch] >> 5
                nw = int(np.max(np.maximum(
                    (starts[:, 1:] + 31) // 32 - word0, 0), initial=1))
                # 16-word shape buckets: the stitch scatter cost is
                # linear in n_ch*nw, and real chunk spans at F_CH=256
                # are ~37 words — rounding to 32 doubles the scatter
                # (measured 27.5 vs 21.1 ms per 8 MiB at 48)
                nw = min(-(-max(nw, 1) // 16) * 16, w.shape[2])
                w_out = int(bts_np.max(initial=1) + 31) // 32 + 1
                w_out = -(-w_out // 2048) * 2048
                word0_d = jnp.asarray(word0.astype(np.int32))
                if os.environ.get("LIBFLATE_STITCH_KERNEL", "1") != "0":
                    # Pallas roll+OR stitch: 4.1 ms vs the 19.5 ms XLA
                    # word scatter per 8 MiB (bit-identical)
                    from ..ops.pallas_stitch import stitch_cols_pallas
                    w = stitch_cols_pallas(w[:, :, :nw], word0_d, w_out)
                else:
                    w = _stitch_cols_device(w[:, :, :nw], word0_d,
                                            w_out)
            else:
                offs_l.append(small[:, 4:])
        else:
            bts_np = np.asarray(rest)
            right = np.zeros((DEV_BATCH, member_size), np.uint8)
            for k in range(DEV_BATCH):
                ln = int(n_valid[sl][k])
                if ln:
                    right[k, member_size - ln:] = blocks[sl][k, :ln]
            crcs_l.append(crc32_batch_jax(jnp.asarray(right), n_valid[sl]))
        wmax = int(bts_np.max(initial=1) + 31) // 32 + 1
        wmax = min(-(-wmax // 2048) * 2048, w.shape[1])
        words_l.append(np.asarray(w[:, :wmax]))
        bits_l.append(bts_np)
    # batches may have different sliced widths; pad to the widest
    wpad = max(wl.shape[1] for wl in words_l)
    words = np.zeros((b_pad, wpad), np.uint32)
    for g, wl in enumerate(words_l):
        words[g * DEV_BATCH:(g + 1) * DEV_BATCH, :wl.shape[1]] = wl
    bits = np.concatenate(bits_l, axis=0)
    crcs = np.concatenate(crcs_l, axis=0)
    cnts = np.concatenate(cnt_l, axis=0) if sync else None
    offs = np.concatenate(offs_l, axis=0) if sync else None

    from ..serial.deflate import deflate as serial_deflate

    out = bytearray()
    for i in range(n_members):
        body = splice_blocks_host(words[i:i + 1], bits[i:i + 1])
        nv = int(n_valid[i])
        sync_payload = None
        if sync and cnts is not None and int(cnts[i]) > 0:
            from ..ops.pallas_sync_decode import SYNC_TOKENS
            sync_payload = _sync_payload(SYNC_TOKENS, int(cnts[i]), offs[i])
        stored_size = nv + 5 * max(1, -(-nv // C.MAX_STORED_BLOCK))
        if len(body) >= stored_size:
            # incompressible member: stored blocks beat entropy coding
            raw_member = raw[i * member_size:i * member_size + nv].tobytes()
            body = serial_deflate(raw_member,
                                  EncodeOptions(block_type="stored"))
            sync_payload = None
        member = bytearray(_member_header(0, sync_payload=sync_payload))
        member += body
        member += struct.pack("<II", int(crcs[i]), int(n_valid[i]))
        struct.pack_into("<I", member, _SIZE_OFFSET, len(member))
        out += member
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------
@dataclass
class MemberRef:
    start: int          # byte offset of the member
    end: int            # byte offset one past the member
    body: int           # byte offset of the DEFLATE payload


def index_members(data: bytes) -> list[MemberRef] | None:
    """Walk the LF index without decoding; None if any member lacks it."""
    refs = []
    pos = 0
    while pos < len(data):
        try:
            hdr, body = fgzip.Header.decode(data, pos)
        except (fgzip.GzipError, EOFError):
            return None
        size = None
        if hdr.extra is not None:
            for sub in hdr.extra.subfields:
                if sub.id == INDEX_ID and len(sub.data) == 4:
                    (size,) = struct.unpack("<I", sub.data)
        if size is None or size <= 0 or pos + size > len(data):
            return None
        refs.append(MemberRef(pos, pos + size, body))
        pos += size
    return refs


def decompress(data: bytes, engine: str | None = None,
               verify: bool = True, n_threads: int = 0) -> bytes:
    """Decompress a gzip stream; uses a member-parallel path (threaded
    native or device batch) when the LF index is present, else falls
    back to sequential MultiDecoder.

    Works on FOREIGN streams too (no index, any producer):

        >>> import gzip as stdgz
        >>> decompress(stdgz.compress(b"banana" * 999)) == b"banana" * 999
        True
    """
    data = bytes(data)
    if engine in ("native", None, "auto"):
        # fully-native fast path: the C walk indexes the LF subfields and
        # the scatter-offset batch decode reads bodies in place (no
        # Python header loop, no payload join)
        try:
            from .. import native
            if native.available():
                idx = native.pgzf_index(data)
                if idx is not None:
                    starts, ends, crcs_expected, isizes = idx
                    out, crcs = native.inflate_batch_at(
                        data, starts, ends, isizes, n_threads=n_threads)
                    if verify and (crcs != crcs_expected).any():
                        bad = int(np.argmax(crcs != crcs_expected))
                        raise fgzip.GzipError(
                            f"gzip CRC mismatch in member {bad}: stream "
                            f"says {int(crcs_expected[bad]):#010x}, "
                            f"computed {int(crcs[bad]):#010x}")
                    return out
        except ImportError:
            pass
    refs = index_members(data)
    if refs is None:
        return fgzip.decompress(data, engine=engine, multi=True)
    if engine in ("native", None, "auto"):
        try:
            return _decompress_native(data, refs, verify, n_threads)
        except ImportError:
            pass
    if not os.environ.get("LIBFLATE_NO_SYNC"):
        # sync-indexed Pallas path: zero-speculation kernel over the
        # "LS" chunk index (the device encoder emits it by default)
        try:
            with _maybe_jax_trace():
                return _decompress_sync_device(data, refs, verify)
        except ImportError:
            pass
    if not os.environ.get("LIBFLATE_NO_SPEC"):
        # speculative Pallas path for shared-table streams without the
        # index: position-decode kernel + chain-follow
        try:
            return _decompress_shared_device(data, refs, verify)
        except ImportError:
            pass
    try:
        return _decompress_device(data, refs, verify)
    except ImportError:
        return fgzip.decompress(data, engine=engine, multi=True)


def _decompress_native(data: bytes, refs: list[MemberRef],
                       verify: bool, n_threads: int = 0) -> bytes:
    from .. import native
    if not native.available():
        raise ImportError("native engine unavailable")
    bsz = len(refs)
    bodies = b"".join(data[r.body:r.end - 8] for r in refs)
    offs = np.zeros(bsz + 1, np.uint64)
    isizes = np.zeros(bsz, np.uint64)
    crcs_expected = np.zeros(bsz, np.uint32)
    for i, r in enumerate(refs):
        offs[i + 1] = offs[i] + (r.end - 8 - r.body)
        crcs_expected[i], isizes[i] = struct.unpack_from("<II", data,
                                                         r.end - 8)
    out, crcs = native.inflate_batch(bodies, offs, isizes,
                                     n_threads=n_threads)
    if verify and (crcs != crcs_expected).any():
        bad = int(np.argmax(crcs != crcs_expected))
        raise fgzip.GzipError(
            f"gzip CRC mismatch in member {bad}: stream says "
            f"{int(crcs_expected[bad]):#010x}, computed "
            f"{int(crcs[bad]):#010x}")
    return out


def _decompress_sync_device(data: bytes, refs: list[MemberRef],
                            verify: bool) -> bytes:
    """Sync-indexed decode: zero-speculation Pallas kernel.

    Every member carries an "LS" subfield listing the bit offset of each
    K-token chunk; chunks decode independently in ops/pallas_sync_decode
    (1024 lockstep slots per grid program), tokens land pre-compacted,
    and the threaded native engine expands them at memcpy speed.
    Raises ImportError to fall back when the index or the TPU backend is
    missing.
    """
    import os

    import jax
    import jax.numpy as jnp

    from ..ops import pallas_sync_decode as psd
    from ..ops.huffman import decode_table
    from ..serial.bitio import BitReader
    from ..serial.deflate import DeflateError, read_dynamic_header_lengths
    from .gzip import GzipError

    if (jax.default_backend() == "cpu"
            and not os.environ.get("LIBFLATE_PALLAS_INTERPRET")):
        raise ImportError("sync kernel needs a TPU backend")

    timer = _tracer()
    bsz = len(refs)
    isizes = np.zeros((bsz,), np.int64)
    crcs_expected = np.zeros((bsz,), np.uint32)
    syncs: list = [None] * bsz
    with _maybe_stage(timer, "header+ls parse"):
        for i, ref in enumerate(refs):
            crcs_expected[i], isizes[i] = struct.unpack_from(
                "<II", data, ref.end - 8)
            hdr, _body = fgzip.Header.decode(data, ref.start)
            syncs[i] = _parse_sync(hdr)
    if not any(s is not None for s in syncs):
        raise ImportError("no sync index present")

    # block-header parse (tables); native batch parser when available
    from .. import native
    bodies_all = b"".join(data[r.body:r.end - 8] for r in refs)
    offs_b = np.zeros(bsz + 1, np.uint64)
    for i, r in enumerate(refs):
        offs_b[i + 1] = offs_b[i] + (r.end - 8 - r.body)
    if native.available():
        lit_ls, dist_ls, starts64, flags = native.parse_dyn_headers(
            bodies_all, offs_b)
        dyn_ok = flags == (1 | (C.BTYPE_DYNAMIC << 1))
    else:
        lit_ls = np.zeros((bsz, 288), np.int32)
        dist_ls = np.zeros((bsz, C.MAX_DIST_SYMBOLS), np.int32)
        starts64 = np.zeros((bsz,), np.int64)
        dyn_ok = np.zeros((bsz,), bool)
        for i, ref in enumerate(refs):
            if syncs[i] is None:
                continue
            body = data[ref.body:ref.end - 8]
            r = BitReader(body)
            final = r.read_bits(1)
            btype = r.read_bits(2)
            if not final or btype != C.BTYPE_DYNAMIC:
                continue
            try:
                (lit_ls[i, :C.MAX_LITLEN_SYMBOLS],
                 dist_ls[i]) = read_dynamic_header_lengths(r)
            except DeflateError:
                continue
            starts64[i] = r.bit_position
            dyn_ok[i] = True

    # the LS first_bit must agree with the parsed post-header position —
    # a cheap cross-check that rejects stale/foreign indices outright
    device_ok = np.array(
        [syncs[i] is not None and bool(dyn_ok[i])
         and int(lit_ls[i].max()) <= 12 and int(dist_ls[i].max()) <= 8
         and int(syncs[i][1]) > 0 and int(syncs[i][2]) == int(starts64[i])
         for i in range(bsz)], bool)

    dev_idx = [int(i) for i in np.nonzero(device_ok)[0]]
    if not dev_idx:
        # bail BEFORE host-decoding anything: the caller's fallback
        # paths would otherwise decode the whole stream a second time
        raise ImportError("no sync-decodable members")

    # host fallback for stored/foreign/oversized-table members
    pieces: list[bytes | None] = [None] * bsz
    for i in np.nonzero(~device_ok)[0]:
        body = data[refs[i].body:refs[i].end - 8]
        if native.available():
            pieces[int(i)], _ = native.inflate(
                body, initial_cap=int(isizes[i]) + 64)
        else:
            from ..serial.deflate import inflate as s_inflate
            pieces[int(i)] = bytes(s_inflate(body).data)

    # group consecutive members by identical tables + K (one kernel
    # launch per group; the shared-table encoder emits identical
    # headers across each batch of 128)
    groups: list[list[int]] = []
    for i in dev_idx:
        if (groups and (lit_ls[groups[-1][0]] == lit_ls[i]).all()
                and (dist_ls[groups[-1][0]] == dist_ls[i]).all()
                and syncs[groups[-1][0]][0] == syncs[i][0]):
            groups[-1].append(i)
        else:
            groups.append([i])

    member_toks: dict[int, np.ndarray] = {}
    for group in groups:
        k_tok = int(syncs[group[0]][0])
        chunk_offs: list[int] = []
        chunk_ext: list[int] = []
        chunk_cnt: list[int] = []
        member_span: list[tuple[int, int, int]] = []   # (member, s0, nc)
        for i in group:
            starts, ends, counts_i = _chunk_spans(syncs[i], refs[i])
            base_bit = refs[i].body * 8
            s0 = len(chunk_offs)
            chunk_offs.extend((base_bit + starts).tolist())
            chunk_ext.extend((ends - starts).tolist())
            chunk_cnt.extend(counts_i.tolist())
            member_span.append((i, s0, len(starts)))

        ext = np.asarray(chunk_ext, np.int64)
        offs_arr = np.asarray(chunk_offs, np.int64)
        need = int(((ext + (offs_arr & 31) + 64 + 31) >> 5).max())
        d_words = max(32, -(-need // 32) * 32)
        with _maybe_stage(timer, "host staging"):
            staged, sb = psd.stage_chunks(data, offs_arr, ext, d_words)
        s_n = len(chunk_offs)
        counts = np.zeros(staged.shape[0] * psd.SLOTS, np.int32)
        counts[:s_n] = chunk_cnt
        counts = counts.reshape(staged.shape[0], psd.SUBLANES, psd.LANES)

        # root table sized to the stream's actual max code length (the
        # shared-table encoder caps litlen at 10; legacy streams may
        # use up to 12) — every row group saved is kernel time
        rb = max(int(np.max(lit_ls[group[0]][:C.MAX_LITLEN_SYMBOLS])), 7)
        lit_t = decode_table(
            jnp.asarray(lit_ls[group[0]][:C.MAX_LITLEN_SYMBOLS]), rb)
        dist_t = decode_table(jnp.asarray(dist_ls[group[0]]), 8)
        with _maybe_stage(timer, "kernel+D2H"):
            out = np.asarray(psd.sync_decode(
                jnp.asarray(staged), jnp.asarray(sb), jnp.asarray(counts),
                lit_t.astype(jnp.int32), dist_t.astype(jnp.int32), k_tok,
                root_bits=rb))
        with _maybe_stage(timer, "token gather"):
            toks = psd.gather_tokens(out, s_n, k_tok)
        if os.environ.get("LIBFLATE_DEBUG_CHECKS") == "1":
            if (toks & psd.DEBUG_POISON).any():
                bad = int(np.argmax((toks & psd.DEBUG_POISON).any(axis=1)))
                raise DeflateError(
                    f"sync kernel invariant violated (cursor escaped its "
                    f"staged window) in chunk slot {bad} — corrupt LS "
                    f"index or bitstream")
        for i, s0, nc in member_span:
            n_tokens = int(syncs[i][1])
            member_toks[i] = toks[s0:s0 + nc].reshape(-1)[:n_tokens]

    # expand all device members in one threaded native call
    max_t = max(len(t) for t in member_toks.values())
    stride = -(-max_t // 1024) * 1024
    arr = np.zeros((len(dev_idx), stride), np.int32)
    cnt64 = np.zeros((len(dev_idx),), np.int64)
    sizes = np.zeros((len(dev_idx),), np.int64)
    for kk, i in enumerate(dev_idx):
        t = member_toks[i]
        arr[kk, :len(t)] = t
        cnt64[kk] = len(t)
        sizes[kk] = isizes[i]
    if native.available():
        with _maybe_stage(timer, "native expand+crc"):
            blob, crcs = native.expand_batch(arr, None, cnt64, sizes)
        pos = 0
        for kk, i in enumerate(dev_idx):
            pieces[i] = blob[pos:pos + int(sizes[kk])]
            pos += int(sizes[kk])
        if verify:
            for kk, i in enumerate(dev_idx):
                if int(crcs[kk]) != int(crcs_expected[i]):
                    raise GzipError(f"gzip CRC mismatch in member {i}")
    else:
        from ..serial.lz77 import expand_tokens
        from ..utils.checksum import crc32 as host_crc32
        for kk, i in enumerate(dev_idx):
            t = member_toks[i]
            toks_l = [(int(v) & 511, int(v) >> 9) for v in t]
            piece = bytes(expand_tokens(toks_l))
            if len(piece) != int(isizes[i]):
                raise GzipError(f"gzip ISIZE mismatch in member {i}")
            if verify and host_crc32(piece) != int(crcs_expected[i]):
                raise GzipError(f"gzip CRC mismatch in member {i}")
            pieces[i] = piece

    if verify:
        for i in np.nonzero(~device_ok)[0]:
            i = int(i)
            piece = pieces[i]
            if len(piece) != int(isizes[i]):
                raise GzipError(f"gzip ISIZE mismatch in member {i}")
            eng_crc = (native.crc32 if native.available() else None)
            if eng_crc is None:
                from ..utils.checksum import crc32 as eng_crc
            if eng_crc(piece) != int(crcs_expected[i]):
                raise GzipError(f"gzip CRC mismatch in member {i}")

    _trace_report(timer, "sync decode")
    return b"".join(pieces)  # type: ignore[arg-type]


def decompress_to_device(data: bytes, verify: bool = False):
    """Decode a sync-indexed PGZF stream INTO device memory.

    Example (the decompress-into-training-batch shape; needs an
    accelerator backend, or interpret mode on CPU)::

        stream = pgzf.compress(corpus, member_size=64 * 1024)
        plain, lens = pgzf.decompress_to_device(stream)   # no D2H
        batch = plain[:, :crop]            # feed the data pipeline

    The decompress-into-training-batch shape: members decode via the
    sync kernel, tokens are reordered per member with one device
    gather, and LZ77 expansion runs on-device (pointer doubling) — the
    plaintext never crosses to the host.  Returns ``(out, lengths)``:
    ``out`` is a (n_members, member_cap) uint8 device array, row i
    holding member i's plaintext in ``out[i, :lengths[i]]`` — ready to
    feed a data pipeline without any D2H transfer.

    Streams without the LS index but with shared-table members (e.g.
    produced by another tool from this framework's members, or an older
    encode) fall back to the speculative kernel pipeline
    (_spec_token_groups) and still land device-resident.  Raises
    ImportError when neither path fits or no accelerator backend is
    available (callers fall back to the host paths; ``verify=True``
    additionally CRC-checks on device).
    """
    import os

    import jax
    import jax.numpy as jnp

    from ..ops import pallas_sync_decode as psd
    from ..ops.huffman import decode_table
    from ..serial.deflate import DeflateError
    from .gzip import GzipError

    if (jax.default_backend() == "cpu"
            and not os.environ.get("LIBFLATE_PALLAS_INTERPRET")):
        raise ImportError("device decode needs a TPU backend")
    data = bytes(data)
    try:
        groups = _prepare_sync_device(data)
    except ImportError:
        refs = index_members(data)
        if refs is not None:
            try:
                return _spec_to_device(data, refs, verify)
            except ImportError:
                pass
        return _foreign_to_device(data, verify, refs)
    plains, lens = [], []
    for prep in groups:
        plain, n_out, err, crc_f = _run_sync_chain(prep)
        if bool(np.asarray(err).any()):
            raise DeflateError("bad back-reference in device expansion")
        if verify:
            from ..ops.checksum import crc32_from_padded_f
            crcs = crc32_from_padded_f(np.asarray(crc_f), prep["isizes"],
                                       prep["member_cap"])
            for i in range(len(crcs)):
                if int(crcs[i]) != int(prep["crcs_expected"][i]):
                    raise GzipError(
                        f"gzip CRC mismatch in member "
                        f"{prep['member0'] + i}")
        plains.append(plain)
        lens.append(prep["isizes"])
    if len(plains) == 1:
        return plains[0], jnp.asarray(lens[0], jnp.int32)
    cap = max(p.shape[1] for p in plains)
    plains = [jnp.pad(p, ((0, 0), (0, cap - p.shape[1])))
              for p in plains]
    return (jnp.concatenate(plains, axis=0),
            jnp.asarray(np.concatenate(lens), jnp.int32))


#: largest foreign member the device expansion takes (src/lit VMEM
#: footprint is 8 B/position per grid program); bigger members fall
#: back to the host engines
_FOREIGN_MEMBER_CAP = 1 << 20


def _foreign_to_device(data: bytes, verify: bool,
                       refs: list[MemberRef] | None = None):
    """decompress_to_device tail for FOREIGN streams — members with
    their own per-member dynamic (or fixed/stored) tables, no LF/LS
    index, any producer (stdlib gzip, zlib CLI, pigz...).

    Per-member tables cannot ride the shared-table TPU symbol kernels
    (a per-lane table lookup sweeps 4-16x more vreg groups than the
    shared broadcast — measured out in round 5), so the sequential
    entropy phase runs in the threaded C engine as a TOKEN decode
    (native.inflate_tokens_batch — no byte materialization), and
    everything after the symbols — LZ77 expansion, CRC — runs in the
    same fused device chain as the sync path (ops/device_expand).
    Covers the reference's arbitrary-stream decode capability
    (src/deflate/decode.rs:136-164) with device-resident output.
    """
    import jax.numpy as jnp

    from .. import native
    from ..ops.checksum import crc32_f_rows, crc32_from_padded_f
    from ..ops.device_expand import expand_members
    from ..serial.deflate import DeflateError
    from .gzip import GzipError

    if not native.available():
        raise ImportError("foreign device decode needs the C engine")

    if refs is not None:
        # indexed stream whose tables can't ride the shared kernels:
        # extents are known, so the token decode runs THREADED
        sizes, crcs_expected = [], []
        for ref in refs:
            c, s = struct.unpack_from("<II", data, ref.end - 8)
            sizes.append(s)
            crcs_expected.append(c)
        if max(sizes, default=0) > _FOREIGN_MEMBER_CAP:
            raise ImportError("foreign member too large for the "
                              "device expansion footprint")
        t_cap = max(1024, -(-max(max(sizes), 1) // 1024) * 1024)
        packed, counts, osz = native.inflate_tokens_batch(
            data, [r.body for r in refs], [r.end - 8 for r in refs],
            t_cap)
        if (osz.astype(np.int64) != np.asarray(sizes)).any():
            raise GzipError("gzip ISIZE mismatch")
        nt = counts.astype(np.int32)
        bsz = len(refs)
    else:
        # un-indexed: extents come from the token decoder's end bit
        # (sequential, but it IS the decode)
        sizes, crcs_expected, toks_l = [], [], []
        pos = 0
        while pos < len(data):
            hdr, body = fgzip.Header.decode(data, pos)
            cap = 1 << 17
            while True:
                r = native.inflate_tokens(data, body, cap)
                if r is not None:
                    break
                cap *= 4
                if cap > (len(data) - body) * 9 + 4096:
                    raise DeflateError("token decode cap overrun")
            toks, osize, eb = r
            end_byte = body + (eb + 7) // 8
            if end_byte + 8 > len(data):
                raise GzipError(
                    "truncated gzip member (missing trailer)")
            crc_exp, isize = struct.unpack_from("<II", data, end_byte)
            if isize != (osize & 0xFFFFFFFF):
                raise GzipError(
                    f"gzip ISIZE mismatch in member {len(sizes)}")
            if osize > _FOREIGN_MEMBER_CAP:
                raise ImportError("foreign member too large for the "
                                  "device expansion footprint")
            sizes.append(osize)
            crcs_expected.append(crc_exp)
            toks_l.append(toks)
            pos = end_byte + 8
        if not toks_l:
            raise ImportError("empty stream")
        t_cap = max(1024, -(-max(len(t) for t in toks_l) // 1024) * 1024)
        bsz = len(toks_l)
        packed = np.zeros((bsz, t_cap), np.int32)
        nt = np.zeros((bsz,), np.int32)
        for i, t in enumerate(toks_l):
            packed[i, :len(t)] = t
            nt[i] = len(t)

    out_cap = 1 << max(10, (max(max(sizes), 1) - 1).bit_length())
    plain, n_out, err = expand_members(jnp.asarray(packed),
                                       jnp.asarray(nt), out_cap)
    if bool(np.asarray(err).any()):
        raise DeflateError("bad back-reference in device expansion")
    if verify:
        crcs = crc32_from_padded_f(
            np.asarray(crc32_f_rows(plain)),
            np.asarray(sizes, np.int64), out_cap)
        for i in range(bsz):
            if int(crcs[i]) != int(crcs_expected[i]):
                raise GzipError(f"gzip CRC mismatch in member {i}")
    return plain, jnp.asarray(np.asarray(sizes), jnp.int32)


def _spec_to_device(data: bytes, refs: list[MemberRef], verify: bool):
    """decompress_to_device tail for un-indexed shared-table streams:
    speculative kernels to tokens (_spec_token_groups), then the same
    device-resident expansion + CRC chain as the sync path."""
    import jax.numpy as jnp

    from ..ops.checksum import crc32_f_rows, crc32_from_padded_f
    from ..ops.device_expand import expand_members
    from ..serial.deflate import DeflateError
    from .gzip import GzipError

    bsz = len(refs)
    isizes = np.zeros((bsz,), np.int64)
    crcs_expected = np.zeros((bsz,), np.uint32)
    for i, ref in enumerate(refs):
        crcs_expected[i], isizes[i] = struct.unpack_from(
            "<II", data, ref.end - 8)

    plains, lens = [], []
    for packed, nt, group, cap in _spec_token_groups(data, refs):
        plain, n_out, err = expand_members(packed, nt, cap)
        plain = plain[:len(group)]
        if bool(np.asarray(err)[:len(group)].any()):
            raise DeflateError("bad back-reference in device expansion")
        if verify:
            crcs = crc32_from_padded_f(
                np.asarray(crc32_f_rows(plain)), isizes[group], cap)
            for k, i in enumerate(group):
                if int(crcs[k]) != int(crcs_expected[i]):
                    raise GzipError(f"gzip CRC mismatch in member {i}")
        plains.append(plain)
        lens.append(isizes[group])
    if len(plains) == 1:
        return plains[0], jnp.asarray(lens[0], jnp.int32)
    return (jnp.concatenate(plains, axis=0),
            jnp.asarray(np.concatenate(lens), jnp.int32))


def _prepare_sync_device(data: bytes) -> list[dict]:
    """Host-side staging for the device decode chain.

    Parses the LS index and headers, splits members into contiguous
    groups sharing one code table (the shared-table encoder emits one
    table per 128-member batch), and stages every chunk's bits at a
    UNIFORM slot stride (member i owns slots [i*max_nc, (i+1)*max_nc)),
    so the slot-major kernel output reorders into member-major token
    rows with pure reshapes/transposes (the index gather this replaces
    cost 18 ms / 8 MiB at XLA's 85 M elem/s ceiling; padding slots have
    count 0 and only dilute the sync kernel a few %).  Raises
    ImportError if ANY member is not sync-decodable — callers fall back
    to the host paths, and the bench reports coverage from this exact
    check (nothing silently skips to a slower-but-uncounted path).
    """
    import jax.numpy as jnp

    from ..ops import pallas_sync_decode as psd
    from ..ops.huffman import decode_table

    refs = index_members(data)
    if refs is None:
        raise ImportError("no member index")
    n_all = len(refs)
    isizes_all = np.zeros((n_all,), np.int64)
    crcs_all = np.zeros((n_all,), np.uint32)
    syncs: list = [None] * n_all
    for i, ref in enumerate(refs):
        crcs_all[i], isizes_all[i] = struct.unpack_from(
            "<II", data, ref.end - 8)
        hdr, _ = fgzip.Header.decode(data, ref.start)
        syncs[i] = _parse_sync(hdr)
    if any(s is None for s in syncs):
        raise ImportError("stream is not fully sync-indexed")

    from .. import native
    if not native.available():
        raise ImportError("needs the native header parser")
    bodies = b"".join(data[r.body:r.end - 8] for r in refs)
    offs_b = np.zeros(n_all + 1, np.uint64)
    for i, r in enumerate(refs):
        offs_b[i + 1] = offs_b[i] + (r.end - 8 - r.body)
    lit_ls, dist_ls, starts64, flags = native.parse_dyn_headers(
        bodies, offs_b)
    if not ((flags == 5).all() and int(lit_ls.max()) <= 12
            and int(dist_ls.max()) <= 8):
        raise ImportError("not a sync-decodable shared-table stream")

    # contiguous groups with identical tables and chunk size
    bounds = [0]
    for i in range(1, n_all):
        if not ((lit_ls[i] == lit_ls[bounds[-1]]).all()
                and (dist_ls[i] == dist_ls[bounds[-1]]).all()
                and syncs[i][0] == syncs[bounds[-1]][0]):
            bounds.append(i)
    bounds.append(n_all)

    member_cap = int(isizes_all.max(initial=1))
    member_cap = 1 << max(10, (member_cap - 1).bit_length())

    groups = []
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        bsz = g1 - g0
        k_tok = syncs[g0][0]
        nc = np.zeros((bsz,), np.int64)
        for j, i in enumerate(range(g0, g1)):
            if int(syncs[i][2]) != int(starts64[i]):
                raise ImportError(
                    "sync index disagrees with block header")
            nc[j] = -(-int(syncs[i][1]) // k_tok)
        max_nc = int(nc.max(initial=1))
        s_total = bsz * max_nc
        offs_arr = np.zeros((s_total,), np.int64)
        ext = np.zeros((s_total,), np.int64)
        cnt_sl = np.zeros((s_total,), np.int64)
        for j, i in enumerate(range(g0, g1)):
            starts, ends, counts_i = _chunk_spans(syncs[i], refs[i])
            s0 = j * max_nc
            offs_arr[s0:s0 + len(starts)] = refs[i].body * 8 + starts
            ext[s0:s0 + len(starts)] = ends - starts
            cnt_sl[s0:s0 + len(starts)] = counts_i

        need = int(((ext + (offs_arr & 31) + 64 + 31) >> 5).max())
        d_words = max(32, -(-need // 32) * 32)
        staged, sb = psd.stage_chunks(data, offs_arr, ext, d_words)
        counts = np.zeros(staged.shape[0] * psd.SLOTS, np.int32)
        counts[:s_total] = cnt_sl
        counts = counts.reshape(staged.shape[0], psd.SUBLANES,
                                psd.LANES)
        rb = max(int(np.max(lit_ls[g0][:C.MAX_LITLEN_SYMBOLS])), 7)
        groups.append({
            "staged": jnp.asarray(staged), "sb": jnp.asarray(sb),
            "counts": jnp.asarray(counts),
            "lit_t": decode_table(
                jnp.asarray(lit_ls[g0][:C.MAX_LITLEN_SYMBOLS]),
                rb).astype(jnp.int32),
            "dist_t": decode_table(jnp.asarray(dist_ls[g0]),
                                   8).astype(jnp.int32),
            "k_tok": k_tok, "root_bits": rb, "p": staged.shape[0],
            "bsz": bsz, "max_nc": max_nc, "member_cap": member_cap,
            "n_tokens": jnp.asarray(np.array(
                [int(syncs[i][1]) for i in range(g0, g1)], np.int32)),
            "isizes": isizes_all[g0:g1],
            "crcs_expected": crcs_all[g0:g1],
            "member0": g0,
        })
    return groups


def _run_sync_chain(prep: dict):
    """Device-only decode chain: sync kernel -> reorder -> expansion ->
    CRC, under ONE jit (each separate dispatch pays host-side issue
    cost on the relay).  Everything after _prepare_sync_device; what
    the bench slope-times as the kernel-side full decode."""
    return _sync_chain_jit()(prep["staged"], prep["sb"],
                             prep["counts"], prep["lit_t"],
                             prep["dist_t"], prep["n_tokens"],
                             prep["k_tok"], prep["root_bits"],
                             prep["p"], prep["bsz"], prep["max_nc"],
                             prep["member_cap"])


def _sync_chain_jit():
    import functools

    import jax

    if not hasattr(_sync_chain_jit, "_fn"):
        @functools.partial(jax.jit,
                           static_argnums=(6, 7, 8, 9, 10, 11))
        def _fn(staged, sb, counts, lit_t, dist_t, n_tokens, k_tok,
                root_bits, p_, bsz, max_nc, member_cap):
            from ..ops import pallas_sync_decode as psd

            out = psd.sync_decode(staged, sb, counts, lit_t, dist_t,
                                  k_tok, root_bits=root_bits)
            return _sync_to_plain_jit()(out, n_tokens, p_, bsz,
                                        max_nc, k_tok, member_cap)

        _sync_chain_jit._fn = _fn
    return _sync_chain_jit._fn


def _sync_to_plain(out, p_: int, bsz: int, max_nc: int, k_tok: int,
                   n_tokens, member_cap: int):
    """Sync-kernel output -> plaintext, one fused device graph.

    Transpose-reorder (uniform slot stride), device expansion
    (ops/device_expand: mod-collapse + Pallas-gather doubling) and the
    member CRC f-values — the full decode tail after symbol decode,
    with no gathers on the XLA ceiling and no host round-trips.
    """
    return _sync_to_plain_jit()(out, n_tokens, p_, bsz, max_nc, k_tok,
                                member_cap)


def _sync_to_plain_jit():
    import functools

    import jax

    if not hasattr(_sync_to_plain_jit, "_fn"):
        @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
        def _fn(out, n_tokens, p_, bsz, max_nc, k_tok, member_cap):
            from ..ops import pallas_sync_decode as psd
            from ..ops.checksum import crc32_f_rows
            from ..ops.device_expand import expand_members

            toks = out.reshape(p_, k_tok, psd.SUBLANES, psd.LANES)
            toks = toks.transpose(0, 2, 3, 1).reshape(
                p_ * psd.SLOTS, k_tok)
            packed = toks[:bsz * max_nc].reshape(bsz, max_nc * k_tok)
            plain, n_out, err = expand_members(packed, n_tokens,
                                               member_cap)
            crc_f = crc32_f_rows(plain)
            return plain, n_out, err, crc_f

        _sync_to_plain_jit._fn = _fn
    return _sync_to_plain_jit._fn


def _spec_fused_jit():
    """The whole speculative token pipeline under ONE jit: position
    kernel → chunk-exit maps → entry threading → walk-emit →
    compaction.  Each separate call used to pay the ~28 ms axon
    dispatch floor (docs/ROADMAP.md); one fused graph pays it once —
    warm spec fallback 0.33 s → ~0.15 s per 8 MiB."""
    import functools

    import jax
    import jax.numpy as jnp

    if not hasattr(_spec_fused_jit, "_fn"):
        @functools.partial(jax.jit, static_argnames=("out_cap",))
        def _fn(words, lit_t, dist_t, starts_g, out_cap):
            from ..ops.deflate_decode import (chain_entries,
                                              tokens_from_emit_packed)
            from ..ops.pallas_decode import (chunk_exit_maps,
                                             speculative_decode_positions,
                                             walk_emit)
            tok, nxt = speculative_decode_positions(words, lit_t,
                                                    dist_t)
            exits = chunk_exit_maps(nxt)         # (1, P, 128)
            exits_s = jnp.transpose(exits[0])
            entries = jax.vmap(chain_entries)(exits_s, starts_g)
            emit = walk_emit(nxt, tok,
                             jnp.transpose(entries)[None, :, :])
            return tokens_from_emit_packed(emit[0], out_cap + 2)

        _spec_fused_jit._fn = _fn
    return _spec_fused_jit._fn


def _spec_token_groups(data: bytes, refs: list[MemberRef]):
    """Speculative shared-table decode to DEVICE TOKENS, per group of
    128 members: position kernel → chunk-exit maps → entry threading →
    walk-emit (all Pallas; compaction is a reshape + mask).

    Yields (packed (128, T) int32 device tokens, nt (128,) device
    counts, group member indices, out_cap).  Raises ImportError when
    the stream shape does not fit the kernels (callers fall back) and
    DeflateError when a member's bit stream is invalid.
    """
    import jax
    import jax.numpy as jnp

    from .. import native
    from ..ops.huffman import decode_table
    from ..ops.pallas_decode import LANES
    from ..serial.deflate import DeflateError

    if jax.default_backend() == "cpu":
        raise ImportError("speculative kernel needs a TPU backend")
    if not native.available():
        raise ImportError("needs native header parse")

    bsz = len(refs)
    isizes = np.zeros((bsz,), np.int64)
    for i, ref in enumerate(refs):
        _, isizes[i] = struct.unpack_from("<II", data, ref.end - 8)
    out_cap = int(isizes.max(initial=1)) or 1
    # min 1024: expand_members' gather_two path needs out_cap % 1024 == 0
    # (matches _prepare_sync_device's member_cap rounding)
    out_cap = 1 << max(10, (out_cap - 1).bit_length())

    bodies_all = b"".join(data[r.body:r.end - 8] for r in refs)
    offs = np.zeros(bsz + 1, np.uint64)
    for i, r in enumerate(refs):
        offs[i + 1] = offs[i] + (r.end - 8 - r.body)
    lit_ls, dist_ls, starts64, flags = native.parse_dyn_headers(
        bodies_all, offs)
    if not (flags == (1 | (C.BTYPE_DYNAMIC << 1))).all():
        raise ImportError("non-uniform member layout")
    if lit_ls.max() > 12 or dist_ls.max() > 8:
        raise ImportError("code lengths exceed the 12/8-bit roots")

    max_body = int((offs[1:] - offs[:-1]).max())
    # W ≡ 4 (mod 64) makes P = 32W-128 a multiple of 2048 (the position
    # kernel's grid unit, itself a multiple of the 512 chain chunk)
    w = max_body // 4 + 8
    w = ((w - 4 + 63) // 64) * 64 + 4

    for g0 in range(0, bsz, LANES):
        group = list(range(g0, min(g0 + LANES, bsz)))
        # group members must share tables
        if not ((lit_ls[group] == lit_ls[group[0]]).all()
                and (dist_ls[group] == dist_ls[group[0]]).all()):
            raise ImportError("tables differ within a group")
        lit_t = decode_table(jnp.asarray(lit_ls[group[0]]), 12)
        dist_t = decode_table(jnp.asarray(dist_ls[group[0]]), 8)
        words = np.zeros((1, w, LANES), np.uint32)
        for k, i in enumerate(group):
            body = data[refs[i].body:refs[i].end - 8]
            arr = np.frombuffer(body + b"\x00" * ((-len(body)) % 4),
                                np.uint8).view("<u4")
            words[0, :len(arr), k] = arr
        starts_g = np.zeros((LANES,), np.int32)
        for k, i in enumerate(group):
            starts_g[k] = int(starts64[i])
        packed, nt, err = _spec_fused_jit()(
            jnp.asarray(words), lit_t.astype(jnp.int32),
            dist_t.astype(jnp.int32), jnp.asarray(starts_g),
            out_cap)
        err_np = np.asarray(err)
        for k, i in enumerate(group):
            if err_np[k]:
                raise DeflateError(
                    f"speculative decode failed in member {i}")
        yield packed, nt, group, out_cap


def _decompress_shared_device(data: bytes, refs: list[MemberRef],
                              verify: bool) -> bytes:
    """Shared-table speculative decode (Pallas kernel, groups of 128).

    Requires every member in each group of 128 to carry an identical
    single-final-dynamic-block header with code lengths ≤ 12 (the
    shared-table encode mode guarantees this); raises ImportError to
    fall back otherwise.
    """
    from .. import native
    from .gzip import GzipError

    bsz = len(refs)
    isizes = np.zeros((bsz,), np.int64)
    crcs_expected = np.zeros((bsz,), np.uint32)
    for i, ref in enumerate(refs):
        crcs_expected[i], isizes[i] = struct.unpack_from(
            "<II", data, ref.end - 8)

    pieces: list[bytes] = []
    for packed, nt, group, _cap in _spec_token_groups(data, refs):
        # final stage on the host: the overlapping-copy expansion is
        # memcpy-speed in the threaded native engine, and the output
        # must reach the host anyway.  D2H rides a slow tunnel here, so
        # transfer packed tokens sliced to the batch's real maximum
        # (rounded to bound recompiles) instead of the static worst case
        nt_np = np.asarray(nt)[:len(group)].astype(np.int64)
        mt = int(nt_np.max(initial=1))
        mt = min(-(-mt // 1024) * 1024, packed.shape[1])
        p_np = np.asarray(packed[:, :mt])[:len(group)]
        sizes = isizes[group]
        blob, crcs = native.expand_batch(p_np, None, nt_np, sizes)
        if verify:
            for k, i in enumerate(group):
                if int(crcs[k]) != int(crcs_expected[i]):
                    raise GzipError(f"gzip CRC mismatch in member {i}")
        pieces.append(blob)
    return b"".join(pieces)


def _decompress_device(data: bytes, refs: list[MemberRef],
                       verify: bool) -> bytes:
    import jax.numpy as jnp

    from ..ops.checksum import crc32_batch_jax
    from ..ops.deflate_decode import (decode_symbols_chunked,
                                      expand_tokens_device,
                                      tables_from_lengths)
    from ..serial.bitio import BitReader
    from ..serial.deflate import DeflateError, read_dynamic_header_lengths
    from .gzip import GzipError

    bsz = len(refs)
    # host: parse each member's single block header (byte-scale work;
    # native batch parser when available, serial Python otherwise)
    isizes = np.zeros((bsz,), np.int64)
    crcs_expected = np.zeros((bsz,), np.uint32)
    max_body = 0
    for i, ref in enumerate(refs):
        crcs_expected[i], isizes[i] = struct.unpack_from(
            "<II", data, ref.end - 8)
        max_body = max(max_body, ref.end - 8 - ref.body)

    from .. import native
    host_members: dict[int, bytes] = {}
    if native.available():
        bodies = b"".join(data[ref.body:ref.end - 8] for ref in refs)
        offs = np.zeros(bsz + 1, np.uint64)
        for i, ref in enumerate(refs):
            offs[i + 1] = offs[i] + (ref.end - 8 - ref.body)
        lit_ls, dist_ls, starts64, flags = native.parse_dyn_headers(
            bodies, offs)
        starts = starts64.astype(np.int32)
        # members that aren't a single final compressed block (e.g. the
        # stored fallback for incompressible chunks) decode host-side
        device_ok = ((flags == (1 | (C.BTYPE_DYNAMIC << 1))) |
                     (flags == (1 | (C.BTYPE_FIXED << 1))))
        for i in np.nonzero(~device_ok)[0]:
            body = data[refs[i].body:refs[i].end - 8]
            host_members[int(i)], _ = native.inflate(
                body, initial_cap=int(isizes[i]) + 64)
    else:
        lit_ls = np.zeros((bsz, 288), np.int32)
        dist_ls = np.zeros((bsz, C.MAX_DIST_SYMBOLS), np.int32)
        starts = np.zeros((bsz,), np.int32)
        for i, ref in enumerate(refs):
            body = data[ref.body:ref.end - 8]
            r = BitReader(body)
            final = r.read_bits(1)
            btype = r.read_bits(2)
            if not final or btype != C.BTYPE_DYNAMIC:
                # not our single-dynamic-block shape: fall back entirely
                raise ImportError("non-canonical member layout")
            lit_ls[i, :C.MAX_LITLEN_SYMBOLS], dist_ls[i] = \
                read_dynamic_header_lengths(r)
            starts[i] = r.bit_position

    out_cap = int(isizes.max(initial=1)) or 1
    out_cap = 1 << max(8, (out_cap - 1).bit_length())

    dev_idx = [i for i in range(bsz) if i not in host_members]
    pieces: list[bytes | None] = [None] * bsz
    for i, piece in host_members.items():
        if len(piece) != int(isizes[i]):
            raise GzipError(f"gzip ISIZE mismatch in member {i}")
        pieces[i] = piece

    # fixed device batch + out_cap-derived word width: one compiled
    # shape per (member-size class), reused across input sizes
    DEV_BATCH = 64
    w = out_cap // 4 + 512
    if max_body > 4 * (w - 2):
        raise ImportError("member body exceeds device word budget")
    fixed_l = np.asarray(C.fixed_litlen_lengths(),
                         np.int32)[:lit_ls.shape[1]]
    for g in range(0, len(dev_idx), DEV_BATCH):
        group = dev_idx[g:g + DEV_BATCH]
        words = np.zeros((DEV_BATCH, w), np.uint32)
        d_starts = np.full((DEV_BATCH,), 3, np.int32)
        d_lit = np.empty((DEV_BATCH, lit_ls.shape[1]), np.int32)
        d_dist = np.empty((DEV_BATCH, C.MAX_DIST_SYMBOLS), np.int32)
        # padding rows decode an empty final fixed block ("\x03\x00")
        d_lit[:] = fixed_l
        d_dist[:] = 5
        words[:, 0] = 0x0003
        for k, i in enumerate(group):
            ref = refs[i]
            body = data[ref.body:ref.end - 8]
            arr = np.frombuffer(body + b"\x00" * ((-len(body)) % 4),
                                np.uint8)
            words[k] = 0
            words[k, :len(arr) // 4] = arr.view("<u4")
            d_starts[k] = starts[i]
            d_lit[k] = lit_ls[i]
            d_dist[k] = dist_ls[i]

        lit_t, dist_t = tables_from_lengths(jnp.asarray(d_lit),
                                            jnp.asarray(d_dist))
        a, b, nt, end_bit, err = decode_symbols_chunked(
            jnp.asarray(words), jnp.asarray(d_starts), lit_t, dist_t,
            out_cap + 2)
        db = len(group)
        err_np = np.asarray(err)
        if err_np[:db].any():
            bad = group[int(np.argmax(err_np[:db]))]
            raise DeflateError(f"invalid Huffman code in member {bad}")
        out, n_out, xerr = expand_tokens_device(a, b, nt, out_cap)
        xerr_np = np.asarray(xerr)
        if xerr_np[:db].any():
            bad = group[int(np.argmax(xerr_np[:db]))]
            raise DeflateError(f"bad back-reference in member {bad}")
        out_np = np.asarray(out)
        n_out_np = np.asarray(n_out)
        for k, i in enumerate(group):
            if int(n_out_np[k]) != int(isizes[i]):
                raise GzipError(
                    f"gzip ISIZE mismatch in member {i}: "
                    f"{int(isizes[i])} != {int(n_out_np[k])}")
        if verify:
            right = np.zeros_like(out_np)
            for k in range(db):
                ln = int(n_out_np[k])
                if ln:
                    right[k, out_cap - ln:] = out_np[k, :ln]
            crcs = crc32_batch_jax(jnp.asarray(right), n_out_np)
            for k, i in enumerate(group):
                if int(crcs[k]) != int(crcs_expected[i]):
                    raise GzipError(
                        f"gzip CRC mismatch in member {i}: stream says "
                        f"{int(crcs_expected[i]):#010x}, computed "
                        f"{int(crcs[k]):#010x}")
        for k, i in enumerate(group):
            pieces[i] = out_np[k, :int(n_out_np[k])].tobytes()

    if verify and host_members:
        from ..utils.checksum import crc32 as host_crc32
        eng_crc = native.crc32 if native.available() else host_crc32
        for i, piece in host_members.items():
            if eng_crc(piece) != int(crcs_expected[i]):
                raise GzipError(f"gzip CRC mismatch in member {i}")

    return b"".join(pieces)  # type: ignore[arg-type]
