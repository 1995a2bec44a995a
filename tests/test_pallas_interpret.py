"""Pallas kernels validated on CPU via interpret mode.

Compiled-mode validation happens on TPU (see docs/ROADMAP.md numbers);
these tests pin kernel semantics against the serial/XLA oracles so CPU
CI catches regressions in kernel logic.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force pallas_call into interpreter mode for both kernel modules."""
    import libflate_tpu.ops.pallas_decode as pd
    import libflate_tpu.ops.pallas_fields as pf
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", patched)
    monkeypatch.setattr(pd.pl, "pallas_call", patched)
    yield


class TestFieldsKernel:
    def test_packed_output_matches_xla(self, interpret_pallas):
        import zlib as pyzlib

        from libflate_tpu.ops.deflate_encode import splice_blocks_host
        from libflate_tpu.ops.pipeline import (_fields_batch,
                                               _fields_batch_pallas,
                                               _pack_batch, _tokenize_batch)
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 16, (2, 4096), dtype=np.uint8)
        blocks = jnp.asarray(raw)
        nv = jnp.asarray([4096, 1000], jnp.int32)
        bf = jnp.ones((2,), jnp.int32)
        a, b, cnt = _tokenize_batch(blocks, nv)
        v1, w1 = _fields_batch(a, b, cnt, bf, "dynamic")
        v2, w2 = _fields_batch_pallas(a, b, cnt, bf)
        words1, bits1 = _pack_batch(v1, w1)
        words2, bits2 = _pack_batch(v2, w2)
        assert (np.asarray(bits1) == np.asarray(bits2)).all()
        for i, nvi in enumerate((4096, 1000)):
            blob1 = splice_blocks_host(np.asarray(words1)[i:i + 1],
                                       np.asarray(bits1)[i:i + 1])
            blob2 = splice_blocks_host(np.asarray(words2)[i:i + 1],
                                       np.asarray(bits2)[i:i + 1])
            assert blob1 == blob2
            d = pyzlib.decompressobj(-15)
            assert d.decompress(blob2) == raw[i, :nvi].tobytes()


class TestSpeculativeKernel:
    def _shared_streams(self):
        from libflate_tpu.serial.bitio import BitReader, BitWriter
        from libflate_tpu.serial.deflate import (_encode_tokens,
                                                 read_dynamic_header_lengths,
                                                 token_histograms,
                                                 write_dynamic_header)
        from libflate_tpu.serial.huffman import HuffmanEncoder, package_merge
        from libflate_tpu.serial.lz77 import greedy_tokens
        rng = np.random.default_rng(1)
        chunks = [bytes(rng.integers(0, 30, 1200, dtype=np.uint8)),
                  (b"speculative decode payload " * 60)[:1200],
                  b"\x00" * 600 + b"abcabcabc" * 60]
        tokens = [greedy_tokens(c) for c in chunks]
        lit_freq = np.zeros(286, np.int64)
        dist_freq = np.zeros(30, np.int64)
        for t in tokens:
            lf, df = token_histograms(t)
            lit_freq += lf
            dist_freq += df
        if not dist_freq.any():
            dist_freq[0] = 1
        ll = package_merge(lit_freq, 12)
        dl = package_merge(dist_freq, 8)
        bodies, starts = [], []
        for toks in tokens:
            w = BitWriter()
            w.write_bits(1, 1)
            w.write_bits(2, 2)
            write_dynamic_header(w, ll, dl)
            _encode_tokens(w, toks, HuffmanEncoder(ll), HuffmanEncoder(dl))
            bodies.append(w.getvalue())
        for b in bodies:
            r = BitReader(b)
            r.read_bits(3)
            read_dynamic_header_lengths(r)
            starts.append(r.bit_position)
        return chunks, bodies, starts, ll, dl

    def test_end_to_end_with_phase_b(self, interpret_pallas):
        from libflate_tpu.ops.deflate_decode import (compact_marked_tokens,
                                                     expand_tokens_device,
                                                     follow_token_chain)
        from libflate_tpu.ops.huffman import decode_table
        from libflate_tpu.ops.pallas_decode import \
            speculative_decode_positions
        chunks, bodies, starts, ll, dl = self._shared_streams()
        lit_t = decode_table(jnp.asarray(ll), 12).astype(jnp.int32)
        dist_t = decode_table(jnp.asarray(dl), 8).astype(jnp.int32)
        max_bytes = max(len(b) for b in bodies)
        w = (max_bytes + 3) // 4 + 4
        w = ((w - 4 + 63) // 64) * 64 + 4
        words = np.zeros((1, w, 128), np.uint32)
        for l, body in enumerate(bodies):
            arr = np.frombuffer(body + b"\x00" * ((-len(body)) % 4),
                                np.uint8).view("<u4")
            words[0, :len(arr), l] = arr
        tok, nxt = speculative_decode_positions(jnp.asarray(words),
                                                lit_t, dist_t)
        from libflate_tpu.ops.deflate_decode import \
            follow_token_chain_from_exits
        from libflate_tpu.ops.pallas_decode import chunk_exit_maps
        exits = chunk_exit_maps(nxt)
        tok_s = jnp.transpose(tok[0])
        nxt_s = jnp.transpose(nxt[0])
        exits_s = jnp.transpose(exits[0])
        starts_g = np.zeros(128, np.int32)
        starts_g[:len(bodies)] = starts
        marks = jax.vmap(follow_token_chain_from_exits)(
            nxt_s, exits_s, jnp.asarray(starts_g))
        # cross-check against the pure-XLA chain follow
        marks_ref = jax.vmap(follow_token_chain)(nxt_s,
                                                 jnp.asarray(starts_g))
        assert (np.asarray(marks)[:len(bodies)] ==
                np.asarray(marks_ref)[:len(bodies)]).all()
        a, b, nt, err = jax.vmap(
            lambda t, m: compact_marked_tokens(t, m, 2048))(tok_s, marks)
        out, n_out, xerr = expand_tokens_device(a, b, nt, 2048)
        out_np = np.asarray(out)
        n_np = np.asarray(n_out)
        for l, c in enumerate(chunks):
            assert not bool(np.asarray(err)[l])
            assert not bool(np.asarray(xerr)[l])
            assert out_np[l, :int(n_np[l])].tobytes() == c

        # walk-emit path must produce identical token streams
        from libflate_tpu.ops.deflate_decode import (chain_entries,
                                                     tokens_from_emit)
        from libflate_tpu.ops.pallas_decode import walk_emit
        entries = jax.vmap(chain_entries)(exits_s,
                                          jnp.asarray(starts_g))
        emit = walk_emit(nxt, tok, jnp.transpose(entries)[None, :, :])
        a2, b2, nt2, err2 = tokens_from_emit(emit[0], 2048)
        for l, c in enumerate(chunks):
            assert not bool(np.asarray(err2)[l])
            n1 = int(np.asarray(nt)[l])
            assert int(np.asarray(nt2)[l]) == n1
            assert (np.asarray(a2)[l, :n1] == np.asarray(a)[l, :n1]).all()
            assert (np.asarray(b2)[l, :n1] == np.asarray(b)[l, :n1]).all()


class TestShardedDecode:
    def test_decode_members_sharded(self):
        import zlib as pyzlib

        from libflate_tpu.parallel.mesh import make_mesh
        from libflate_tpu.parallel.sharding import (decode_members_sharded,
                                                    encode_blocks_sharded)
        mesh = make_mesh(8)
        rng = np.random.default_rng(2)
        bsz, n = 8, 1024
        blocks = rng.integers(0, 8, (bsz, n), dtype=np.uint8)
        n_valid = np.full((bsz,), n, np.int32)
        bfinal = np.ones((bsz,), np.int32)
        words, bits = encode_blocks_sharded(blocks, n_valid, bfinal, mesh)
        # frame each block body, parse its header back, decode sharded
        from libflate_tpu.ops.deflate_encode import splice_blocks_host
        from libflate_tpu.serial.bitio import BitReader
        from libflate_tpu.serial.deflate import read_dynamic_header_lengths
        lit_ls = np.zeros((bsz, 286), np.int32)
        dist_ls = np.zeros((bsz, 30), np.int32)
        starts = np.zeros((bsz,), np.int32)
        wmax = words.shape[1]
        dwords = np.zeros((bsz, wmax + 2), np.uint32)
        for i in range(bsz):
            body = splice_blocks_host(words[i:i + 1], bits[i:i + 1])
            d = pyzlib.decompressobj(-15)
            assert d.decompress(body) == blocks[i].tobytes()
            r = BitReader(body)
            r.read_bits(3)
            lit_ls[i], dist_ls[i] = read_dynamic_header_lengths(r)
            starts[i] = r.bit_position
            arr = np.frombuffer(body + b"\x00" * ((-len(body)) % 4),
                                np.uint8)
            dwords[i, :len(arr) // 4] = arr.view("<u4")
        out, n_out, err = decode_members_sharded(
            dwords, starts, lit_ls, dist_ls, n, mesh)
        assert not err.any()
        assert (n_out == n).all()
        assert (out == blocks).all()


class TestHashCandidatesKernel:
    """ops/pallas_lz77: per-lane VMEM hash table vs the sort oracle."""

    def test_candidates_match_sort_modulo_collisions(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        import jax
        import jax.numpy as jnp

        from libflate_tpu.ops import lz77
        from libflate_tpu.ops.pallas_lz77 import (LANES,
                                                  prefix_candidates_pallas)
        rng = np.random.default_rng(0)
        n = 4096
        blocks = np.zeros((LANES, n), np.uint8)
        for i in range(LANES):
            piece = rng.integers(97, 107, 400, dtype=np.uint8).tobytes() * 20
            blocks[i] = np.frombuffer(piece[:n], np.uint8)
        blocks[1] = rng.integers(0, 256, n, dtype=np.uint8)

        cand_k = np.asarray(prefix_candidates_pallas(jnp.asarray(blocks)))
        cand_s = np.asarray(jax.vmap(
            lambda d: lz77.prefix_candidates(d))(jnp.asarray(blocks)))
        # identical wherever no bucket collision; collisions are rare on
        # text-like lanes and always verified downstream by the LCP stage
        text = [i for i in range(LANES) if i != 1]
        assert (cand_k[text] == cand_s[text]).mean() > 0.9
        idx = np.arange(n)[None, :]
        assert ((cand_k < idx) | (cand_k == -1)).all()
        # the random lane aliases buckets heavily; every bogus candidate
        # must fail the 3-byte LCP so no false match survives
        lens = np.asarray(lz77.match_lengths(
            jnp.asarray(blocks[1]), jnp.asarray(cand_k[1])))
        real = lens >= 3
        for p in np.nonzero(real)[0][:50]:
            c = cand_k[1, p]
            assert (blocks[1, p:p + 3] == blocks[1, c:c + 3]).all()

    def test_tokenize_tail_roundtrip_with_hash_candidates(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        import jax.numpy as jnp

        from libflate_tpu.ops.pallas_lz77 import (LANES,
                                                  prefix_candidates_pallas)
        from libflate_tpu.ops.pipeline import _tokenize_tail
        from libflate_tpu.serial.lz77 import expand_tokens
        rng = np.random.default_rng(1)
        n = 2048
        blocks = np.zeros((LANES, n), np.uint8)
        for i in range(LANES):
            piece = rng.integers(97, 105, 300, dtype=np.uint8).tobytes() * 10
            blocks[i] = np.frombuffer(piece[:n], np.uint8)
        nv = np.full((LANES,), n, np.int32)
        nv[3] = 777
        blocks[3, 777:] = 0

        cand = prefix_candidates_pallas(jnp.asarray(blocks))
        a, b, cnt = map(np.asarray, _tokenize_tail(
            jnp.asarray(blocks), jnp.asarray(nv), cand))
        for i in (0, 1, 3, 127):
            toks = [(int(a[i, t]), int(b[i, t])) for t in range(cnt[i])]
            assert bytes(expand_tokens(toks)) == \
                blocks[i, :nv[i]].tobytes(), f"lane {i}"
