"""Serial codec tests: bit I/O, Huffman, LZ77, DEFLATE block codec.

Mirrors the reference's unit-test strategy (SURVEY.md §4): exact packing
vectors, known-answer tests, round-trips, malformed-input errors, and
stdlib-zlib as the interop oracle.
"""
import numpy as np
import pytest

from libflate_tpu.serial.bitio import BitReader, BitWriter
from libflate_tpu.serial.deflate import (DeflateError, EncodeOptions, deflate,
                                         inflate)
from libflate_tpu.serial.huffman import (HuffmanDecoder, HuffmanEncoder,
                                         HuffmanError, canonical_codes,
                                         package_merge)
from libflate_tpu.serial.lz77 import (chain_tokens, expand_tokens,
                                      greedy_tokens)


# ---------------------------------------------------------------------------
# Bit I/O (parity: reference src/bit.rs:176-212 tests)
# ---------------------------------------------------------------------------
class TestBitIO:
    def test_lsb_first_packing(self):
        w = BitWriter()
        w.write_bits(0b1, 1)
        w.write_bits(0b01, 2)
        w.write_bits(0b10111, 5)
        assert w.getvalue() == bytes([0b10111011])

    def test_code_is_msb_first(self):
        w = BitWriter()
        w.write_code(0b110, 3)   # written as 1,1,0 -> LSB-first 0b011
        w.write_bits(0, 5)
        assert w.getvalue() == bytes([0b00000011])

    def test_roundtrip(self):
        w = BitWriter()
        vals = [(5, 3), (1, 1), (200, 8), (0x7FFF, 15), (3, 2)]
        for v, n in vals:
            w.write_bits(v, n)
        r = BitReader(w.getvalue())
        for v, n in vals:
            assert r.read_bits(n) == v

    def test_eof_raises(self):
        r = BitReader(b"\xff")
        r.read_bits(8)
        with pytest.raises(EOFError):
            r.read_bits(1)

    def test_align_and_bytes(self):
        w = BitWriter()
        w.write_bits(1, 3)
        w.align_byte()
        w.write_bytes(b"xyz")
        r = BitReader(w.getvalue())
        r.read_bits(3)
        r.align_byte()
        assert r.read_bytes(3) == b"xyz"

    def test_state_snapshot_restore(self):
        r = BitReader(bytes([0xA5, 0x5A]))
        r.read_bits(4)
        st = r.state()
        a = r.read_bits(8)
        r.restore(st)
        assert r.read_bits(8) == a


# ---------------------------------------------------------------------------
# Huffman (parity: src/huffman.rs tests + package-merge properties)
# ---------------------------------------------------------------------------
class TestHuffman:
    def test_canonical_assignment(self):
        # RFC-1951 §3.2.2 worked example: lengths (3,3,3,3,3,2,4,4)
        lengths = np.array([3, 3, 3, 3, 3, 2, 4, 4])
        codes = canonical_codes(lengths)
        assert list(codes) == [0b010, 0b011, 0b100, 0b101, 0b110,
                               0b00, 0b1110, 0b1111]

    def test_package_merge_kraft(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            for limit, size in ((7, 19), (15, 286)):
                freqs = rng.integers(0, 1000, size=size)
                lengths = package_merge(freqs, limit)
                used = lengths[freqs > 0]
                assert (used > 0).all() and (used <= limit).all()
                assert (lengths[freqs == 0] == 0).all()
                kraft = np.sum(2.0 ** -used.astype(float))
                assert kraft <= 1.0 + 1e-12

    def test_package_merge_optimal_vs_unlimited(self):
        # With a generous limit, total bits must match ordinary Huffman
        freqs = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55])
        lengths = package_merge(freqs, 15)
        total = int((freqs * lengths).sum())
        # known optimal Huffman cost for this Fibonacci-ish distribution
        import heapq
        h = [(int(f), ()) for f in freqs]
        heapq.heapify(h)
        cost = 0
        while len(h) > 1:
            a = heapq.heappop(h)[0]
            b = heapq.heappop(h)[0]
            cost += a + b
            heapq.heappush(h, (a + b, ()))
        assert total == cost

    def test_single_symbol(self):
        lengths = package_merge(np.array([0, 5, 0]), 15)
        assert list(lengths) == [0, 1, 0]

    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(1)
        freqs = rng.integers(1, 100, size=30)
        enc = HuffmanEncoder.from_frequencies(freqs, 15)
        dec = HuffmanDecoder(enc.lengths)
        w = BitWriter()
        syms = rng.integers(0, 30, size=500)
        for s in syms:
            enc.encode(w, int(s))
        r = BitReader(w.getvalue())
        for s in syms:
            assert dec.decode(r) == s

    def test_oversubscribed_rejected(self):
        with pytest.raises(HuffmanError):
            HuffmanDecoder(np.array([1, 1, 1]))  # 3 codes of length 1

    def test_invalid_code_in_stream(self):
        dec = HuffmanDecoder(np.array([1, 2]))  # incomplete: pattern 11 unused
        r = BitReader(bytes([0b11]))
        with pytest.raises(HuffmanError):
            dec.decode(r)


# ---------------------------------------------------------------------------
# LZ77 (parity: src/lz77.rs:14-31, libflate_lz77 tests)
# ---------------------------------------------------------------------------
class TestLz77:
    def test_aaaaa_exact_tokens(self):
        # parity vector: "aaaaa" -> [Literal(97), Pointer{len 4, dist 1}]
        assert greedy_tokens(b"aaaaa") == [(97, 0), (4, 1)]

    def test_roundtrip_greedy_and_chain(self, corpus):
        for data in corpus:
            for fn in (greedy_tokens, chain_tokens):
                toks = fn(data)
                assert bytes(expand_tokens(toks)) == data

    def test_chain_not_worse_than_greedy(self):
        data = (b"abcdefgh" * 30 + b"abcdefgX" * 30) * 10
        g = greedy_tokens(data)
        c = chain_tokens(data)
        assert len(c) <= len(g)

    def test_expand_distance_error(self):
        with pytest.raises(ValueError):
            expand_tokens([(3, 5)])  # distance 5 with empty history

    def test_expand_with_history(self):
        out = expand_tokens([(3, 2)], history=b"xy")
        assert bytes(out) == b"xyx"

    def test_overlapping_rle(self):
        toks = [(97, 0), (10, 1)]  # 'a' then copy 10 at distance 1
        assert bytes(expand_tokens(toks)) == b"a" * 11


# ---------------------------------------------------------------------------
# DEFLATE block codec
# ---------------------------------------------------------------------------
BLOCK_CONFIGS = [
    ("stored", "none"), ("fixed", "none"), ("fixed", "greedy"),
    ("dynamic", "none"), ("dynamic", "greedy"), ("dynamic", "chain"),
]


class TestDeflate:
    @pytest.mark.parametrize("btype,matcher", BLOCK_CONFIGS)
    def test_roundtrip_and_oracle(self, corpus, zlib_oracle, btype, matcher):
        for data in corpus:
            enc = deflate(data, EncodeOptions(block_type=btype, matcher=matcher))
            assert bytes(inflate(enc).data) == data
            d = zlib_oracle.decompressobj(-15)
            assert d.decompress(enc) == data

    @pytest.mark.parametrize("level", [1, 6, 9])
    def test_decode_foreign_streams(self, corpus, zlib_oracle, level):
        for data in corpus:
            c = zlib_oracle.compressobj(level, zlib_oracle.DEFLATED, -15)
            enc = c.compress(data) + c.flush()
            assert bytes(inflate(enc).data) == data

    def test_multi_block(self, zlib_oracle):
        data = bytes(np.random.default_rng(7).integers(0, 256, 300000,
                                                       dtype=np.uint8))
        enc = deflate(data, EncodeOptions(block_size=65536))
        assert bytes(inflate(enc).data) == data
        d = zlib_oracle.decompressobj(-15)
        assert d.decompress(enc) == data

    def test_long_distance_pattern(self):
        # spans max distance (parity: src/deflate/mod.rs:48-64)
        unit = bytes(range(256))
        data = (unit * 130)[:33000] + (unit * 130)[:33000]
        enc = deflate(data)
        assert bytes(inflate(enc).data) == data

    def test_stored_len_mismatch_error(self):
        # BFINAL=1 BTYPE=00 then bad LEN/NLEN
        bad = bytes([0b001, 0x05, 0x00, 0x12, 0x34, 0, 0, 0, 0, 0])
        with pytest.raises(DeflateError):
            inflate(bad)

    def test_reserved_btype_error(self):
        bad = bytes([0b111])
        with pytest.raises(DeflateError):
            inflate(bad)

    def test_truncated_stream(self):
        enc = deflate(b"hello world, hello world")
        with pytest.raises((DeflateError, EOFError)):
            inflate(enc[:len(enc) // 2])

    def test_partial_salvage(self):
        enc = deflate(b"hello " * 1000, EncodeOptions(block_size=2000))
        try:
            inflate(enc[:len(enc) - 6])
        except (DeflateError, EOFError) as e:
            assert len(getattr(e, "partial", b"")) >= 0

    def test_distance_exceeds_history_error(self):
        # hand-build fixed-Huffman block: pointer at distance > history
        from libflate_tpu.serial.bitio import BitWriter
        from libflate_tpu.serial.deflate import fixed_encoders
        w = BitWriter()
        w.write_bits(1, 1)
        w.write_bits(1, 2)
        lit, dist = fixed_encoders()
        lit.encode(w, 257)        # length 3
        dist.encode(w, 10)        # distance base 33 > empty history
        w.write_bits(0, 4)
        lit.encode(w, 256)
        with pytest.raises(DeflateError):
            inflate(w.getvalue())

    def test_empty_input_all_types(self, zlib_oracle):
        for btype in ("stored", "fixed", "dynamic"):
            enc = deflate(b"", EncodeOptions(block_type=btype))
            assert bytes(inflate(enc).data) == b""
            d = zlib_oracle.decompressobj(-15)
            assert d.decompress(enc) == b""

    def test_ratio_reasonable(self):
        data = (b"The quick brown fox jumps over the lazy dog. " * 1000)
        enc = deflate(data, EncodeOptions(block_type="dynamic",
                                          matcher="greedy"))
        assert len(enc) < len(data) // 10
