"""Native C++ engine tests: codec correctness, checksums, header parse."""
import os
import zlib as pyzlib

import numpy as np
import pytest

from libflate_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestNativeChecksums:
    def test_crc32(self):
        for n in (0, 1, 7, 8, 9, 100, 10000):
            data = os.urandom(n)
            assert native.crc32(data) == pyzlib.crc32(data)

    def test_adler32(self):
        for n in (0, 1, 5551, 5552, 5553, 100000):
            data = os.urandom(n)
            assert native.adler32(data) == pyzlib.adler32(data)

    def test_streaming(self):
        data = os.urandom(9999)
        c = native.crc32(data[5000:], native.crc32(data[:5000]))
        assert c == pyzlib.crc32(data)


class TestNativeInflate:
    def test_foreign_streams(self, corpus):
        for data in corpus:
            for level in (1, 6, 9):
                enc = pyzlib.compress(data, level)[2:-4]
                out, _ = native.inflate(enc)
                assert out == data

    def test_stored_block_sequences(self):
        # incompressible data: zlib emits stored blocks; exercises the
        # acc/pos read-ahead invariant at block boundaries
        rng = np.random.default_rng(0)
        for n in (100, 16385, 40000, 70000, 131072):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            enc = pyzlib.compress(data, 6)[2:-4]
            out, _ = native.inflate(enc)
            assert out == data

    def test_errors(self):
        from libflate_tpu.serial.deflate import DeflateError
        with pytest.raises(DeflateError):
            native.inflate(bytes([0b111]))          # reserved btype
        with pytest.raises((DeflateError, EOFError)):
            native.inflate(b"")
        enc = pyzlib.compress(b"hello world" * 100)[2:-4]
        with pytest.raises((DeflateError, EOFError)):
            native.inflate(enc[: len(enc) // 2])

    def test_end_bit(self):
        data = b"trailer follows"
        enc = pyzlib.compress(data)[2:-4]
        out, end_bit = native.inflate(enc)
        assert out == data
        assert (end_bit + 7) // 8 <= len(enc)


class TestNativeDeflate:
    def test_roundtrip_and_oracle(self, corpus):
        for data in corpus:
            enc = native.deflate_greedy(data)
            d = pyzlib.decompressobj(-15)
            assert d.decompress(enc) == data
            out, _ = native.inflate(enc)
            assert out == data

    def test_multi_block(self):
        rng = np.random.default_rng(1)
        data = bytes(rng.integers(0, 32, 500_000, dtype=np.uint8))
        enc = native.deflate_greedy(data, block_size=65536)
        d = pyzlib.decompressobj(-15)
        assert d.decompress(enc) == data

    def test_ratio_close_to_serial_greedy(self):
        from libflate_tpu.serial.deflate import EncodeOptions, deflate
        data = (b"The quick brown fox jumps over the lazy dog. " * 1000)
        enc = native.deflate_greedy(data)
        ser = deflate(data, EncodeOptions())
        # RLE'd headers should make native strictly competitive
        assert len(enc) <= len(ser) * 1.05 + 16


class TestHeaderParse:
    def test_batch_parse(self):
        from libflate_tpu.serial.bitio import BitReader
        from libflate_tpu.serial.deflate import (
            EncodeOptions, deflate, read_dynamic_header_lengths)
        rng = np.random.default_rng(2)
        bodies = b""
        offsets = [0]
        expected = []
        for i in range(5):
            data = bytes(rng.integers(0, 30, 2000, dtype=np.uint8))
            enc = deflate(data, EncodeOptions())
            bodies += enc
            offsets.append(len(bodies))
            r = BitReader(enc)
            r.read_bits(3)
            expected.append(read_dynamic_header_lengths(r) +
                            (r.bit_position,))
        lit, dist, starts, flags = native.parse_dyn_headers(
            bodies, np.array(offsets, np.uint64))
        for i, (el, ed, eb) in enumerate(expected):
            assert (lit[i, :286] == el).all()
            assert (lit[i, 286:] == 0).all()
            assert (dist[i] == ed).all()
            assert starts[i] == eb
            assert flags[i] == 1 | (2 << 1)

    def test_bad_header_reports_member(self):
        from libflate_tpu.serial.deflate import DeflateError
        with pytest.raises(DeflateError, match="member 0"):
            native.parse_dyn_headers(bytes([0b111, 0, 0]),
                                     np.array([0, 3], np.uint64))


class TestSplice:
    def test_matches_python_splice(self):
        from libflate_tpu.ops.deflate_encode import splice_blocks_host
        rng = np.random.default_rng(3)
        words = rng.integers(0, 1 << 32, (4, 20), dtype=np.uint64
                             ).astype(np.uint32)
        bits = np.array([611, 64, 3, 640 - 17], np.int64)
        ref = splice_blocks_host(words, bits)
        got = native.splice(words, bits)
        assert got == ref


class TestNativeEngine:
    def test_registered(self):
        import libflate_tpu
        from libflate_tpu import backend
        assert "native" in backend.names()
        eng = backend.get("native")
        data = b"engine roundtrip " * 50
        enc = bytes(eng.deflate(data, None))
        assert bytes(eng.inflate(enc).data) == data

    def test_containers_via_native(self):
        import gzip as pygzip
        from libflate_tpu.formats import gzip as fgzip, zlib as fzlib
        data = os.urandom(5000) + b"compressible " * 1000
        gz = fgzip.compress(data, engine="native")
        assert pygzip.decompress(gz) == data
        assert fgzip.decompress(gz, engine="native") == data
        zz = fzlib.compress(data, engine="native")
        assert pyzlib.decompress(zz) == data
        assert fzlib.decompress(zz, engine="native") == data


class TestSharedQuadInflate:
    """Shared-table 4-way interleaved batch inflate (PGZF shared mode)."""

    def test_shared_stream_roundtrip(self):
        # the device/shared encoder emits byte-identical member headers,
        # which routes >=4-member batches through lf_inflate_quad_shared
        from libflate_tpu.formats import pgzf
        rng = np.random.default_rng(5)
        words = [bytes(rng.integers(97, 123, int(rng.integers(3, 10)),
                                    dtype=np.uint8)) for _ in range(500)]
        data = b" ".join(words[int(i)]
                         for i in rng.integers(0, 500, 120000))
        data = data[:6 * 65536 + 1234]      # 7 members: quad + pair + single
        stream = pgzf.compress(data, member_size=64 * 1024, engine="tpu")
        out = pgzf.decompress(stream, engine="native", verify=True)
        assert out == data

    def test_mixed_headers_fall_back(self):
        # per-member tables (native encoder): quad detection must reject
        # and the pair/single fallback still round-trips
        from libflate_tpu.formats import pgzf
        rng = np.random.default_rng(11)
        parts = [rng.integers(0, 256, 65536, dtype=np.uint8).tobytes(),
                 b"a" * 65536, b"the quick brown fox " * 3277,
                 os.urandom(65536), b"z" * 30000]
        data = b"".join(parts)[:4 * 65536 + 30000]
        stream = pgzf.compress(data, member_size=64 * 1024, engine="native")
        out = pgzf.decompress(stream, engine="native", verify=True)
        assert out == data
