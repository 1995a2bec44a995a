"""GZIP/ZLIB container tests: framing, headers, multi-member, regressions.

Covers the reference's container test surface (SURVEY.md §4): round-trips,
header options (extra/name/comment/HCRC), malformed-input errors
(issue #15-style), fuzzer crash corpus (issue #16, data/issues_16),
stored-block offset bookkeeping (noncompressed_block_offset_sync),
sync-flush (issue #27), empty-read (issue #61), salvage (issue #71),
bad method byte (issue #82).
"""
import gzip as pygzip
import io
import struct
import zlib as pyzlib

import pytest

from libflate_tpu.formats import deflate as fdeflate
from libflate_tpu.formats import gzip as fgzip
from libflate_tpu.formats import zlib as fzlib
from libflate_tpu.finish import AutoFinish
from libflate_tpu.serial.deflate import EncodeOptions


class TestGzip:
    def test_roundtrip(self, corpus):
        for data in corpus:
            gz = fgzip.compress(data)
            assert fgzip.decompress(gz) == data
            assert pygzip.decompress(gz) == data

    def test_decode_foreign(self, corpus):
        for data in corpus:
            assert fgzip.decompress(pygzip.compress(data)) == data

    def test_multi_member(self):
        gz = fgzip.compress(b"hello ") + fgzip.compress(b"world")
        assert fgzip.decompress(gz, multi=True) == b"hello world"
        assert pygzip.decompress(gz) == b"hello world"
        # single-member decoder stops after first member
        assert fgzip.decompress(gz) == b"hello "
        members = fgzip.decompress_members(gz)
        assert [m.data for m in members] == [b"hello ", b"world"]

    def test_header_full_options(self):
        hdr = (fgzip.HeaderBuilder()
               .mtime(123)
               .os(3)
               .text()
               .verify()
               .extra_field(fgzip.ExtraField(
                   [fgzip.ExtraSubField(b"AB", b"payload")]))
               .filename(b"file.txt")
               .comment(b"a comment")
               .finish())
        gz = fgzip.compress(b"data", header=hdr)
        dec = fgzip.Decoder(gz)
        h = dec.header
        assert h.mtime == 123
        assert h.is_text and h.is_verified
        assert h.filename == b"file.txt"
        assert h.comment == b"a comment"
        assert h.extra.subfields[0].id == b"AB"
        assert h.extra.subfields[0].data == b"payload"
        assert dec.read() == b"data"
        # stdlib still decodes it
        assert pygzip.decompress(gz) == b"data"

    def test_header_crc_detects_corruption(self):
        hdr = fgzip.HeaderBuilder().verify().finish()
        gz = bytearray(fgzip.compress(b"data", header=hdr))
        gz[4] ^= 0xFF   # corrupt mtime inside the CRC'd region
        with pytest.raises(fgzip.GzipError):
            fgzip.decompress(bytes(gz))

    def test_malformed_magic(self):
        # parity: issue #15 — malformed byte strings must error cleanly
        for bad in (b"\x1f\x8c\x08\x00" + b"\x00" * 20,
                    b"not gzip at all",
                    b"\x1f\x8b\x07\x00" + b"\x00" * 20):
            with pytest.raises((fgzip.GzipError, EOFError)):
                fgzip.decompress(bad)

    def test_trailer_crc_mismatch(self):
        gz = bytearray(fgzip.compress(b"hello world"))
        gz[-5] ^= 0x01   # corrupt stored CRC
        with pytest.raises(fgzip.GzipError):
            fgzip.decompress(bytes(gz))

    def test_trailer_isize_mismatch(self):
        gz = bytearray(fgzip.compress(b"hello world"))
        gz[-1] ^= 0x01   # corrupt ISIZE
        with pytest.raises(fgzip.GzipError):
            fgzip.decompress(bytes(gz))

    def test_encoder_facade(self):
        enc = fgzip.Encoder()
        enc.write(b"stream ")
        enc.write(b"of data")
        out = enc.getvalue()
        assert pygzip.decompress(out) == b"stream of data"

    def test_autofinish(self):
        sink = io.BytesIO()
        with AutoFinish(fgzip.Encoder(sink)) as enc:
            enc.write(b"auto")
        assert pygzip.decompress(sink.getvalue()) == b"auto"

    def test_offset_sync_golden_pair(self, data_dir):
        # golden file pair: stored blocks starting unaligned mid-stream
        raw = (data_dir / "noncompressed_block_offset_sync/offset").read_bytes()
        gz = (data_dir / "noncompressed_block_offset_sync/offset.gz").read_bytes()
        assert fgzip.decompress(gz) == raw

    def test_empty_read_then_full(self):
        # parity: issue #61
        dec = fgzip.Decoder(fgzip.compress(b"payload"))
        assert dec.read(0) == b""
        assert dec.read() == b"payload"


class TestZlib:
    def test_roundtrip(self, corpus):
        for data in corpus:
            z = fzlib.compress(data)
            assert fzlib.decompress(z) == data
            assert pyzlib.decompress(z) == data

    def test_decode_foreign(self, corpus):
        for data in corpus:
            assert fzlib.decompress(pyzlib.compress(data)) == data

    def test_header_fields(self):
        z = fzlib.compress(b"x")
        h, _ = fzlib.Header.decode(z)
        assert h.window_size == fzlib.Lz77WindowSize.KB32
        cmf, flg = z[0], z[1]
        assert (cmf * 256 + flg) % 31 == 0

    def test_bad_method_error(self):
        # parity: issue #82 — method nibble 0
        with pytest.raises(fzlib.ZlibError, match="method"):
            fzlib.decompress(b"\x70\x9c" + b"\x00" * 8)

    def test_fdict_rejected(self):
        cmf = 0x78
        flg = 0x20
        flg |= (31 - (cmf * 256 + flg) % 31) % 31
        with pytest.raises(fzlib.ZlibError, match="dict"):
            fzlib.decompress(bytes([cmf, flg]) + b"\x00" * 8)

    def test_adler_mismatch(self):
        z = bytearray(fzlib.compress(b"hello adler"))
        z[-1] ^= 0x01
        with pytest.raises(fzlib.ZlibError, match="Adler"):
            fzlib.decompress(bytes(z))

    def test_issues_16_crash_corpus(self, data_dir):
        # parity: issue #16 — fuzzer crash files must produce clean errors
        for f in sorted((data_dir / "issues_16").glob("crash-*")):
            with pytest.raises(Exception) as exc_info:
                fzlib.decompress(f.read_bytes())
            assert isinstance(exc_info.value, (ValueError, EOFError))

    def test_random_roundtrips(self):
        # parity: issue #2
        import random
        rng = random.Random(42)
        for _ in range(10):
            n = rng.randrange(0, 2000)
            data = bytes(rng.randrange(256) for _ in range(n))
            assert fzlib.decompress(fzlib.compress(data)) == data

    def test_sync_flush(self):
        # parity: issue #27 — flush mid-stream, stream stays valid
        enc = fzlib.Encoder(flush_mode=fzlib.FlushMode.SYNC)
        enc.write(b"first part | ")
        enc.flush()
        mid = enc._sink.getvalue()
        # sync marker present at the end of flushed prefix
        assert mid.endswith(b"\x00\x00\xff\xff")
        # flushed prefix is decodable with zlib's partial decoder
        d = pyzlib.decompressobj()
        assert d.decompress(mid) == b"first part | "
        enc.write(b"second part")
        out = enc.getvalue()
        assert pyzlib.decompress(out) == b"first part | second part"
        assert fzlib.decompress(out) == b"first part | second part"

    def test_sync_flush_empty(self):
        enc = fzlib.Encoder(flush_mode=fzlib.FlushMode.SYNC)
        enc.flush()
        enc.write(b"data")
        assert pyzlib.decompress(enc.getvalue()) == b"data"

    def test_stored_options(self):
        data = b"stored payload " * 10
        z = fzlib.compress(data, EncodeOptions(block_type="stored"))
        assert pyzlib.decompress(z) == data


class TestDeflateFormat:
    def test_oneshot(self, corpus, zlib_oracle):
        for data in corpus:
            enc = fdeflate.compress(data)
            assert fdeflate.decompress(enc) == data
            d = zlib_oracle.decompressobj(-15)
            assert d.decompress(enc) == data

    def test_salvage(self):
        enc = fdeflate.compress(b"hello " * 500,
                                EncodeOptions(block_size=512))
        dec = fdeflate.Decoder(enc[:-4])
        with pytest.raises(Exception):
            dec.read()
        # partial output was salvaged
        assert dec.unread_decoded_data().startswith(b"hello ")


class TestStreamingEncoders:
    """Incremental encode: O(block) memory, byte-identity with one-shot
    (parity: Block::write flushing complete blocks —
    reference src/deflate/encode.rs:277-295)."""

    def test_deflate_streaming_matches_oneshot(self):
        import numpy as np
        from libflate_tpu.formats import deflate
        rng = np.random.default_rng(11)
        data = bytes(rng.integers(0, 64, 300000, dtype=np.uint8))
        opts = deflate.EncodeOptions(block_size=65536)
        oneshot = deflate.compress(data, options=opts, engine="serial")
        for sizes in ([1, 7, 1000, 65536, 131072, 99999],
                      [300000], [65536] * 5):
            enc = deflate.Encoder(options=opts)
            pos = 0
            for s in sizes:
                enc.write(data[pos:pos + s])
                pos += s
            enc.write(data[pos:])
            assert enc.getvalue() == oneshot

    def test_streaming_emits_before_finish(self):
        """Completed blocks leave the encoder while writes continue."""
        import io
        from libflate_tpu.formats import deflate
        sink = io.BytesIO()
        enc = deflate.Encoder(sink, deflate.EncodeOptions(block_size=4096))
        enc.write(b"streaming block " * 2048)       # 32 KiB
        assert sink.tell() > 0                      # flushed mid-stream
        enc.finish()

    def test_streaming_memory_stays_bounded(self):
        from libflate_tpu.formats.deflate import BlockStreamer, EncodeOptions
        st = BlockStreamer(EncodeOptions(block_size=4096))
        for _ in range(100):
            st.feed(b"x" * 4096)
            assert len(st._pending) <= 4096
        st.finish()

    def test_gzip_streaming_roundtrip(self):
        import gzip as stdgzip
        import numpy as np
        from libflate_tpu.formats import gzip as lf_gzip
        rng = np.random.default_rng(12)
        data = bytes(rng.integers(0, 32, 200000, dtype=np.uint8))
        enc = lf_gzip.Encoder()
        for i in range(0, len(data), 30000):
            enc.write(data[i:i + 30000])
        out = enc.getvalue()
        assert stdgzip.decompress(out) == data
        assert lf_gzip.decompress(out) == data

    def test_zlib_streaming_sync_flush_roundtrip(self):
        import zlib as pyzlib
        from libflate_tpu.formats import zlib as lf_zlib
        enc = lf_zlib.Encoder(flush_mode=lf_zlib.FlushMode.SYNC)
        enc.write(b"first segment " * 1000)
        enc.flush()
        mid = enc._sink.getvalue()
        # a sync-flushed prefix decodes with stdlib up to the marker
        d = pyzlib.decompressobj()
        assert d.decompress(mid) == b"first segment " * 1000
        enc.write(b"second segment " * 1000)
        out = enc.getvalue()
        assert pyzlib.decompress(out) == (b"first segment " * 1000
                                          + b"second segment " * 1000)

    def test_explicit_engine_encoder_uses_engine(self):
        """Encoder(engine=...) buffers and hands the whole input to that
        engine at finish (the GB/s one-shot path); the default engine
        streams in O(block) memory."""
        import numpy as np
        import pytest
        from libflate_tpu import native
        from libflate_tpu.formats import deflate, gzip as lf_gzip
        if not native.available():
            pytest.skip("native engine unavailable")
        data = bytes(np.random.default_rng(5).integers(0, 48, 200000,
                                                       dtype=np.uint8))
        enc = deflate.Encoder(engine="native")
        enc.write(data[:100000])
        enc.write(data[100000:])
        out = enc.getvalue()
        from libflate_tpu import backend
        assert out == bytes(backend.get("native").deflate(data, None))
        ge = lf_gzip.Encoder(engine="native")
        ge.write(data)
        import gzip as stdgzip
        assert stdgzip.decompress(ge.getvalue()) == data
