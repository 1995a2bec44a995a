"""Public LZ77 API surface (parity: libflate_lz77 public items)."""
import pytest
import zlib as pyzlib

from libflate_tpu import lz77
from libflate_tpu.formats import zlib as fzlib
from libflate_tpu.serial.deflate import EncodeOptions


class TestLz77Classes:
    def test_default_encoder_roundtrip(self):
        enc = lz77.DefaultLz77Encoder()
        sink: list = []
        enc.encode(b"aaaaa", sink)
        enc.flush(sink)
        assert [(c.length, c.backward_distance) for c in sink] == \
            [(97, 0), (4, 1)]
        assert lz77.decode(sink) == b"aaaaa"

    def test_builder(self):
        enc = (lz77.DefaultLz77EncoderBuilder()
               .window_size(1 << 30)           # clamped
               .max_length(10_000)             # clamped
               .level(lz77.CompressionLevel.BEST)
               .build())
        assert enc.window_size() == lz77.MAX_WINDOW_SIZE
        assert enc.compression_level() is lz77.CompressionLevel.BEST
        sink: list = []
        enc.encode(b"roundtrip " * 50, sink)
        enc.flush(sink)
        assert lz77.decode(sink) == b"roundtrip " * 50

    def test_flush_cadence(self):
        enc = lz77.DefaultLz77Encoder(window_size=256)
        sink: list = []
        enc.encode(b"x" * (256 * 8), sink)     # hits the cadence
        assert sink                            # auto-flushed
        assert lz77.decode(sink) == b"x" * (256 * 8)

    def test_no_compression_encoder(self):
        enc = lz77.NoCompressionLz77Encoder()
        sink: list = []
        enc.encode(b"abc", sink)
        assert all(c.is_literal for c in sink)
        assert enc.compression_level() is lz77.CompressionLevel.NONE

    def test_decoder_streaming(self):
        dec = lz77.Lz77Decoder()
        dec.decode(lz77.Code.literal(97))
        dec.decode(lz77.Code.pointer(4, 1))
        assert dec.read() == b"aaaaa"
        assert dec.read() == b""

    def test_decoder_distance_error(self):
        dec = lz77.Lz77Decoder()
        with pytest.raises(ValueError, match="exceeds"):
            dec.decode(lz77.Code.pointer(3, 5))

    def test_code_validation(self):
        with pytest.raises(ValueError):
            lz77.Code.pointer(2, 1)            # length < 3
        with pytest.raises(ValueError):
            lz77.Code.pointer(3, 40000)        # distance > 32768


class TestZlibWindowSize:
    def test_cinfo_follows_options(self):
        data = b"window size plumbing " * 50
        z = fzlib.compress(
            data, EncodeOptions(window_size=4096, matcher="greedy"),
            engine="serial")
        h, _ = fzlib.Header.decode(z)
        assert h.window_size == fzlib.Lz77WindowSize.KB4
        assert pyzlib.decompress(z) == data
