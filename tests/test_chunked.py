"""Chunked/resumable decoder tests.

The adversarial chunk-feeder here is the analog of the reference's
WouldBlockReader fake (src/util.rs:8-63): streams are delivered in
1-byte, odd-sized, and random-sized pieces, and the decoder must produce
identical output regardless of chunking.
"""
import gzip as pygzip
import zlib as pyzlib

import numpy as np
import pytest

from libflate_tpu.chunked import (ChunkedDeflateDecoder, ChunkedGzipDecoder,
                                  ChunkedZlibDecoder)
from libflate_tpu.formats import gzip as fgzip, zlib as fzlib
from libflate_tpu.serial.deflate import EncodeOptions, deflate


def _feed_all(dec, stream: bytes, sizes) -> bytes:
    out = bytearray()
    pos = 0
    i = 0
    while pos < len(stream):
        n = sizes[i % len(sizes)]
        i += 1
        out += dec.feed(stream[pos:pos + n])
        pos += n
    dec.finish()
    return bytes(out)


CHUNKINGS = [[1], [7], [1, 2, 3, 5, 8, 13], [64], [100000]]


class TestChunkedDeflate:
    @pytest.mark.parametrize("sizes", CHUNKINGS)
    def test_all_block_types(self, sizes):
        rng = np.random.default_rng(0)
        for bt, m in (("dynamic", "greedy"), ("fixed", "greedy"),
                      ("stored", "none")):
            data = bytes(rng.integers(0, 40, 2000, dtype=np.uint8))
            enc = deflate(data, EncodeOptions(block_type=bt, matcher=m,
                                              block_size=700))
            dec = ChunkedDeflateDecoder()
            assert _feed_all(dec, enc, sizes) == data

    def test_foreign(self):
        data = b"chunked decode of a foreign stream " * 100
        enc = pyzlib.compress(data, 9)[2:-4]
        dec = ChunkedDeflateDecoder()
        assert _feed_all(dec, enc, [3]) == data

    def test_incomplete_raises_on_finish(self):
        enc = deflate(b"hello world hello world")
        dec = ChunkedDeflateDecoder()
        dec.feed(enc[:4])
        with pytest.raises(EOFError):
            dec.finish()

    def test_state_persists_across_feeds(self):
        # long match split across many tiny feeds
        data = b"abcdefgh" * 1000
        enc = deflate(data)
        dec = ChunkedDeflateDecoder()
        out = bytearray()
        for i in range(len(enc)):
            out += dec.feed(enc[i:i + 1])
        dec.finish()
        assert bytes(out) == data

    @pytest.mark.parametrize("sizes", [[10 << 20], [65536], [65521]])
    def test_large_multi_block_stream(self, sizes):
        """Round-3 regression: a single feed whose symbols step consumed
        > 64 KiB used to trim the buffer mid-step and corrupt the bit
        cursor (commits from a live reader hold stale coordinates)."""
        rng = np.random.default_rng(3)
        data = bytes(rng.integers(97, 123, 1 << 20, dtype=np.uint8))
        enc = pyzlib.compress(data, 1)[2:-4]
        dec = ChunkedDeflateDecoder()
        assert _feed_all(dec, enc, sizes) == data


class TestChunkedGzip:
    @pytest.mark.parametrize("sizes", CHUNKINGS)
    def test_single_member(self, sizes):
        data = b"gzip chunked payload " * 150
        stream = fgzip.compress(data)
        dec = ChunkedGzipDecoder()
        assert _feed_all(dec, stream, sizes) == data
        assert dec.header is not None

    def test_multi_member(self):
        stream = fgzip.compress(b"alpha ") + fgzip.compress(b"beta")
        dec = ChunkedGzipDecoder(multi=True)
        assert _feed_all(dec, stream, [5]) == b"alpha beta"

    def test_foreign_gzip(self):
        data = b"foreign gzip " * 200
        dec = ChunkedGzipDecoder()
        assert _feed_all(dec, pygzip.compress(data), [11]) == data

    def test_crc_mismatch_detected(self):
        stream = bytearray(fgzip.compress(b"payload to corrupt"))
        stream[-6] ^= 0x40
        dec = ChunkedGzipDecoder()
        with pytest.raises(fgzip.GzipError):
            _feed_all(dec, bytes(stream), [3])

    def test_offset_sync_golden_pair(self, data_dir):
        raw = (data_dir / "noncompressed_block_offset_sync/offset"
               ).read_bytes()
        gz = (data_dir / "noncompressed_block_offset_sync/offset.gz"
              ).read_bytes()
        dec = ChunkedGzipDecoder()
        assert _feed_all(dec, gz, [1]) == raw


class TestChunkedZlib:
    @pytest.mark.parametrize("sizes", CHUNKINGS)
    def test_roundtrip(self, sizes):
        data = b"zlib chunked payload " * 100
        stream = fzlib.compress(data)
        dec = ChunkedZlibDecoder()
        assert _feed_all(dec, stream, sizes) == data

    def test_foreign(self):
        data = bytes(np.random.default_rng(1).integers(
            0, 256, 10_000, dtype=np.uint8))
        dec = ChunkedZlibDecoder()
        assert _feed_all(dec, pyzlib.compress(data, 6), [13]) == data

    def test_sync_flushed_stream(self):
        enc = fzlib.Encoder(flush_mode=fzlib.FlushMode.SYNC)
        enc.write(b"first ")
        enc.flush()
        enc.write(b"second")
        stream = enc.getvalue()
        dec = ChunkedZlibDecoder()
        assert _feed_all(dec, stream, [2]) == b"first second"

    def test_adler_mismatch(self):
        stream = bytearray(fzlib.compress(b"zlib corruption test"))
        stream[-1] ^= 0x01
        dec = ChunkedZlibDecoder()
        with pytest.raises(fzlib.ZlibError):
            _feed_all(dec, bytes(stream), [4])
