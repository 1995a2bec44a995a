"""Golden-byte conformance vectors lifted from the reference doctests.

These are the exact compressed bytes libflate's documented examples pin
(src/deflate/encode.rs:152-155 dynamic, :178-181 stored;
src/gzip.rs:795-802 mtime=123 stored; src/zlib.rs:544-549 dynamic,
:569-575 stored).  Every engine must DECODE the reference's literal
bytes; the serial/native encoders additionally reproduce them
byte-for-byte where our defaults match the reference's.

Issue-keyed regressions carried from the reference test suite:
  #3  dynamic-table-load crash (src/deflate/decode.rs:176-190)
  #3b too-long backward reference (src/deflate/decode.rs:193-211)
  #21 match runs to end of buffer (src/lz77.rs:16-31)
  #52 encoder output-sizing on 16,052-byte input (src/deflate/encode.rs:435-457)
  #64 malformed deflate stream (src/deflate/decode.rs:214-220)
"""
import pathlib
import zlib as stdlib_zlib

import numpy as np
import pytest

from libflate_tpu.formats import deflate, gzip as lf_gzip, zlib as lf_zlib
from libflate_tpu.serial.bitio import BitReader
from libflate_tpu.serial.deflate import DeflateError, read_dynamic_header

MSG = b"Hello World!"

DEFLATE_DYNAMIC = bytes([
    5, 192, 49, 13, 0, 0, 8, 3, 65, 43, 224, 6, 7, 24, 128, 237,
    147, 38, 245, 63, 244, 230, 65, 181, 50, 215, 1])
DEFLATE_STORED = bytes([
    1, 12, 0, 243, 255, 72, 101, 108, 108, 111, 32, 87, 111,
    114, 108, 100, 33])
GZIP_STORED_MTIME123 = bytes([
    31, 139, 8, 0, 123, 0, 0, 0, 0, 3, 1, 12, 0, 243, 255, 72, 101, 108, 108,
    111, 32, 87, 111, 114, 108, 100, 33, 163, 28, 41, 28, 12, 0, 0, 0])
ZLIB_DYNAMIC = bytes([
    120, 156, 5, 192, 49, 13, 0, 0, 8, 3, 65, 43, 224, 6, 7, 24, 128,
    237, 147, 38, 245, 63, 244, 230, 65, 181, 50, 215, 1, 28, 73, 4, 62])
ZLIB_STORED = bytes([
    120, 1, 1, 12, 0, 243, 255, 72, 101, 108, 108, 111, 32, 87, 111,
    114, 108, 100, 33, 28, 73, 4, 62])

# src/deflate/decode.rs:177-185 — a dynamic header that crashed table load
ISSUE_3_HEADER = bytes([
    180, 253, 73, 143, 28, 201, 150, 46, 8, 254, 150, 184, 139, 75, 18, 69,
    247, 32, 157, 51, 27, 141, 132, 207, 78, 210, 167, 116, 243, 160, 223,
    136, 141, 66, 205, 76, 221, 76, 195, 213, 84, 236, 234, 224, 78, 227, 34,
    145, 221, 139, 126, 232, 69, 173, 170, 208, 192, 219, 245, 67, 3, 15, 149,
    120, 171, 70, 53, 106, 213, 175, 23, 21, 153, 139, 254, 27, 249, 75, 234,
    124, 71, 116, 56, 71, 68, 212, 204, 121, 115, 64, 222, 160, 203, 119, 142,
    170, 169, 138, 202, 112, 228, 140, 38])
# src/deflate/decode.rs:195-203 — continues past the header into a
# back-reference that outruns the decoded history
ISSUE_3_TOO_FAR = ISSUE_3_HEADER + bytes([
    171, 162, 88, 212, 235, 56, 136, 231, 233, 239, 113, 249, 163, 252, 16,
    42, 138, 49, 226, 108, 73, 28, 153])
# src/deflate/decode.rs:215 — malformed stream must error, not hang/crash
ISSUE_64 = b"\x04\x04\x04\x05:\x1az*\xfc\x06\x01\x90\x01\x06\x01"

ISSUE_52 = (pathlib.Path(__file__).parent / "data" /
            "issue_52_input.bin").read_bytes()


def _engines():
    names = ["serial"]
    try:
        from libflate_tpu import native
        if native.available():
            names.append("native")
    except Exception:
        pass
    try:
        import libflate_tpu.ops.pipeline  # noqa: F401  (registers "tpu")
        names.append("tpu")
    except Exception:
        pass
    return names


@pytest.mark.parametrize("engine", _engines())
@pytest.mark.parametrize("blob", [DEFLATE_DYNAMIC, DEFLATE_STORED],
                         ids=["dynamic", "stored"])
def test_deflate_decode_reference_bytes(engine, blob):
    assert deflate.decompress(blob, engine=engine) == MSG


@pytest.mark.parametrize("engine", _engines())
def test_gzip_decode_reference_bytes(engine):
    assert lf_gzip.decompress(GZIP_STORED_MTIME123, engine=engine) == MSG
    hdr = lf_gzip.decompress_member(GZIP_STORED_MTIME123, engine=engine).header
    assert hdr.mtime == 123


@pytest.mark.parametrize("engine", _engines())
@pytest.mark.parametrize("blob", [ZLIB_DYNAMIC, ZLIB_STORED],
                         ids=["dynamic", "stored"])
def test_zlib_decode_reference_bytes(engine, blob):
    assert lf_zlib.decompress(blob, engine=engine) == MSG


def test_stdlib_decodes_reference_bytes_too():
    # sanity: the vectors themselves are valid per an independent decoder
    assert stdlib_zlib.decompress(DEFLATE_DYNAMIC, -15) == MSG
    assert stdlib_zlib.decompress(ZLIB_DYNAMIC) == MSG


def test_encode_matches_reference_bytes_exactly():
    """Our default serial encode reproduces libflate's documented output
    byte-for-byte (same greedy LZ77, package-merge tie-breaks, RLE
    header choices) — src/deflate/encode.rs:152-155."""
    assert deflate.compress(MSG) == DEFLATE_DYNAMIC


def test_stored_encode_matches_reference_bytes():
    opts = deflate.EncodeOptions(block_type="stored", matcher="none")
    assert deflate.compress(MSG, options=opts) == DEFLATE_STORED


def test_zlib_encode_matches_reference_bytes():
    assert lf_zlib.compress(MSG) == ZLIB_DYNAMIC


def test_gzip_stored_encode_matches_reference_bytes():
    header = lf_gzip.HeaderBuilder().mtime(123).finish()
    opts = lf_gzip.EncodeOptions(level=lf_gzip.CompressionLevel.NONE)
    out = lf_gzip.compress(MSG, options=opts, header=header)
    assert out == GZIP_STORED_MTIME123


def test_issue_3_dynamic_header_loads():
    r = BitReader(ISSUE_3_HEADER)
    assert r.read_bits(1) == 0          # not final
    assert r.read_bits(2) == 0b10       # dynamic
    read_dynamic_header(r)              # must not raise


@pytest.mark.parametrize("engine", _engines())
def test_issue_3_too_long_backref_rejected(engine):
    with pytest.raises((DeflateError, EOFError, ValueError)):
        deflate.decompress(ISSUE_3_TOO_FAR, engine=engine)


@pytest.mark.parametrize("engine", _engines())
def test_issue_64_malformed_rejected(engine):
    with pytest.raises((DeflateError, EOFError, ValueError)):
        deflate.decompress(ISSUE_64, engine=engine)


def test_issue_21_match_to_end_of_buffer():
    from libflate_tpu.serial.lz77 import greedy_tokens
    # literal 'a' then a length-4 distance-1 match (reference lz77.rs:16-31)
    assert greedy_tokens(b"aaaaa") == [(97, 0), (4, 1)]


@pytest.mark.parametrize("limit", [16_031, 16_032])
def test_issue_52_encoder_sizing(limit):
    data = ISSUE_52[:limit]
    comp = deflate.compress(data)
    assert len(comp) < limit            # must actually compress
    assert deflate.decompress(comp) == data
    assert stdlib_zlib.decompress(comp, -15) == data
