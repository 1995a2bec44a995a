"""Adversarial-input robustness for the native decode paths.

The C fastloop and the interleaved pair decoder hoist bounds checks on
margins; these fuzz cases assert corrupted/truncated/garbage streams
always surface as Python exceptions (or a consistent decode), never as
a crash or wrong silent output.  Mirrors the reference's corrupt-input
regression style (libflate/src/gzip.rs issue tests) with randomized
coverage on top.
"""
import numpy as np
import pytest

from libflate_tpu.formats import pgzf


@pytest.fixture(scope="module")
def base_payload():
    rng = np.random.default_rng(7)
    return bytes(rng.integers(97, 123, 30000, dtype=np.uint8)) * 2


@pytest.mark.parametrize("mode", ["corrupt", "truncate", "bitflip", "append"])
def test_fuzz_decode_never_crashes(base_payload, mode):
    rng = np.random.default_rng(hash(mode) % (2**32))
    for _ in range(40):
        payload = base_payload[: int(rng.integers(100, len(base_payload)))]
        comp = bytearray(pgzf.compress(payload, member_size=16384))
        if mode == "corrupt":
            for _ in range(int(rng.integers(1, 8))):
                comp[int(rng.integers(0, len(comp)))] = int(rng.integers(0, 256))
        elif mode == "truncate":
            comp = comp[: int(rng.integers(1, len(comp)))]
        elif mode == "bitflip":
            for _ in range(int(rng.integers(1, 20))):
                comp[int(rng.integers(18, len(comp)))] ^= 1 << int(rng.integers(0, 8))
        else:
            comp += bytes(rng.integers(0, 256, int(rng.integers(1, 200)),
                                       dtype=np.uint8))
        try:
            out = pgzf.decompress(bytes(comp))
        except Exception:
            continue                       # clean rejection
        # decoded despite fuzzing: must still be self-consistent (the
        # CRC verify passed), which only happens for benign mutations
        assert isinstance(out, bytes)


def test_garbage_raw_inflate():
    native = pytest.importorskip("libflate_tpu.native")
    if not native.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(99)
    for _ in range(60):
        garbage = bytes(rng.integers(0, 256, int(rng.integers(1, 4000)),
                                     dtype=np.uint8))
        try:
            native.inflate(garbage)
        except Exception:
            pass


@pytest.mark.parametrize("hlit_field", [29, 30, 31])
def test_oversized_hlit_rejected(hlit_field):
    """HLIT is a 5-bit field reaching 257+31=288 > the 286-symbol alphabet.

    Values 287/288 must be rejected by every engine with a clean
    DeflateError — not an out-of-bounds write (native) or a numpy
    broadcast ValueError (serial).  Mirrors the reference's implicit
    bound (heap Vec collection in src/deflate/symbol.rs).
    """
    from libflate_tpu.serial.bitio import BitWriter
    from libflate_tpu.serial.deflate import DeflateError, inflate as s_inflate

    w = BitWriter()
    w.write_bits(1, 1)            # BFINAL
    w.write_bits(2, 2)            # BTYPE=dynamic
    w.write_bits(hlit_field, 5)   # HLIT -> 257+field literal codes
    w.write_bits(0, 5)            # HDIST -> 1
    w.write_bits(15, 4)           # HCLEN -> 19 CLC widths follow
    # CLC: symbol 18 (3rd in CLC order) len 1, symbol 0 (4th) len 1
    for k in range(19):
        w.write_bits(1 if k in (2, 3) else 0, 3)
    # fill the whole table with zeros via repeated 18-runs (code '0'=sym18)
    for _ in range(4):
        w.write_bits(0, 1)        # sym 18
        w.write_bits(127, 7)      # run 138
    data = w.getvalue() if hasattr(w, "getvalue") else bytes(w.finish())

    expect_ok = hlit_field <= 29  # 286 symbols is legal per the alphabet cap
    try:
        s_inflate(data)
        serial_raised = None
    except DeflateError as e:
        serial_raised = str(e)
    except EOFError:
        serial_raised = "eof"
    if not expect_ok:
        assert serial_raised is not None and "broadcast" not in serial_raised

    native = pytest.importorskip("libflate_tpu.native")
    if native.available():
        try:
            native.inflate(data)
        except Exception as e:
            assert not isinstance(e, (MemoryError, SystemError))
