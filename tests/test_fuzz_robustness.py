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
