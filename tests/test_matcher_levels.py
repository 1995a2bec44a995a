"""Native matcher levels: greedy / lazy / hash-chain correctness + ratio
ordering."""
import zlib as pyzlib

import numpy as np
import pytest

from libflate_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

CORPUS = (b"the quick brown fox jumps over the lazy dog -- "
          b"pack my box with five dozen liquor jugs -- ") * 400


@pytest.mark.parametrize("lazy", [False, True])
@pytest.mark.parametrize("max_chain", [1, 8, 64])
def test_roundtrip_all_levels(lazy, max_chain):
    rng = np.random.default_rng(0)
    for n in (0, 1, 10, 1000, 40000):
        for payload in (bytes(rng.integers(0, 256, n, dtype=np.uint8)),
                        CORPUS[:n]):
            enc = native.deflate_greedy(payload, block_size=16384,
                                        lazy=lazy, max_chain=max_chain)
            d = pyzlib.decompressobj(-15)
            assert d.decompress(enc) == payload


def test_ratio_ordering():
    greedy = len(native.deflate_greedy(CORPUS, lazy=False, max_chain=1))
    lazy = len(native.deflate_greedy(CORPUS, lazy=True, max_chain=1))
    chain = len(native.deflate_greedy(CORPUS, lazy=True, max_chain=32))
    assert chain <= lazy <= greedy
    # hash chains on repetitive text must be clearly better
    assert chain < greedy


def test_pgzf_level_options():
    import gzip as pygzip

    from libflate_tpu.formats import pgzf
    from libflate_tpu.serial.deflate import EncodeOptions
    data = CORPUS * 4
    fast = pgzf.compress(data, engine="native",
                         options=EncodeOptions(matcher="greedy"))
    best = pgzf.compress(data, engine="native",
                         options=EncodeOptions(matcher="chain"))
    assert len(best) <= len(fast)
    assert pygzip.decompress(best) == data
    assert pgzf.decompress(best, engine="native") == data


def test_matches_crossing_lazy_boundaries():
    # pathological for lazy logic: alternating better-next matches
    parts = []
    rng = np.random.default_rng(1)
    words = [bytes(rng.integers(97, 123, k, dtype=np.uint8))
             for k in (4, 5, 6, 7, 8)]
    for i in range(3000):
        parts.append(words[i % 5])
        if i % 7 == 0:
            parts.append(words[(i + 2) % 5] + words[(i + 3) % 5])
    payload = b"".join(parts)
    for mc in (1, 32):
        enc = native.deflate_greedy(payload, block_size=8192, lazy=True,
                                    max_chain=mc)
        d = pyzlib.decompressobj(-15)
        assert d.decompress(enc) == payload
