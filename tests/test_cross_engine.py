"""Cross-engine differential fuzzing.

Every engine must decode every other engine's output (plus stdlib
zlib's), across block types, matchers and sizes — the framework-level
analog of the reference's issue-#2 random round-trip tests.
"""
import zlib as pyzlib

import numpy as np
import pytest

from libflate_tpu import backend, native
from libflate_tpu.serial.deflate import EncodeOptions


def _engines():
    names = ["serial"]
    if native.available():
        names.append("native")
    import libflate_tpu.ops.pipeline  # noqa: F401  (registers "tpu")
    names.append("tpu")
    return names


def _payloads(rng):
    n = int(rng.integers(0, 30000))
    kind = int(rng.integers(0, 4))
    if kind == 0:
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))
    if kind == 1:
        return bytes(rng.integers(0, 4, n, dtype=np.uint8))
    if kind == 2:
        return (b"differential cross engine words " * (n // 30 + 1))[:n]
    piece = bytes(rng.integers(0, 256, max(n // 3, 1), dtype=np.uint8))
    return (piece * 4)[:n]


OPTIONS = [
    EncodeOptions(),
    EncodeOptions(matcher="chain"),
    EncodeOptions(block_type="fixed"),
    EncodeOptions(block_type="stored", matcher="none"),
    EncodeOptions(block_size=4096),
]


@pytest.mark.parametrize("trial", range(12))
def test_every_engine_decodes_every_encoder(trial):
    rng = np.random.default_rng(1000 + trial)
    data = _payloads(rng)
    opts = OPTIONS[trial % len(OPTIONS)]
    streams = {"zlib-stdlib": pyzlib.compress(data, 6)[2:-4]}
    for name in _engines():
        streams[name] = bytes(backend.get(name).deflate(data, opts))
    for enc_name, stream in streams.items():
        # stdlib decodes ours
        if enc_name != "zlib-stdlib":
            d = pyzlib.decompressobj(-15)
            assert d.decompress(stream) == data, enc_name
        # each engine decodes each stream
        for dec_name in _engines():
            out = bytes(backend.get(dec_name).inflate(stream).data)
            assert out == data, (enc_name, dec_name, len(data))
