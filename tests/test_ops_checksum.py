"""Device checksum kernels vs the zlib oracle and host implementations."""
import os
import zlib as pyzlib

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from libflate_tpu.ops.checksum import (adler32_combine_jax, adler32_jax,
                                       crc32_combine_jax, crc32_jax)


def _arr(data: bytes):
    return jnp.asarray(np.frombuffer(data, np.uint8))


@pytest.mark.parametrize("n", [0, 1, 5, 63, 64, 65, 128, 1000, 4096, 100001])
def test_crc32_matches_zlib(n):
    data = os.urandom(n)
    assert int(crc32_jax(_arr(data))) == pyzlib.crc32(data)


@pytest.mark.parametrize("n", [0, 1, 5, 1023, 1024, 1025, 100001])
def test_adler32_matches_zlib(n):
    data = os.urandom(n)
    assert int(adler32_jax(_arr(data))) == pyzlib.adler32(data)


def test_crc32_combine_device():
    data = os.urandom(30000)
    x, y = data[:9999], data[9999:]
    c = crc32_combine_jax(crc32_jax(_arr(x)), crc32_jax(_arr(y)), len(y))
    assert int(c) == pyzlib.crc32(data)


def test_adler32_combine_device():
    data = os.urandom(30000)
    x, y = data[:9999], data[9999:]
    a = adler32_combine_jax(adler32_jax(_arr(x)), adler32_jax(_arr(y)),
                            len(y))
    assert int(a) == pyzlib.adler32(data)


@pytest.mark.parametrize("row_bytes", [
    4096,    # 64 chunks (power of two)
    3072,    # 48 chunks (NOT a power of two — round-2 regression)
    24576,   # 384 chunks (not a power of two)
    100,     # not even a CHUNK multiple
])
def test_crc32_f_rows_left_aligned(row_bytes):
    """Fused encode-path CRC: left-aligned rows + host padding fold."""
    from libflate_tpu.ops.checksum import crc32_f_rows, crc32_from_padded_f
    rng = np.random.default_rng(7)
    lens = [ln for ln in (0, 1, 63, 64, 100, 4095, 4096, row_bytes)
            if ln <= row_bytes]
    rows = np.zeros((len(lens), row_bytes), np.uint8)
    payloads = []
    for i, ln in enumerate(lens):
        p = rng.integers(0, 256, ln, dtype=np.uint8).tobytes()
        rows[i, :ln] = np.frombuffer(p, np.uint8)
        payloads.append(p)
    f = crc32_f_rows(jnp.asarray(rows))
    crcs = crc32_from_padded_f(np.asarray(f), np.asarray(lens), row_bytes)
    for i, p in enumerate(payloads):
        expect = pyzlib.crc32(p) if lens[i] else 0
        assert int(crcs[i]) == expect, f"row {i} len {lens[i]}"
