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
