"""Checksum tests: known-answer vectors, oracle equality, combine operators.

Parity: reference src/checksum.rs:40-57 known-answer tests, plus the
shard-combine math the parallel layer depends on.
"""
import os
import zlib as pyzlib

from libflate_tpu.utils.checksum import (Adler32, Crc32, adler32,
                                         adler32_combine, crc32,
                                         crc32_combine)


def test_known_answers():
    # parity vectors: src/checksum.rs:45-56
    assert crc32(b"abcde") == 0x8587D865
    assert adler32(b"abcde") == 0x05C801F0


def test_empty():
    assert crc32(b"") == 0
    assert adler32(b"") == 1


def test_oracle_equality():
    rng = os.urandom
    for n in (1, 7, 8, 9, 63, 64, 65, 1000, 65521, 100000):
        data = rng(n)
        assert crc32(data) == pyzlib.crc32(data), n
        assert adler32(data) == pyzlib.adler32(data), n


def test_streaming_update():
    data = os.urandom(10000)
    c, a = Crc32(), Adler32()
    for i in range(0, len(data), 997):
        c.update(data[i:i + 997])
        a.update(data[i:i + 997])
    assert c.value() == pyzlib.crc32(data)
    assert a.value() == pyzlib.adler32(data)


def test_combine_operators():
    data = os.urandom(50000)
    for split in (0, 1, 13, 25000, 49999, 50000):
        x, y = data[:split], data[split:]
        assert crc32_combine(crc32(x), crc32(y), len(y)) == pyzlib.crc32(data)
        assert adler32_combine(adler32(x), adler32(y),
                               len(y)) == pyzlib.adler32(data)


def test_combine_associative_many_shards():
    data = os.urandom(32 * 1024)
    shard = 1024
    crcs = [crc32(data[i:i + shard]) for i in range(0, len(data), shard)]
    adls = [adler32(data[i:i + shard]) for i in range(0, len(data), shard)]
    c, a = crcs[0], adls[0]
    for i in range(1, len(crcs)):
        c = crc32_combine(c, crcs[i], shard)
        a = adler32_combine(a, adls[i], shard)
    assert c == pyzlib.crc32(data)
    assert a == pyzlib.adler32(data)
