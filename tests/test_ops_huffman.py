"""Device Huffman ops vs the serial oracle."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from libflate_tpu.ops.huffman import (canonical_codes_jax, decode_table,
                                      package_merge_lengths,
                                      reverse_codes_jax)
from libflate_tpu.serial.huffman import (HuffmanDecoder, canonical_codes,
                                         package_merge, reverse_bits)
from libflate_tpu.spec.constants import fixed_dist_lengths, \
    fixed_litlen_lengths


class TestPackageMerge:
    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.parametrize("limit,size", [(15, 286), (7, 19), (15, 30)])
    def test_matches_serial_total_bits(self, seed, limit, size):
        rng = np.random.default_rng(seed)
        freqs = rng.integers(0, 2000, size=size).astype(np.int32)
        dev = np.asarray(package_merge_lengths(jnp.asarray(freqs), limit))
        ser = package_merge(freqs, limit)
        # individual lengths may differ on ties; total cost must not
        assert int((freqs * dev).sum()) == int((freqs * ser).sum())
        used = dev[freqs > 0]
        assert (used > 0).all() and (used <= limit).all()
        assert (dev[freqs == 0] == 0).all()
        assert np.sum(2.0 ** -used.astype(float)) <= 1.0 + 1e-12

    def test_tight_limit(self):
        # skewed distribution forced flat by the limit
        freqs = np.array([1, 1, 2, 4, 8, 16, 32, 64], dtype=np.int32)
        dev = np.asarray(package_merge_lengths(jnp.asarray(freqs), 3))
        assert (dev == 3).all()

    def test_single_symbol(self):
        freqs = np.zeros(286, dtype=np.int32)
        freqs[256] = 7
        dev = np.asarray(package_merge_lengths(jnp.asarray(freqs), 15))
        assert dev[256] == 1 and dev.sum() == 1

    def test_empty(self):
        dev = np.asarray(package_merge_lengths(jnp.zeros(286, jnp.int32), 15))
        assert (dev == 0).all()

    def test_two_symbols(self):
        freqs = np.zeros(10, dtype=np.int32)
        freqs[2], freqs[7] = 1000, 1
        dev = np.asarray(package_merge_lengths(jnp.asarray(freqs), 15))
        assert dev[2] == 1 and dev[7] == 1


class TestCanonicalCodes:
    @pytest.mark.parametrize("lengths", [
        [3, 3, 3, 3, 3, 2, 4, 4],                      # RFC-1951 example
        list(fixed_litlen_lengths()),
        list(fixed_dist_lengths()),
    ])
    def test_matches_serial(self, lengths):
        arr = np.array(lengths, dtype=np.int32)
        dev = np.asarray(canonical_codes_jax(jnp.asarray(arr)))
        ser = canonical_codes(arr)
        assert (dev == ser).all()

    def test_reverse_codes(self):
        arr = np.array([3, 3, 3, 3, 3, 2, 4, 4], dtype=np.int32)
        codes = canonical_codes(arr)
        dev = np.asarray(reverse_codes_jax(jnp.asarray(codes),
                                           jnp.asarray(arr)))
        for i, (c, l) in enumerate(zip(codes, arr)):
            assert dev[i] == reverse_bits(int(c), int(l))


class TestDecodeTable:
    @pytest.mark.parametrize("make", [
        lambda: fixed_litlen_lengths(),
        lambda: fixed_dist_lengths(),
        lambda: package_merge(
            np.random.default_rng(3).integers(0, 500, 286), 15),
    ])
    def test_matches_serial_table(self, make):
        lengths = np.asarray(make(), dtype=np.int32)
        ser = HuffmanDecoder(lengths)
        bits = int(lengths.max())
        dev = np.asarray(decode_table(jnp.asarray(lengths), bits))
        # serial table entries: (sym<<4)|width, invalid = 0xFFFF
        ser_t = ser.table.astype(np.int64)
        dev_t = dev.astype(np.int64)
        valid = ser_t != 0xFFFF
        assert (dev_t[valid] == ser_t[valid]).all()
        assert (dev_t[~valid] == 0).all()

    def test_full_15bit_table(self):
        lengths = np.asarray(fixed_litlen_lengths(), dtype=np.int32)
        dev = np.asarray(decode_table(jnp.asarray(lengths), 15))
        ser = HuffmanDecoder(lengths)   # max_len 9 => table 2^9
        # every 15-bit pattern's low 9 bits must agree with serial
        for probe in (0, 1, 0x1FF, 0x7FFF, 12345):
            ent = dev[probe]
            sent = ser.table[probe & 0x1FF]
            assert int(ent) == int(sent)
