"""Speculative-decoder phase B (chain-follow + compaction) unit tests.

The Pallas position-decode kernel itself is exercised on TPU (and in
interpret mode in test_interpret_kernel below); these tests pin the
pure-XLA chain-follow and token compaction against python references.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from libflate_tpu.ops.deflate_decode import (compact_marked_tokens,
                                             follow_token_chain)
from libflate_tpu.ops.pallas_decode import BAD_FLAG, EOB_FLAG


def _py_orbit(nxt, start):
    marks = np.zeros(len(nxt), bool)
    p = start
    while True:
        marks[p] = True
        if nxt[p] == p:
            return marks
        p = nxt[p]


class TestFollowChain:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_chains(self, seed):
        rng = np.random.default_rng(seed)
        p_total = 4096
        nxt = np.minimum(
            np.arange(p_total) + rng.integers(1, 49, p_total),
            p_total - 1).astype(np.int32)
        eob = int(rng.integers(p_total // 2, p_total - 1))
        nxt[eob] = eob                      # fixed point (EOB)
        nxt[p_total - 1] = p_total - 1
        start = int(rng.integers(0, 40))
        ref = _py_orbit(nxt, start)
        got = np.asarray(follow_token_chain(jnp.asarray(nxt),
                                            jnp.int32(start)))
        assert (got == ref).all()

    def test_start_is_fixed_point(self):
        nxt = np.arange(512, dtype=np.int32)
        got = np.asarray(follow_token_chain(jnp.asarray(nxt),
                                            jnp.int32(7)))
        assert got[7] and got.sum() == 1

    def test_chunk_boundary_jumps(self):
        # jumps that land exactly on chunk boundaries
        p_total = 2048
        nxt = (np.arange(p_total) + 512).clip(max=p_total - 1).astype(
            np.int32)
        nxt[p_total - 1] = p_total - 1
        ref = _py_orbit(nxt, 0)
        got = np.asarray(follow_token_chain(jnp.asarray(nxt),
                                            jnp.int32(0)))
        assert (got == ref).all()


class TestCompact:
    def test_tokens_and_eob(self):
        p = 2048
        tok = np.zeros(p, np.int32)
        marks = np.zeros(p, bool)
        expected = []
        pos = 3
        rng = np.random.default_rng(1)
        for k in range(40):
            if k == 39:
                tok[pos] = EOB_FLAG
                marks[pos] = True
                break
            a = int(rng.integers(0, 256))
            b = int(rng.integers(0, 2)) * int(rng.integers(1, 300))
            if b:
                a = int(rng.integers(3, 259))
            tok[pos] = (a & 0x1FF) | (b << 9)
            marks[pos] = True
            expected.append((a, b))
            pos += int(rng.integers(5, 40))
        a, b, nt, err = compact_marked_tokens(jnp.asarray(tok),
                                              jnp.asarray(marks), 64)
        assert not bool(err)
        assert int(nt) == len(expected)
        got = list(zip(np.asarray(a)[:int(nt)].tolist(),
                       np.asarray(b)[:int(nt)].tolist()))
        assert got == expected

    def test_bad_flag_errors(self):
        tok = np.zeros(512, np.int32)
        marks = np.zeros(512, bool)
        tok[5] = BAD_FLAG
        marks[5] = True
        _, _, _, err = compact_marked_tokens(jnp.asarray(tok),
                                             jnp.asarray(marks), 16)
        assert bool(err)

    def test_missing_eob_errors(self):
        tok = np.zeros(512, np.int32)
        marks = np.zeros(512, bool)
        tok[5] = 65
        marks[5] = True
        _, _, _, err = compact_marked_tokens(jnp.asarray(tok),
                                             jnp.asarray(marks), 16)
        assert bool(err)          # chain never reached an EOB
