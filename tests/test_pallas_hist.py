"""Histogram kernel (ops/pallas_hist) — interpret mode + symbol math.

Oracle: deflate_encode.token_histograms_masked (table-gather + scatter
formulation) summed over the batch.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


class TestSymbolArith:
    def test_length_symbols_match_table(self):
        from libflate_tpu.ops.deflate_encode import _LEN_CODE
        from libflate_tpu.ops.pallas_hist import length_symbol_arith
        lengths = jnp.arange(3, 259, dtype=jnp.int32)
        got = np.asarray(length_symbol_arith(lengths))
        ref = np.asarray(_LEN_CODE)[3:259]
        assert np.array_equal(got, ref)

    def test_dist_symbols_match_table(self):
        from libflate_tpu.ops.deflate_encode import _DIST_CODE
        from libflate_tpu.ops.pallas_hist import dist_symbol_arith
        dists = jnp.arange(1, 32769, dtype=jnp.int32)
        got = np.asarray(dist_symbol_arith(dists))
        ref = np.asarray(_DIST_CODE)[1:32769]
        assert np.array_equal(got, ref)


class TestHistKernel:
    def test_matches_scatter_histograms(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops.deflate_encode import token_histograms_masked
        from libflate_tpu.ops.pallas_hist import shared_histograms_pallas

        rng = np.random.default_rng(5)
        B, m = 128, 1024
        a = np.zeros((B, m), np.int32)
        b = np.zeros((B, m), np.int32)
        valid = rng.random((B, m)) < 0.7
        is_match = (rng.random((B, m)) < 0.3) & valid
        a[...] = rng.integers(0, 256, (B, m))
        a[is_match] = rng.integers(3, 259, int(is_match.sum()))
        b[is_match] = rng.integers(1, 32769, int(is_match.sum()))
        # every member gets at least one match (the kernel emits one
        # global all-literal dummy where the oracle emits per-member
        # ones — keep the corpora in the common regime)
        a[:, 0] = 3
        b[:, 0] = 1
        valid[:, 0] = True

        aj, bj, vj = map(jnp.asarray, (a, b, valid))
        ref_l, ref_d = jax.vmap(token_histograms_masked)(aj, bj, vj)
        ref_l = np.asarray(jnp.sum(ref_l, axis=0))
        ref_d = np.asarray(jnp.sum(ref_d, axis=0))
        got_l, got_d = map(np.asarray, shared_histograms_pallas(aj, bj, vj))
        assert np.array_equal(got_l, ref_l)
        assert np.array_equal(got_d, ref_d)

    def test_all_literal_dummy_dist(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops.pallas_hist import shared_histograms_pallas
        B, m = 128, 1024
        a = jnp.full((B, m), 65, jnp.int32)
        b = jnp.zeros((B, m), jnp.int32)
        valid = jnp.ones((B, m), jnp.bool_)
        lit, dist = map(np.asarray, shared_histograms_pallas(a, b, valid))
        assert lit[65] == B * m
        assert lit[256] == B          # one EOB per member
        assert dist[0] == 1 and dist[1:].sum() == 0
