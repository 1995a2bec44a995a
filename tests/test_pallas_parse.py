"""Greedy-parse Pallas kernels (ops/pallas_parse) — interpret mode.

The padded stream-order token layout must be token- and bit-identical
to the compacted XLA parse (reference semantics:
libflate_lz77/src/default.rs:69-109 ``p += max(1, len[p])``).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from libflate_tpu.ops import lz77  # noqa: E402


def _mixed_blocks(rng, lanes, n):
    blocks = np.zeros((lanes, n), np.uint8)
    for i in range(lanes):
        words = [bytes(rng.integers(97, 103, int(rng.integers(2, 9)),
                                    dtype=np.uint8)) for _ in range(30)]
        row = bytearray()
        while len(row) < n:
            row += words[int(rng.integers(0, 30))]
        blocks[i] = np.frombuffer(bytes(row[:n]), np.uint8)
    blocks[0] = rng.integers(0, 256, n)       # incompressible lane
    blocks[1] = 65                             # one giant run
    return blocks


class TestParseKernels:
    def test_padded_tokens_match_compacted_parse(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops.pallas_parse import parse_tokens_pallas

        rng = np.random.default_rng(1)
        B, n = 128, 2048
        blocks = _mixed_blocks(rng, B, n)
        n_valid = np.full(B, n, np.int32)
        n_valid[2] = 1000
        n_valid[3] = 0
        blocks_j, nv = jnp.asarray(blocks), jnp.asarray(n_valid)

        cand = jax.vmap(lz77.prefix_candidates)(blocks_j)
        ref = jax.vmap(lambda blk, nvv, cd: lz77.tokenize_block_from_cand(
            blk, nvv, n + 1, cd))(blocks_j, nv, cand)
        ra, rb, rcnt = map(np.asarray, ref)

        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        cand_m = jnp.where(idx < nv[:, None], cand, -1)
        lengths = jax.vmap(lz77.match_lengths)(blocks_j, cand_m)
        lengths = jnp.minimum(lengths, jnp.maximum(nv[:, None] - idx, 0))
        lengths = jnp.where(lengths >= 3, lengths, 0)

        a, b, valid, n_tok, ovf = map(np.asarray, parse_tokens_pallas(
            blocks_j, nv, cand_m, lengths))
        assert not ovf.any()          # cap=512 can never overflow
        assert (n_tok == rcnt).all()
        for i in range(B):
            assert np.array_equal(a[i][valid[i]], ra[i][:rcnt[i]]), i
            assert np.array_equal(b[i][valid[i]], rb[i][:rcnt[i]]), i

    def test_padded_sync_encode_bit_identical(self, monkeypatch):
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        # pin greedy: the compacted comparison path has no lazy rule
        monkeypatch.setenv("LIBFLATE_DEVICE_GREEDY", "1")
        from libflate_tpu.ops import pipeline as pp
        from libflate_tpu.ops.pallas_lz77 import prefix_candidates_pallas

        rng = np.random.default_rng(7)
        B, n = 128, 2048
        blocks = _mixed_blocks(rng, B, n)
        nv = np.full(B, n, np.int32)
        nv[3] = 777
        blocks[3, 777:] = 0
        blocks_j, nv_j = jnp.asarray(blocks), jnp.asarray(nv)
        bfinal = jnp.ones((B,), jnp.int32)

        assert pp._use_padded_parse(blocks_j)
        w1, b1, cnt1, off1, ovf1 = pp._encode_batch_sync(
            blocks_j, nv_j, bfinal, 256, cap=512)
        assert not np.asarray(ovf1).any()

        cand = prefix_candidates_pallas(blocks_j)
        a, b, cnt = pp._tokenize_tail(blocks_j, nv_j, cand)
        values, widths = pp._fields_batch_shared(a, b, cnt, bfinal)
        w2, b2 = pp._pack_batch(values, widths)
        off2 = pp._sync_offsets_batch(widths, 256)

        w1, b1, cnt1, off1, w2, b2, cnt, off2 = map(
            np.asarray, (w1, b1, cnt1, off1, w2, b2, cnt, off2))
        assert (b1 == b2).all() and (cnt1 == cnt).all()
        for i in range(B):
            nw = (int(b1[i]) + 31) // 32
            assert (w1[i, :nw] == w2[i, :nw]).all(), i
        nch = -(-cnt // 256)
        for i in range(B):
            assert (off1[i, :nch[i]] == off2[i, :nch[i]]).all(), i

    def test_lcp_kernel_matches_xla_lengths(self, monkeypatch):
        """pallas_lcp vs ops.lz77.match_lengths under the same round
        cap (reference byte loop: libflate_lz77/src/default.rs:111-129)."""
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops.pallas_lcp import match_lengths_pallas

        rng = np.random.default_rng(11)
        B, n, rounds = 4, 2048, 8
        blocks = _mixed_blocks(rng, B, n)[:B]
        n_valid = np.full(B, n, np.int32)
        n_valid[2] = 1234
        blocks_j, nv = jnp.asarray(blocks), jnp.asarray(n_valid)

        cand = jax.vmap(lz77.prefix_candidates)(blocks_j)
        idx = np.arange(n, dtype=np.int32)[None, :]
        cand = jnp.where(jnp.asarray(idx) < nv[:, None], cand, -1)

        ref = jax.vmap(lambda d, c: lz77.match_lengths(
            d, c, max_rounds=rounds))(blocks_j, cand)
        lim = np.maximum(n_valid[:, None] - idx, 0)
        ref = np.minimum(np.asarray(ref), lim)
        ref = np.where(np.asarray(cand) >= 0, ref, 0)

        got = np.asarray(match_lengths_pallas(blocks_j, cand, nv,
                                              max_rounds=rounds))
        got = np.minimum(np.where(np.asarray(cand) >= 0, got, 0), lim)
        assert np.array_equal(ref, got)
        assert (ref >= 3).sum() > 100     # the corpus really has matches

    def test_lazy_tokens_roundtrip_and_shrink(self, monkeypatch):
        """Default lazy+TOO_FAR path: tokens expand back to the input
        and never exceed the greedy token stream's bit cost class."""
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops import pipeline as pp
        from libflate_tpu.serial.lz77 import expand_tokens

        rng = np.random.default_rng(3)
        B, n = 128, 2048
        blocks = _mixed_blocks(rng, B, n)
        nv = np.full(B, n, np.int32)
        nv[5] = 513
        blocks[5, 513:] = 0
        blocks_j, nv_j = jnp.asarray(blocks), jnp.asarray(nv)

        a, b, valid, cnt, _ = map(np.asarray, pp._tokenize_padded(
            blocks_j, nv_j, lazy=True, cap=512))
        ag, bg, vg, cg, _ = map(np.asarray, pp._tokenize_padded(
            blocks_j, nv_j, lazy=False, cap=512))
        for i in (0, 1, 5, 64, 127):
            toks = list(zip(a[i][valid[i]].tolist(),
                            b[i][valid[i]].tolist()))
            assert bytes(expand_tokens(toks)) == \
                blocks[i, :nv[i]].tobytes(), f"lane {i}"
        # lazy emits no more matches than greedy turns into literals;
        # total token count can only grow, but match coverage decides
        # size — just sanity-check both decode identically
        for i in (2, 3):
            toks = list(zip(ag[i][vg[i]].tolist(), bg[i][vg[i]].tolist()))
            assert bytes(expand_tokens(toks)) == \
                blocks[i, :nv[i]].tobytes()


class TestParseCap:
    def test_capped_parse_flags_only_dense_lanes(self, monkeypatch):
        """cap < 512: literal-dense chunks overflow (flagged); lanes
        that fit keep token streams identical to the uncapped parse."""
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        from libflate_tpu.ops.pallas_parse import parse_tokens_pallas

        rng = np.random.default_rng(5)
        B, n, cap = 128, 2048, 256
        blocks = _mixed_blocks(rng, B, n)   # lane 0 incompressible
        nv = jnp.asarray(np.full(B, n, np.int32))
        blocks_j = jnp.asarray(blocks)

        cand = jax.vmap(lz77.prefix_candidates)(blocks_j)
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        cand = jnp.where(idx < nv[:, None], cand, -1)
        lengths = jax.vmap(lz77.match_lengths)(blocks_j, cand)
        lengths = jnp.minimum(lengths, jnp.maximum(nv[:, None] - idx, 0))
        lengths = jnp.where(lengths >= 3, lengths, 0)

        fa, fb, fv, fcnt, fovf = map(np.asarray, parse_tokens_pallas(
            blocks_j, nv, cand, lengths))
        ca, cb, cv, ccnt, covf = map(np.asarray, parse_tokens_pallas(
            blocks_j, nv, cand, lengths, cap))
        assert not fovf.any()
        assert covf[0]                       # all-literal chunks: 512 > cap
        assert not covf[1]                   # giant run: ~1 token/chunk
        assert covf.mean() < 0.5             # corpus lanes mostly fit
        for i in range(B):
            if covf[i]:
                continue
            assert ccnt[i] == fcnt[i], i
            assert np.array_equal(ca[i][cv[i]], fa[i][fv[i]]), i
            assert np.array_equal(cb[i][cv[i]], fb[i][fv[i]]), i

    def test_pgzf_fallback_roundtrips_tiny_cap(self, monkeypatch):
        """With an absurdly small slot budget every member overflows;
        the pgzf device encoder must detect it and re-encode at 512."""
        monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("LIBFLATE_PARSE_CAP", "8")
        from libflate_tpu.formats import pgzf

        rng = np.random.default_rng(9)
        data = _mixed_blocks(rng, 4, 2048).tobytes()
        stream = pgzf.compress(data, member_size=2048, engine="tpu")
        assert pgzf.decompress(stream, engine="serial") == data


def test_windowed_lcp_matches_xla(monkeypatch):
    """match_lengths_pallas(window=W) == the XLA lengths when every
    candidate is within W (the caller masks farther ones to -1)."""
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    from libflate_tpu.ops.pallas_lcp import match_lengths_pallas

    rng = np.random.default_rng(11)
    B, n, rounds, W = 4, 4096, 8, 1024
    blocks = _mixed_blocks(rng, B, n)[:B]
    nv = np.full(B, n, np.int32)
    nv[2] = 3000
    bj, nvj = jnp.asarray(blocks), jnp.asarray(nv)
    cand = jax.vmap(lz77.prefix_candidates)(bj)
    idx = np.arange(n, dtype=np.int32)[None, :]
    cand = jnp.where((jnp.asarray(idx) < nvj[:, None])
                     & (idx - cand <= W), cand, -1)
    ref = jax.vmap(lambda d, c: lz77.match_lengths(
        d, c, max_rounds=rounds))(bj, cand)
    lim = np.maximum(nv[:, None] - idx, 0)
    ref = np.where(np.asarray(cand) >= 0,
                   np.minimum(np.asarray(ref), lim), 0)
    got = np.asarray(match_lengths_pallas(bj, cand, nvj,
                                          max_rounds=rounds, window=W))
    got = np.minimum(np.where(np.asarray(cand) >= 0, got, 0), lim)
    assert np.array_equal(ref, got)
    assert (ref >= 3).sum() > 1000
