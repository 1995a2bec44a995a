"""Bitonic sort kernel + sort-based candidate finder vs brute force
(CPU, interpret mode, small shapes — production shapes run minutes in
the Pallas interpreter)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    yield


def test_sort_pairs_matches_numpy(interpret):
    from libflate_tpu.ops.pallas_sort import sort_pairs

    rng = np.random.default_rng(0)
    for n in (1024, 4096):
        k = rng.integers(-2 ** 31, 2 ** 31, (2, n),
                         dtype=np.int64).astype(np.int32)
        p = np.arange(n, dtype=np.int32)[None].repeat(2, 0)
        ks, ps = map(np.asarray, sort_pairs(jnp.asarray(k),
                                            jnp.asarray(p)))
        for b in range(2):
            assert (ks[b] == np.sort(k[b])).all()
            assert (k[b][ps[b]] == ks[b]).all()


def test_sort_pairs_tiebreak_orders_payload(interpret):
    from libflate_tpu.ops.pallas_sort import sort_pairs

    rng = np.random.default_rng(1)
    k = rng.integers(0, 7, (1, 2048), dtype=np.int64).astype(np.int32)
    p = np.arange(2048, dtype=np.int32)[None]
    ks, ps = map(np.asarray, sort_pairs(jnp.asarray(k), jnp.asarray(p),
                                        tiebreak=True))
    order = np.lexsort((p[0], k[0]))
    assert (ks[0] == k[0][order]).all()
    assert (ps[0] == p[0][order]).all()


def test_sort_multi_carries_payloads(interpret):
    # n=1024 (phase A only): the interpreted multi-payload network at
    # n>=2048 costs ~10 min of XLA:CPU compile; the cross-vreg phases
    # are covered by test_sort_pairs_matches_numpy at n=4096 and by the
    # TPU-side round-trip checks
    from libflate_tpu.ops.pallas_sort import sort_multi

    rng = np.random.default_rng(5)
    k = rng.integers(0, 50, (2, 1024), dtype=np.int64).astype(np.int32)
    p0 = np.arange(1024, dtype=np.int32)[None].repeat(2, 0)
    p1 = rng.integers(-2 ** 31, 2 ** 31, (2, 1024),
                      dtype=np.int64).astype(np.int32)
    p2 = rng.integers(-2 ** 31, 2 ** 31, (2, 1024),
                      dtype=np.int64).astype(np.int32)
    ks, q0, q1, q2 = map(np.asarray, sort_multi(
        jnp.asarray(k), jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(p2), tiebreak=True))
    for b in range(2):
        order = np.lexsort((p0[b], k[b]))
        assert (ks[b] == k[b][order]).all()
        assert (q0[b] == p0[b][order]).all()
        assert (q1[b] == p1[b][order]).all()
        assert (q2[b] == p2[b][order]).all()


def test_sort_candidates_vs_bruteforce(interpret):
    from libflate_tpu.ops.sort_match import M_EXACT, sort_candidates

    rng = np.random.default_rng(3)
    n, window = 1024, 512
    words = [bytes(rng.integers(97, 103, rng.integers(3, 8),
                                dtype=np.uint8)) for _ in range(30)]
    data = b"".join(words[int(i)] for i in rng.zipf(1.3, 1200) % 30)[:n]
    arr = np.frombuffer(data, np.uint8)[None, :].copy()
    cand, m = map(np.asarray, sort_candidates(
        jnp.asarray(arr), window=window, scan_k=8))

    def pref(a, b, cap=M_EXACT):
        length = 0
        while (length < cap and b + length < len(data)
               and data[a + length] == data[b + length]):
            length += 1
        return length

    # every reported candidate is in-window with the claimed EXACT
    # shared length (clipped to M_EXACT; padding zeros past the member
    # end can only inflate claims in the last M_EXACT bytes)
    for p in range(n):
        c = int(cand[0, p])
        if c >= 0:
            assert 0 < p - c <= window
            assert 3 <= m[0, p] <= M_EXACT
            if p + M_EXACT <= n:
                assert pref(c, p) == int(m[0, p]), p

    # the nearest exact 4-byte repeat is never missed
    seen = {}
    for p in range(n - 4):
        key = data[p:p + 4]
        if key in seen and p - seen[key] <= window:
            assert int(cand[0, p]) >= 0 and int(m[0, p]) >= 4, p
        seen[key] = p
