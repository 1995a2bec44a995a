"""Batched Pallas gather kernel — interpret-mode semantics on CPU."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setenv("LIBFLATE_PALLAS_INTERPRET", "1")
    yield


@pytest.mark.parametrize("skip", [True, False])
@pytest.mark.parametrize("rows,n_out", [(64, 16), (512, 64), (72, 8)])
def test_gather_rows_matches_numpy(interpret, skip, rows, n_out):
    from libflate_tpu.ops.pallas_gather import gather_rows

    rng = np.random.default_rng(rows + n_out)
    bsz = 3
    tab = rng.integers(-2**31, 2**31, (bsz, rows, 128), np.int64
                       ).astype(np.int32)
    idx = rng.integers(0, rows * 128, (bsz, n_out, 128)).astype(np.int32)
    out = np.asarray(gather_rows(jnp.asarray(tab), jnp.asarray(idx),
                                 skip=skip))
    want = np.take_along_axis(tab.reshape(bsz, -1),
                              idx.reshape(bsz, -1), axis=1
                              ).reshape(bsz, n_out, 128)
    np.testing.assert_array_equal(out, want)


def test_gather_rows_local_indices(interpret):
    """Locality-skip path with tightly clustered indices."""
    from libflate_tpu.ops.pallas_gather import gather_rows

    rng = np.random.default_rng(0)
    tab = rng.integers(0, 100, (1, 256, 128)).astype(np.int32)
    base = np.arange(32 * 128).reshape(1, 32, 128) * 0 + 5000
    idx = (base + rng.integers(0, 64, base.shape)).astype(np.int32)
    out = np.asarray(gather_rows(jnp.asarray(tab), jnp.asarray(idx)))
    want = np.take_along_axis(tab.reshape(1, -1), idx.reshape(1, -1),
                              axis=1).reshape(idx.shape)
    np.testing.assert_array_equal(out, want)


def test_gather_rows_clips_out_of_range(interpret):
    from libflate_tpu.ops.pallas_gather import gather_rows

    tab = np.arange(8 * 128, dtype=np.int32).reshape(1, 8, 128)
    idx = np.zeros((1, 8, 128), np.int32)
    idx[0, 0, :] = -5                 # clips to 0
    idx[0, 4, :] = 5000               # clips to 1023
    out = np.asarray(gather_rows(jnp.asarray(tab), jnp.asarray(idx)))
    assert out[0, 0, 0] == 0
    assert out[0, 4, 0] == 1023
